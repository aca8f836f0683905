package graft

/** The bench's regression-adjudication core, factored out of
  * [[Bench.main]] so it is testable against REAL injected regressions
  * (r16 VERDICT #1: the detector had only ever been validated against
  * false positives — load that adjudicates clean. BenchDetectorSpec now
  * injects a genuine plan regression — broadcast join forced to
  * sort-merge — and asserts the row SURVIVES auto-retime as
  * `regressed`, plus the inverse: a suite-min inflated by load retimes
  * clean and the final list stays empty).
  *
  * Semantics (unchanged from the r16 inline form, three contention
  * defenses layered):
  *  1. MIN-of-reps both sides — a load burst inflates some reps, the
  *     min keeps whichever rep caught a quiet moment; a real plan
  *     regression moves every rep.
  *  2. Suite-wide box factor (median of min-ratios over carried rows)
  *     divides out uniform load before anything is flagged.
  *  3. Still-flagged rows are re-timed solo (min of reps) with a
  *     calibration factor read beside them; only a row whose RE-TIMED
  *     min still exceeds the threshold stays in the final list.
  * Floor: sub-`floorSec` rows are timer noise, never triage. */
object BenchDetector {

  final case class Adjudication(
      boxFactor: Double,
      flagged: Seq[String],
      retimeFactor: Double,
      retimes: Map[String, Double],
      regressions: Seq[(String, Double)]) {
    def verdict(name: String): String =
      if (regressions.exists(_._1 == name)) "regressed" else "box_load"
  }

  /** @param minsNow   suite min-of-reps per query, in suite order
    * @param prevMins  prior committed anchors (absent rows never flag)
    * @param retime    solo re-time (min of reps) — invoked ONLY for
    *                  flagged rows
    * @param retimeProbeFactor calibration probe at retime moment over
    *                  the suite baseline (≥1 widens the retime gate
    *                  under live contention) — evaluated only when
    *                  something is flagged */
  def adjudicate(
      minsNow: Seq[(String, Double)],
      prevMins: Map[String, Double],
      retime: String => Double,
      retimeProbeFactor: => Double,
      threshold: Double = 2.0,
      floorSec: Double = 0.5): Adjudication = {
    val now = minsNow.toMap
    val allRatios = minsNow.flatMap { case (n, m) =>
      prevMins.get(n).filter(_ > 0).map(m / _)
    }.sorted
    val boxFactor =
      if (allRatios.isEmpty) 1.0 else allRatios(allRatios.size / 2)
    val normThreshold = threshold * math.max(1.0, boxFactor)
    val flagged = minsNow.collect {
      case (name, m) if m > floorSec &&
          prevMins.get(name).exists(p => p > 0 && m > normThreshold * p) =>
        name
    }
    val retimeFactor =
      if (flagged.nonEmpty) math.max(1.0, retimeProbeFactor) else 1.0
    val retimes: Map[String, Double] = flagged.map(n => n -> retime(n)).toMap
    val regressions = flagged.collect {
      case name if retimes(name) > threshold * retimeFactor * prevMins(name) =>
        name -> (retimes(name) / prevMins(name))
    }
    Adjudication(boxFactor, flagged, retimeFactor, retimes, regressions)
  }
}
