package graft

import org.apache.spark.sql.functions._

import graft.queries.Registry

/** Proves the bench regression detector can BITE (r16 VERDICT #1): until
  * now it had only ever been validated against false positives — load
  * that auto-adjudicates clean. Here a REAL plan regression is injected
  * (the broadcast thresholds forced to -1 so the measured join plans as
  * a full-shuffle sort-merge join instead of broadcast-hash — the
  * canonical "lost the broadcast" drift at 100 TB), timed for real, and
  * the flagged row must SURVIVE the auto-retime with verdict
  * `regressed`. The inverse legs pin that the three contention defenses
  * still hold: a load-inflated suite min retimes clean to `box_load`,
  * and uniform inflation never even flags (box factor divides it out).
  *
  * Everything measured here is real wall-clock through the REAL
  * [[BenchDetector.adjudicate]] — the same code [[Bench.main]] runs —
  * with a self-sizing workload so the spec holds on any box. */
class BenchDetectorSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def timeMin(reps: Int)(body: => Unit): Double =
    (1 to reps).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }.min

  /** The measured workload: fact×dim equi-join + aggregate. With default
    * thresholds the 97-row dim broadcasts (BHJ, no fact shuffle); with
    * thresholds at -1 the SAME query shuffles and sorts the whole fact
    * side. */
  private def joinQuery(n: Long) = {
    val fact = spark.range(n)
      .select(col("id"), pmod(col("id"), lit(97L)).as("k"))
    val dim = spark.range(97)
      .select(col("id").as("k"), (col("id") * 3).as("w"))
    fact.join(dim, "k").agg(sum(col("id") % 1021 * col("w")).as("s"))
  }

  private def runJoin(n: Long): Unit = { joinQuery(n).collect(); () }

  private val broadcastKeys = Seq(
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.autoBroadcastJoinThreshold")

  /** Runs `body` with broadcast joins disabled — a genuine PLAN
    * regression, not simulated load. Restores the shared session's conf
    * afterwards. */
  private def withRegression[A](body: => A): A = {
    val saved = broadcastKeys.map(k => k -> spark.conf.getOption(k))
    broadcastKeys.foreach(k => spark.conf.set(k, "-1"))
    try body
    finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  private def runSteady(name: String): Unit =
    Registry.queries(name)(spark, dir)
      .write.format("noop").mode("overwrite").save()

  // ballast rows so the box factor is computed over a realistic carried
  // set, timed for real on both "rounds"
  private val steadyNames = Seq("q_project", "q_filter_flag", "q_limit_preview")

  test("an injected real plan regression survives auto-retime as `regressed`; load and uniform inflation do not") {
    // --- size the workload so the regressed run clears the 0.5 s floor
    // and sits ≥4× the anchor (2× threshold with 2× margin) on any box
    var n = 4000000L
    var anchor = 0.0
    var injected = 0.0
    var sized = false
    while (!sized && n <= 256000000L) {
      runJoin(n) // codegen warm-up at this n
      anchor = timeMin(3)(runJoin(n))
      injected = withRegression {
        runJoin(n) // warm the regressed plan shape too
        timeMin(3)(runJoin(n))
      }
      sized = injected > 0.6 && injected > 4.0 * anchor
      if (!sized) n *= 4
    }
    assert(sized,
      f"could not size a clear regression: anchor=$anchor%.3f s, " +
        f"injected=$injected%.3f s at n=$n")
    // the injection is a PLAN change, not load: broadcast join gone
    val regressedPlan = withRegression(joinQuery(n).queryExecution.sparkPlan.toString)
    assert(!regressedPlan.contains("BroadcastHashJoin"), regressedPlan)
    assert(joinQuery(n).queryExecution.sparkPlan.toString
      .contains("BroadcastHashJoin"), "anchor plan lost its broadcast")

    // --- "previous round": real anchors
    val steadyPrev = steadyNames.map(q => q -> timeMin(3)(runSteady(q)))
    val prevMins = (steadyPrev :+ ("bench_join" -> anchor)).toMap

    // --- leg 1 (the new coverage): regression present during the suite
    // AND during the retime — the row must stay in the final list
    val steadyNow = steadyNames.map(q => q -> timeMin(3)(runSteady(q)))
    var retimed = Vector.empty[String]
    val adj = BenchDetector.adjudicate(
      steadyNow :+ ("bench_join" -> injected),
      prevMins,
      retime = { name =>
        retimed :+= name
        if (name == "bench_join") withRegression(timeMin(3)(runJoin(n)))
        else timeMin(3)(runSteady(name))
      },
      retimeProbeFactor = 1.0)
    assert(adj.flagged.contains("bench_join"), adj.toString)
    assert(retimed.contains("bench_join"), "flagged row was never retimed")
    assert(adj.regressions.map(_._1) == Seq("bench_join"),
      s"final list must be exactly the injected regression: $adj")
    assert(adj.verdict("bench_join") == "regressed", adj.toString)
    assert(adj.regressions.head._2 >= 2.0, adj.toString)

    // --- leg 2: the r15/r16 false-positive class — suite min inflated
    // (a load burst), but the solo retime runs CLEAN → box_load, final
    // list EMPTY
    val adjLoad = BenchDetector.adjudicate(
      steadyNow :+ ("bench_join" -> math.max(anchor * 4.0, 0.8)),
      prevMins,
      retime = { name =>
        if (name == "bench_join") timeMin(3)(runJoin(n))
        else timeMin(3)(runSteady(name))
      },
      retimeProbeFactor = 1.0)
    assert(adjLoad.flagged.contains("bench_join"), adjLoad.toString)
    assert(adjLoad.regressions.isEmpty,
      s"clean retime must adjudicate the load spike away: $adjLoad")
    assert(adjLoad.verdict("bench_join") == "box_load", adjLoad.toString)

    // --- leg 3: UNIFORM inflation (the whole suite 3×) never flags —
    // the box factor divides it out before any retime is spent
    val adjUniform = BenchDetector.adjudicate(
      (steadyNow :+ ("bench_join" -> anchor)).map { case (q, m) => q -> m * 3 },
      prevMins,
      retime = name => sys.error(s"retime must not run under uniform load: $name"),
      retimeProbeFactor = sys.error("probe must not run when nothing is flagged"))
    assert(adjUniform.flagged.isEmpty, adjUniform.toString)
    assert(adjUniform.regressions.isEmpty, adjUniform.toString)
  }

  test("drift gate (1.5x vs best-ever anchors) catches sub-2x compounding drift the per-round gate is blind to") {
    // r17 VERDICT #1: q_pct_window sat at 1.69x its r16 min across two
    // rounds with "regressions EMPTY" on every cover — under the 2.0x
    // per-round threshold a compounding sub-gate creep never flags.
    // Bench now runs adjudicate a SECOND time against best-ever-min
    // anchors (bench_anchors.json) at threshold 1.5 / floor 0.25; this
    // pins the gate arithmetic on exactly that shape. Pure-function leg
    // — the Spark-measured legs above already prove retime reality.
    val anchors = Map("q_driftish" -> 0.40, "q_steady_a" -> 1.0,
      "q_steady_b" -> 2.0, "q_steady_c" -> 0.9)
    val now = Seq("q_steady_a" -> 1.02, "q_steady_b" -> 2.01,
      "q_steady_c" -> 0.91, "q_driftish" -> 0.676) // 1.69x its anchor
    // drifted: the solo retime reproduces the inflated min
    val drift = BenchDetector.adjudicate(now, anchors,
      retime = { n => assert(n == "q_driftish"); 0.66 },
      retimeProbeFactor = 1.0, threshold = 1.5, floorSec = 0.25)
    assert(drift.flagged == Seq("q_driftish"), drift.toString)
    assert(drift.regressions.map(_._1) == Seq("q_driftish"), drift.toString)
    // box_load: the solo retime lands back at the anchor
    val clean = BenchDetector.adjudicate(now, anchors,
      retime = { n => assert(n == "q_driftish"); 0.41 },
      retimeProbeFactor = 1.0, threshold = 1.5, floorSec = 0.25)
    assert(clean.flagged == Seq("q_driftish") && clean.regressions.isEmpty,
      clean.toString)
    // under the old per-round gate the same row never flags — the blind
    // spot this second pass exists to close
    val blind = BenchDetector.adjudicate(now, anchors,
      retime = n => sys.error(s"must not retime at 2.0x: $n"),
      retimeProbeFactor = 1.0, threshold = 2.0, floorSec = 0.5)
    assert(blind.flagged.isEmpty, blind.toString)
  }
}
