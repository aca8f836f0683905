package graft.extensions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-9 survivor policies: containment-driven dedup (the asymmetric
  * case resemblance thresholds walk past) and its CorpusPipeline gate. */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  // A 20-word doc quoted WHOLE inside a 65-word one. The tail (seed
  // 1183, found by deterministic md5 search) keeps LSH band 1's four
  // signature mins unchanged, so the pair IS a banded candidate, while
  // Jaccard = 18/63 = 0.2857 stays under ngramJaccard's 0.3 default —
  // the exact "survives resemblance, dies to containment" window.
  private val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
  private val quoteTail = (0 until 45).map(i => s"q1183w$i").mkString(" ")
  private lazy val quotedDocs = Seq(
    (1L, base), // the quote: every shingle inside doc 2 -> cont_a = 1.0
    (2L, base + " " + quoteTail), // the container
    (3L, "one two three four five six")).toDF("doc_id", "text")

  test("a short doc quoted whole in a long one survives ngramJaccard but is dropped by containment") {
    val jacPairs = Dedup.ngramJaccard(quotedDocs) // threshold 0.3
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(!jacPairs.contains((1L, 2L)),
      s"fixture broken: resemblance dedup must MISS the quote pair, got $jacPairs")
    val cont = Dedup.containment(quotedDocs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(cont.get((1L, 2L)).exists(_._1 == 1.0),
      s"fixture broken: pair must surface as an LSH candidate with cont_a=1, got $cont")
    val kept = Dedup.dedupByContainment(quotedDocs, tau = 0.97).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(kept == Map(1L -> false, 2L -> true, 3L -> true),
      s"the CONTAINED side (the quote) must drop, container and bystander survive: $kept")
  }

  test("mutual containment falls back to the smaller-id rule; assignment is total") {
    val docs = Seq(
      (1L, base), (2L, base), // exact dups: cont 1.0 both ways -> drop b
      (3L, "x y"), // too short to shingle: singleton, always kept
      (4L, "seven eight nine ten eleven twelve")).toDF("doc_id", "text")
    val kept = Dedup.dedupByContainment(docs, tau = 0.97).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(kept == Map(1L -> true, 2L -> false, 3L -> true, 4L -> true), kept)
  }

  test("CorpusPipeline containment gate reverses the drop direction: the quote goes, its container survives") {
    // thresholds wide open so the quality/repetition/decontam gates pass
    // everything and only the dedup tail differs
    val t = CorpusPipeline.Thresholds(minTokens = 1, maxTokens = 1000,
      maxStopRatio = 1.0)
    val bench = Seq((100L, "totally unrelated benchmark words here"))
      .toDF("doc_id", "text")
    def ids(out: org.apache.spark.sql.DataFrame): Set[Long] =
      out.select("doc_id").as[Long].collect().toSet
    val docs = quotedDocs.withColumn("n_chars", length(col("text")))
    val ungated = ids(CorpusPipeline.cleanFull(docs, bench, t,
      maxDupBigram = 1.0))
    val gated = ids(CorpusPipeline.cleanFull(docs, bench, t,
      maxDupBigram = 1.0, containmentTau = Some(0.97)))
    assert(ungated == Set(1L, 3L),
      s"the blind drop-b rule keeps the FRAGMENT and kills its container: $ungated")
    assert(gated == Set(2L, 3L),
      s"the containment gate drops the contained doc and keeps the container: $gated")
  }
}
