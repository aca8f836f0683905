package graft.extensions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit coverage for the round-6 operators: the winnowing coverage
  * guarantee (shared substring of >= k+w-1 tokens ⇒ shared fingerprint —
  * the paper's theorem and the module's entire point), fingerprint-set
  * bounds, MOSS pair mining with the hot-fingerprint cap, the recall@k
  * accuracy contract's [0,1] range and its exactness when IVF search is
  * unrestricted, and sourceDrift's zero-at-identity / ln(2)-bound
  * properties. */
class Round6OpsSpec extends SparkSpec {
  import spark.implicits._

  private val k = 3
  private val w = 4

  test("winnowing: docs sharing a >= k+w-1 token substring share a fingerprint") {
    // shared run of exactly k + w - 1 = 6 tokens inside different contexts
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"one two three $shared four five six"),
      (2L, s"seven $shared eight nine ten eleven twelve"),
      (3L, "totally different words with no overlap at all here"))
      .toDF("doc_id", "text")
    val fps = Winnowing.sharedFingerprintPairs(docs, k, w, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fps.contains((1L, 2L)),
      "coverage guarantee: the shared 6-token run must produce a common fingerprint")
    assert(!fps.exists(p => p._1 == 3L || p._2 == 3L),
      "no false pair against the disjoint doc")
  }

  test("winnowing: fingerprint set bounds and degenerate docs") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"), // 8 grams, 5 windows
      (2L, "a b c"),               // 1 gram: shorter than one window
      (3L, "a b"),                 // < k tokens: zero grams
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Winnowing.fingerprints(docs, k, w)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)), r.getString(4))).toMap
    val (nGrams1, nFps1, dens1, _) = out(1L)
    assert(nGrams1 == 8 && nFps1 >= 1 && nFps1 <= 5,
      "fingerprints are window minima: at most n_grams - w + 1 of them")
    assert(dens1.exists(d => d.asInstanceOf[Double] <= 1.0))
    assert(out(2L) == ((1L, 1L, Some(1.0), out(2L)._4)),
      "doc shorter than one window keeps the single min")
    assert(out(3L)._1 == 0 && out(3L)._2 == 0 && out(3L)._3.isEmpty,
      "gram-less docs fingerprint to the empty set with NULL density")
    assert(out(4L)._1 == 0, "null text behaves as empty")
    assert(out(3L)._4 == out(4L)._4, "empty-set digest is stable")
  }

  test("winnowing: identical docs get identical digests; maxDf cap drops hot fingerprints") {
    val base = (1L to 6L).map(i => (i, "the quick brown fox jumps over the lazy dog"))
    val docs = (base :+ ((7L, "completely unrelated text goes right here okay")))
      .toDF("doc_id", "text")
    val digests = Winnowing.fingerprints(docs, k, w)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert((1L to 6L).map(digests).toSet.size == 1, "identical text ⇒ identical digest")
    assert(digests(7L) != digests(1L))
    val uncapped = Winnowing.sharedFingerprintPairs(docs, k, w, minShared = 1)
    assert(uncapped.count() == 15, "6 identical docs ⇒ C(6,2) pairs")
    val capped = Winnowing.sharedFingerprintPairs(docs, k, w, minShared = 1,
      maxDf = Some(5))
    assert(capped.count() == 0,
      "df cap drops fingerprints hotter than maxDf from the candidate index")
  }

  test("resemblanceEstimate: identical docs score 1.0 on both columns; estimate tracks exact") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base), (2L, base),                         // identical pair
      (3L, s"$base lambda mu nu xi omicron pi rho"),  // superset of base
      (4L, "unrelated words entirely different from the rest here okay"))
      .toDF("doc_id", "text")
    val out = Winnowing.resemblanceEstimate(docs, k, w, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(3), r.getDouble(4))).toMap
    val (est12, exact12) = out((1L, 2L))
    assert(est12 == 1.0 && exact12 == 1.0,
      "identical docs: winnowed sets and gram sets both identical")
    assert(out.contains((1L, 3L)), "the superset pair is a candidate")
    val (est13, exact13) = out((1L, 3L))
    assert(exact13 > 0.4 && exact13 < 1.0)
    assert(est13 > 0.0 && est13 < 1.0)
    assert(!out.keys.exists(p => p._1 == 4L || p._2 == 4L),
      "the unrelated doc pairs with nothing")
  }

  test("resemblanceEstimate: exact side uses the winnow gram definition (case-insensitive)") {
    // regression: the exact column previously came from Dedup.shingles
    // (raw case-sensitive split) while the estimate used lowercased
    // grams — case variance made est_jac = 1.0 sit next to exact_jac = 0
    val docs = Seq(
      (1L, "The Cat Sat On The Mat Quietly"),
      (2L, "the cat sat on the mat quietly"))
      .toDF("doc_id", "text")
    val out = Winnowing.resemblanceEstimate(docs, k, w, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(3), r.getDouble(4))).toMap
    assert(out((1L, 2L)) == ((1.0, 1.0)),
      "case-variant copies are identical under BOTH columns' gram definition")
  }

  test("sourceOverlap: copied spans surface per source pair, disjoint feeds stay silent") {
    val shared = "one two three four five six seven" // two 6-token windows
    val docs = Seq(
      (1L, shared, "a"),
      (2L, s"$shared eight", "b"),              // superset: 3 windows
      (3L, "totally different words with no overlap at all", "c"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.sourceOverlap(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet == Set(("a", "b")), "only the copying pair appears")
    assert(out(("a", "b")) == ((2L, 1.0)),
      "both of a's windows recur in b: |A∩B|/min(|A|,|B|) = 2/2")
  }

  test("recallAtK: perfect recall when every vector shares one IVF cell, [0,1] always") {
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(8)(rnd.nextFloat())
    val oneCell = (0L until 30L).map(i => (i, vec(), 0)).toDF("vec_id", "embedding", "label")
    val r1 = Similarity.recallAtK(oneCell, queryIds = Seq(0L, 1L, 2L), k = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(r1.keySet == Set(0L, 1L, 2L))
    assert(r1.values.forall(_ == 1.0),
      "single-cell corpus: IVF search IS brute force, recall must be 1")
    val twoCells = (0L until 30L).map(i => (i, vec(), (i % 2).toInt))
      .toDF("vec_id", "embedding", "label")
    val r2 = Similarity.recallAtK(twoCells, queryIds = Seq(0L, 1L), k = 5)
      .collect().map(_.getDouble(2))
    assert(r2.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("sourceDrift: identical distributions score 0, divergence bounded by ln 2") {
    val same = Seq(
      (1L, "x y z x y", "a"), (2L, "x y z x y", "b"))
      .toDF("doc_id", "text", "source")
    val zero = TextAnalysis.sourceDrift(same, topN = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(zero("a") == 0.0 && zero("b") == 0.0,
      "source distribution == corpus distribution ⇒ JS = 0")
    val skewed = (Seq.fill(20)((1L, "aa bb cc", "a")) ++
      Seq.fill(20)((2L, "dd ee ff", "b"))).toDF("doc_id", "text", "source")
    val js = TextAnalysis.sourceDrift(skewed, topN = 10)
      .collect().map(_.getDouble(3))
    assert(js.forall(v => v >= 0.0 && v <= math.log(2.0) + 1e-9),
      "JS divergence is bounded by ln 2")
    // each source is half the corpus, so the corpus mixture dilutes the
    // distance: JS(p, corpus) here is analytically ≈ 0.2157
    assert(js.forall(v => v > 0.2 && v < 0.23),
      "disjoint vocabularies must score the analytic mixture distance")
  }

  test("sourceDrift: vocab is bounded top-N by corpus frequency") {
    val docs = Seq(
      (1L, "hot hot hot hot rare1 rare2 rare3", "a"),
      (2L, "hot hot hot warm warm rare4", "b"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.sourceDrift(docs, topN = 2).collect()
    // top-2 vocab = {hot, warm}; source a holds 4 of the 9 vocab hits
    val bySrc = out.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(bySrc("a") == ((1L, 4L)), "source a hits only 'hot' (4 occurrences)")
    assert(bySrc("b") == ((2L, 5L)), "source b hits 'hot'(3) and 'warm'(2)")
  }
}
