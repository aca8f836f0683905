package graft.extensions

import graft.SparkSpec

/** Unit coverage for the round-5 operators: the splitByCluster leakage
  * guarantee (same cluster ⇒ same split — the module's entire point),
  * mixingWeights at all three α regimes against hand-computed values,
  * and textStats on degenerate docs. */
class Round5OpsSpec extends SparkSpec {
  import spark.implicits._

  test("splitByCluster: near-identical docs always share a split") {
    // 3 clusters: docs {1,2} identical, {3,4} identical, {5} alone
    val docs = Seq(
      (1L, "x y z w", 7L), (2L, "x y z w", 7L),
      (3L, "p q r s t", 9L), (4L, "p q r s t", 9L),
      (5L, "m n o k l", 9L))
      .toDF("doc_id", "text", "n_chars")
    val out = Dedup.splitByCluster(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out.size == 5)
    assert(out(1L) == out(2L), "identical docs must share cluster AND split")
    assert(out(3L) == out(4L))
    assert(out.values.forall(v => Set("train", "val", "test")(v._2)))
    // deterministic: a second invocation assigns identically
    val again = Dedup.splitByCluster(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(again == out)
  }

  test("splitByCluster and keepCanonical are TOTAL: shingle-less docs get a singleton fallback cluster") {
    val docs = Seq(
      (1L, "one two", 7L),                        // < 3 tokens: no shingles
      (2L, null.asInstanceOf[String], 0L),        // null text
      (3L, "", 0L),                               // empty text
      (4L, "alpha beta gamma delta", 22L),
      (5L, "alpha beta gamma delta", 22L))        // near-dup of 4
      .toDF("doc_id", "text", "n_chars")
    val split = Dedup.splitByCluster(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(split.keySet == Set(1L, 2L, 3L, 4L, 5L), "every corpus row gets a split")
    assert(split(1L)._1 == 1L && split(2L)._1 == 2L && split(3L)._1 == 3L,
      "fallback cluster is the doc's own id")
    assert(split(4L) == split(5L), "real clusters still co-locate near-dups")
    val keep = Dedup.keepCanonical(docs)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    assert(keep.map(_._1).toSet == Set(1L, 2L, 3L, 4L, 5L), "survivor map is total")
    assert(keep.filter(t => Set(1L, 2L, 3L)(t._1)).forall(_._3),
      "singleton fallback docs are always kept")
  }

  test("splitByCluster rejects malformed or misordered hex bounds") {
    val docs = Seq((1L, "a b c d", 4L)).toDF("doc_id", "text", "n_chars")
    intercept[IllegalArgumentException](
      Dedup.splitByCluster(docs, trainHexBound = "C"))
    intercept[IllegalArgumentException](
      Dedup.splitByCluster(docs, trainHexBound = "xy"))
    intercept[IllegalArgumentException](
      Dedup.splitByCluster(docs, trainHexBound = "e", valHexBound = "c"))
  }

  test("splitByCluster: bounds move mass between splits") {
    val docs = (1L to 40L).map(i => (i, s"tok$i a$i b$i c$i", 10L))
      .toDF("doc_id", "text", "n_chars")
    // everything below "g" → train: 7/16 of hash space stays train, the
    // rest test; with bounds at the extremes all docs land in one split
    val allTrain = Dedup.splitByCluster(docs, trainHexBound = "g", valHexBound = "g")
      .select("split").as[String].collect().toSet
    assert(allTrain == Set("train"))
    val allTest = Dedup.splitByCluster(docs, trainHexBound = "0", valHexBound = "0")
      .select("split").as[String].collect().toSet
    assert(allTest == Set("test"))
  }

  test("mixingWeights: hand-computed shares and weights at alpha = 0.5") {
    // A: 16 chars over 2 docs, B: 4 chars → shares .8/.2,
    // sqrt-tempered: 4 and 2 → weights 4/6 and 2/6
    val docs = Seq(
      (1L, "srcA", 10L), (2L, "srcA", 6L), (3L, "srcB", 4L))
      .toDF("doc_id", "source", "n_chars")
    val out = TextAnalysis.mixingWeights(docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out("srcA") == (2L, 16L, 0.8, 0.6667))
    assert(out("srcB") == (1L, 4L, 0.2, 0.3333))
  }

  test("mixingWeights: alpha = 1 keeps natural proportions, alpha = 0 is uniform") {
    val docs = Seq(
      (1L, "srcA", 16L), (2L, "srcB", 4L)).toDF("doc_id", "source", "n_chars")
    val natural = TextAnalysis.mixingWeights(docs, alpha = 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(natural == Map("srcA" -> 0.8, "srcB" -> 0.2))
    val uniform = TextAnalysis.mixingWeights(docs, alpha = 0.0)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(uniform == Map("srcA" -> 0.5, "srcB" -> 0.5))
  }

  test("textStats: token counts, TTR, mean length; empty doc yields NULLs") {
    val docs = Seq(
      (1L, "a b a"), (2L, ""), (3L, null.asInstanceOf[String]), (4L, "xyz"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.textStats(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(out(1L) == (3L, 2L, Some(0.6667), Some(1.0)))
    assert(out(2L) == (0L, 0L, None, None))
    assert(out(3L) == (0L, 0L, None, None))
    assert(out(4L) == (1L, 1L, Some(1.0), Some(3.0)))
  }
}
