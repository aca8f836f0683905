package graft.extensions

import graft.SparkSpec

/** Hand-computed BPE coverage: the classic low/lower/newest/widest
  * corpus (Sennrich et al. 2016, §3.2's example family), tie-break
  * order, the overlapping-run merge semantics, and segmentation under
  * the learned merges. */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(words: (String, Int)*) =
    words.zipWithIndex.map { case ((w, n), i) =>
      (i.toLong, Seq.fill(n)(w).mkString(" "))
    }.toDF("doc_id", "text")

  test("learn reproduces the hand-computed merge sequence with deterministic ties") {
    val docs = corpus(("low", 5), ("lower", 2), ("newest", 6), ("widest", 3))
    val merges = BpeTrain.learn(docs, 4)
      .map(m => (m.rank, m.left, m.right, m.pair_freq))
    // pair counts round 1: e-s 9, s-t 9 (tie -> left asc picks e-s),
    // w-e 8, l-o 7, o-w 7, ...
    assert(merges == Seq(
      (1, "e", "s", 9L),
      (2, "es", "t", 9L),
      (3, "l", "o", 7L), // 7-7 tie with o-w -> left asc
      (4, "lo", "w", 7L)))
  }

  test("overlapping runs merge left-to-right, single-char words survive") {
    val docs = corpus(("aaa", 3), ("aaaa", 1), ("a", 2), ("b", 1))
    val merges = BpeTrain.learn(docs, 1)
    assert(merges.map(m => (m.left, m.right)) == Seq(("a", "a")))
    // a-a pairs: aaa has 2 adjacent, aaaa has 3 -> 3*2 + 1*3 = 9
    assert(merges.head.pair_freq == 9L)
    val seg = BpeTrain.segment(docs, merges)
      .collect().map(r => r.getString(0) -> (r.getString(2), r.getLong(3))).toMap
    assert(seg("aaa") == (("aa a", 2L)), "left-to-right: (aa) a")
    assert(seg("aaaa") == (("aa aa", 2L)), "two non-overlapping merges")
    assert(seg("a") == (("a", 1L)))
    assert(seg("b") == (("b", 1L)))
  }

  test("learn stops early when no pairs remain") {
    val docs = corpus(("ab", 2))
    val merges = BpeTrain.learn(docs, 10)
    assert(merges.map(m => (m.left, m.right)) == Seq(("a", "b")),
      "after the only merge the vocab is single-symbol: no further rows")
  }
}
