package graft.extensions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[UnigramLm]] semantics, hand-computed (the BpeTrainSpec
  * discipline): Viterbi picks the max-score path under the pinned
  * total order (score DESC, n_pieces ASC, segmentation ASC) — the
  * whole-word-vs-subwords trade-off of Kudo 2018's motivating example
  * — plus the train loop's seed/E/M/prune arithmetic on a corpus small
  * enough to verify by hand. */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def words(ws: (String, Long)*) = ws.toSeq.toDF("word", "freq")

  private def segOf(df: org.apache.spark.sql.DataFrame, w: String) =
    df.filter(col("word") === w).select("segmentation").head()

  test("Viterbi: a high-probability whole piece beats its subword split") {
    val vocab = Map("h" -> -5.0, "e" -> -5.0, "l" -> -5.0, "o" -> -5.0,
      "he" -> -2.5, "ll" -> -2.5, "lo" -> -2.5, "hello" -> -4.0)
    val out = UnigramLm.viterbiSegment(
      words("hello" -> 3L), vocab, maxPieceLen = 5)
    val r = out.head()
    // score("hello") = -4.0 beats every split (best split: -10.0)
    assert(r.getString(2) == "hello")
    assert(r.getLong(3) == 1L)
    assert(r.getDouble(4) == -4.0)
  }

  test("Viterbi tie-break: equal score, equal piece count -> lexicographically smallest path") {
    // without the whole word, "he l lo" and "he ll o" both score
    // exactly -10.0 with 3 pieces (same value multiset, exact doubles);
    // 'l' < 'll' at the divergence point decides
    val vocab = Map("h" -> -5.0, "e" -> -5.0, "l" -> -5.0, "o" -> -5.0,
      "he" -> -2.5, "ll" -> -2.5, "lo" -> -2.5)
    val out = UnigramLm.viterbiSegment(
      words("hello" -> 1L), vocab, maxPieceLen = 4)
    assert(out.head().getString(2) == "he l lo")
    assert(out.head().getDouble(4) == -10.0)
  }

  test("a word the vocabulary cannot cover segments to NULL") {
    val out = UnigramLm.viterbiSegment(
      words("box" -> 1L), Map("b" -> -1.0, "o" -> -1.0), maxPieceLen = 4)
    assert(out.head().isNullAt(2) && out.head().isNullAt(3))
  }

  test("train: seed -> hard-EM recount -> prune keeps chars, renormalizes") {
    // corpus: "ab"×2, "b"×1. Seed (maxPieceLen 2): a:2, b:3, ab:2 of 7.
    // E-step: "ab" -> [ab] (log2(2/7) beats log2(2/7)+log2(3/7));
    // "b" -> [b]. M-step: ab:2, b:1. Prune to top-1 (+ chars a, b):
    // kept mass 3 -> logp(ab)=log2(2/3), logp(b)=log2(1/3), a count 0
    // with NULL logp.
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val out = UnigramLm.train(docs, vocabSize = 1, maxPieceLen = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getBoolean(3)))
      .toSeq
    assert(out == Seq(
      ("ab", 2L, Some(-0.584963), false),
      ("b", 1L, Some(-1.584963), true),
      ("a", 0L, None, true)))
  }

  test("the frozen-vocab fixture pins the interesting shapes") {
    val out = UnigramLm.viterbiSegment(
      words("table" -> 1L, "big" -> 1L, "the" -> 1L, "data" -> 1L),
      graft.queries.Round19Queries.uniVocab.toMap, maxPieceLen = 4)
    assert(segOf(out, "table").getString(0) == "ta ble")
    assert(segOf(out, "big").getString(0) == "b i g") // singles fallback
    assert(segOf(out, "the").getString(0) == "the")
    assert(segOf(out, "data").getString(0) == "dat a")
  }

  test("segmentation is one narrow projection: no shuffle beyond the input") {
    val out = UnigramLm.viterbiSegment(
      words("table" -> 1L), Map("t" -> -1.0, "a" -> -1.0, "b" -> -1.0,
        "l" -> -1.0, "e" -> -1.0), maxPieceLen = 4)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"Viterbi must not shuffle:\n$p")
  }
}
