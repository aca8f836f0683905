package graft.extensions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[WordPiece]] — hand-computed greedy maximal munch (initial vs
  * `##`-continuation longest-match), the [UNK] dead-end contract a
  * gappy vocabulary triggers, the likelihood argmax diverging from
  * BPE's frequency argmax on an engineered corpus, and the
  * no-shuffle segmentation plan. */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def words(ws: (String, Long)*) = ws.toSeq.toDF("word", "freq")

  private def segs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      (if (r.isNullAt(2)) None else Some((r.getString(2), r.getLong(3)))))
      .toMap

  test("greedy longest-match: initial pieces at pos 0, ## pieces after") {
    val out = segs(WordPiece.greedySegment(
      words("table" -> 1L, "customer" -> 1L, "spark" -> 1L, "value" -> 1L),
      graft.queries.Round19Queries.wpVocab.toSet, maxPieceLen = 4))
    assert(out("table") == Some(("ta ##ble", 2L)))
    // cu | ##s | ##t | ##omer — the 4-char continuation wins at the end
    assert(out("customer") == Some(("cu ##s ##t ##omer", 4L)))
    // spar | ##k — the 4-char INITIAL beats sc/s
    assert(out("spark") == Some(("spar ##k", 2L)))
    assert(out("value") == Some(("val ##ue", 2L)))
  }

  test("maximal munch dead-ends to [UNK]; no backtracking") {
    // 'b' exists only as a continuation: fine inside "ab", fatal at pos 0
    val out = segs(WordPiece.greedySegment(
      words("ab" -> 1L, "ba" -> 1L), Set("a", "##a", "##b"),
      maxPieceLen = 4))
    assert(out("ab") == Some(("a ##b", 2L)))
    assert(out("ba") == None) // [UNK]: NULL segmentation and n_pieces
  }

  test("likelihood argmax diverges from BPE's frequency argmax") {
    // (x,y) count 3 but score 3/(3·3) = 1/3; (a,b) count 2, score
    // 2/(2·2) = 1/2 — WordPiece merges the RARER-symbol pair first,
    // BPE the more frequent one.
    val docs = Seq((1L, "xy xy xy ab ab")).toDF("doc_id", "text")
    val wp = WordPiece.learn(docs, numMerges = 1).head
    assert((wp.left, wp.right, wp.pairFreq) == (("a", "b", 2L)))
    assert(math.abs(wp.score - 0.5) < 1e-12)
    val bpe = BpeTrain.learn(docs, numMerges = 1).head
    assert((bpe.left, bpe.right) == (("x", "y")))
  }

  test("segmentation is one narrow projection: no shuffle beyond the input") {
    val out = WordPiece.greedySegment(words("table" -> 1L),
      Set("t", "a", "##a", "##b", "##l", "##e"), maxPieceLen = 4)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"greedy munch must not shuffle:\n$p")
  }

  test("full-coverage fixture vocab: every corpus word segments (the oracle-equivalence precondition)") {
    val docs = graft.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val unks = WordPiece.greedySegment(UnigramLm.wordFreqs(docs),
      graft.queries.Round19Queries.wpVocab.toSet, maxPieceLen = 4)
      .filter(col("segmentation").isNull).count()
    assert(unks == 0L)
  }
}
