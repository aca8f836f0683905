package graft.extensions

import graft.SparkSpec

/** Pins the BM25 public-API contracts the r17 ADVICE flagged: the
  * single-scan per-doc rewrite builds one tf struct per query-term
  * ELEMENT, so a duplicated term in the bag used to emit two identical
  * rows after the explode — doubling that term's df (shifting every
  * idf) and double-counting its per-doc contribution. The old
  * explode+isInCollection form was duplicate-robust; the array build
  * must stay so explicitly. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark engineer spark pipelines"),
    (2L, "data engineer on the lakehouse"),
    (3L, "spark spark spark everywhere"),
    (4L, "unrelated marine biology field notes")
  ).toDF("doc_id", "text")

  test("a duplicated query term scores identically to the deduped bag") {
    val dup = TextAnalysis.bm25(docs, Seq("spark", "engineer", "spark"), k = 4)
      .collect().toSeq
    val ded = TextAnalysis.bm25(docs, Seq("spark", "engineer"), k = 4)
      .collect().toSeq
    assert(dup == ded, s"dup=$dup ded=$ded")
  }

  test("retrievalDecon inherits the duplicate-robust term bag") {
    val bench = Seq((901L, "spark engineer spark pipelines")).toDF("doc_id", "text")
    val dup = TextAnalysis.retrievalDecon(docs, bench,
      Seq("spark", "spark", "engineer"), k = 3, n = 2).collect().toSeq
    val ded = TextAnalysis.retrievalDecon(docs, bench,
      Seq("spark", "engineer"), k = 3, n = 2).collect().toSeq
    assert(dup == ded, s"dup=$dup ded=$ded")
  }
}
