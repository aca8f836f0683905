package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** MemoryStream proof of the streaming retrieval-decon triage
  * ([[StreamingRetrievalDecon]]): per-batch BM25 top-k under FROZEN
  * corpus dims, containment for the retrieved only, stream ≡ static,
  * zero streaming state, and the triage actually separates a planted
  * benchmark quote from a clean lexical neighbor. */
class StreamingRetrievalDeconSpec extends SparkSpec {
  import spark.implicits._

  private val terms = Seq("spark", "vector", "stream")

  // corpus: enough term-bearing docs that idf/avgdl are non-degenerate
  private val corpus = Seq(
    (1L, "spark jobs stream vector data through the lakehouse"),
    (2L, "the vector index serves spark queries at low latency"),
    (3L, "batch pipelines without any of the query words"),
    (4L, "stream processing with spark structured streaming"),
    (5L, "plain prose about staffing and hiring budgets")
  ).toDF("doc_id", "text")

  // benchmark: the held-out eval prompt whose leakage we triage for
  private val benchmark = Seq(
    (100L, "the held out benchmark asks about spark vector stream retrieval quality")
  ).toDF("doc_id", "text")

  // arriving: 201 quotes the benchmark verbatim mid-text (contaminated,
  // term-bearing so it IS retrieved); 202 is a clean term-bearing doc;
  // 203 carries no query term at all (never retrieved, never pays
  // containment — the two-stage contract)
  private val batch = Seq(
    (201L, "intro text then the held out benchmark asks about spark vector stream retrieval quality verbatim"),
    (202L, "a clean document on spark vector stream engineering practices"),
    (203L, "no relevant words here at all just filler prose")
  )

  test("stream ≡ static; quote flagged, clean neighbor passes; untriaged docs never pay containment") {
    implicit val sqlCtx = spark.sqlContext
    val (stats, idf, bg) = StreamingRetrievalDecon.dims(
      corpus, benchmark, terms, n = 4)

    val static = StreamingRetrievalDecon.admitBatch(
      batch.toDF("doc_id", "text"), stats, idf, bg, terms, k = 20, n = 4)
    val staticRows = static
      .as[(Long, Double, Long, Long, Double, Boolean)].collect().toSet

    // the planted quote is retrieved AND flagged; the clean doc is
    // retrieved and passes; the term-free doc is absent entirely
    val byId = staticRows.map(r => r._1 -> r).toMap
    assert(byId.contains(201L) && byId(201L)._6,
      s"planted benchmark quote not flagged: $staticRows")
    assert(byId.contains(202L) && !byId(202L)._6,
      s"clean neighbor wrongly flagged: $staticRows")
    assert(!byId.contains(203L),
      s"term-free doc must never be retrieved/triaged: $staticRows")

    val input = MemoryStream[(Long, String)]
    val perBatch = mutable.Map.empty[Long, Set[(Long, Double, Long, Long, Double, Boolean)]]
    val q = StreamingRetrievalDecon.sink(stats, idf, bg, terms,
      input.toDF().toDF("doc_id", "text"),
      (triage, id) => perBatch.synchronized {
        perBatch(id) = triage
          .as[(Long, Double, Long, Long, Double, Boolean)].collect().toSet
      })
      .start()
    try {
      input.addData(batch)
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "retrieval-decon admission must keep zero streaming state")
    } finally q.stop()
    assert(perBatch(0L) == staticRows,
      s"stream ${perBatch(0L)} != static $staticRows")
  }

  test("frozen dims really are corpus dims: batch scoring uses corpus idf, not batch idf") {
    // a term that is RARE in the corpus (high idf) but common in the
    // batch must still score by the corpus idf — the dims are frozen
    val (stats, idf, bg) = StreamingRetrievalDecon.dims(
      corpus, benchmark, terms, n = 4)
    val corpusIdf = idf.as[(String, Double)].collect().toMap
    // batch where every doc carries 'vector': batch-local df would make
    // idf('vector') minimal, but the scores must reflect corpusIdf
    val flood = (301L to 305L)
      .map(i => (i, "vector vector vector")).toDF("doc_id", "text")
    val scored = StreamingRetrievalDecon.admitBatch(
      flood, stats, idf, bg, terms, k = 20, n = 4)
      .as[(Long, Double, Long, Long, Double, Boolean)].collect()
    assert(scored.length == 5, scored.mkString(","))
    // all five identical texts score identically, and the score matches
    // the corpus-idf contribution formula for tf=3, dl=3
    val avgdl = stats.head().getDouble(1)
    val expected = {
      val w = corpusIdf("vector")
      val c = BigDecimal(w * (3 * 2.2) / (3 + 1.2 * (1 - 0.75 + 0.75 * 3 / avgdl)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      BigDecimal(c.toDouble).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    scored.foreach { r =>
      assert(math.abs(r._2 - expected) < 1e-9,
        s"doc ${r._1} scored ${r._2}, corpus-dim formula says $expected")
    }
  }
}
