package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.extensions.DataCard

/** MemoryStream proof of the always-current release card: after any
  * stream of document batches folded through
  * [[StreamingDataCard.sink]], the maintained state renders the SAME
  * card as a one-shot [[DataCard.buildState]] over the concatenated
  * corpus (bitwise — the merge is exact w.r.t. the sketch), and the
  * overwrite-by-id persist makes a redelivered batch exactly-once. */
class StreamingDataCardSpec extends SparkSpec {
  import spark.implicits._

  private val k = 8 // small k so the KMV sets actually saturate

  private val batches = Seq(
    Seq((1L, "web", "en", 40L, "the quick brown fox jumps over a lazy dog"),
      (2L, "web", "de", 25L, "ein kleiner brauner fuchs"),
      (3L, "books", "en", 0L, "")),
    Seq((4L, "books", "en", 33L, "a slow green turtle naps under the warm sun"),
      (5L, "wiki", "fr", 28L, "une tortue verte dort au soleil")))

  private def docs(rows: Seq[(Long, String, String, Long, String)]): DataFrame =
    rows.toDF("doc_id", "source", "lang", "n_chars", "text")

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("streamed card state ≡ one-shot build on the union; replay under overwrite-by-id is exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, Long, String)]
    val arriving = mem.toDF()
      .toDF("doc_id", "source", "lang", "n_chars", "text")

    // state starts empty (a zero-row corpus has a well-formed state —
    // the EmptyCorpus discipline) and is persisted keyed by batchId
    var stateById = Map(
      -1L -> DataCard.buildState(docs(Seq.empty), k).localCheckpoint())
    def current: DataFrame = stateById(stateById.keys.max)

    val q = StreamingDataCard.sink(current, arriving,
        onBatch = (merged, id) =>
          stateById = stateById + (id -> merged.localCheckpoint()),
        k = k)
      .start()
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    } finally q.stop()

    val oneShot = DataCard.buildState(docs(batches.flatten), k)
    assert(canon(current) == canon(oneShot),
      "streamed fold must equal the one-shot state bitwise")
    // and the rendered card agrees too (n_docs, tallies, KMV ests)
    assert(canon(DataCard.renderMerged(current, k)) ==
      canon(DataCard.renderMerged(oneShot, k)))

    // replay batch 1: recompute its merge from the PRE-batch state and
    // overwrite under the same id — the persisted map ends identical,
    // so the redelivery is invisible (tally rows are sums and would
    // double-count under append; overwrite-by-id is the discipline)
    val replayed = DataCard.mergeStates(
      stateById(0L), DataCard.buildState(docs(batches(1)), k), k)
    assert(canon(replayed) == canon(stateById(1L)))
  }
}
