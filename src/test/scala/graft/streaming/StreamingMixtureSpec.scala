package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.extensions.Mixture

/** MemoryStream proof of the always-current mixture plan: after any
  * stream of document batches folded through [[StreamingMixture.sink]],
  * the maintained totals equal a one-shot [[Mixture.totalsOf]] over the
  * concatenated corpus bitwise — so every derived plan does too — the
  * budget plan ADVANCES as the binding source accumulates tokens, and
  * the overwrite-by-id persist makes a redelivered batch exactly-once. */
class StreamingMixtureSpec extends SparkSpec {
  import spark.implicits._

  // source b is scarce relative to its weight and stays binding; its
  // arrivals in batch 2 must move the budget on the batch boundary
  private val batches = Seq(
    Seq((1L, "a", "t t t t t t t t"), (2L, "b", "t t")),
    Seq((3L, "a", "t t t t t t"), (4L, "c", "ignored")),
    Seq((5L, "b", "t t t"), (6L, "a", "t t")))

  private def docs(rows: Seq[(Long, String, String)]): DataFrame =
    rows.map { case (i, s, t) => (i, t, s) }.toDF("doc_id", "text", "source")

  private def weights: DataFrame =
    Seq(("a", 3L), ("b", 1L), ("c", 0L)).toDF("source", "weight")

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("streamed totals ≡ one-shot; the plan advances per batch; replay is exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val arriving = mem.toDF().toDF("doc_id", "source", "text")

    var totalsById = Map(
      -1L -> Mixture.totalsOf(docs(Seq.empty)).localCheckpoint())
    def current: DataFrame = totalsById(totalsById.keys.max)
    var budgets = Vector.empty[Long]
    def budgetOf(totals: DataFrame): Long =
      Mixture.planFromTotals(totals, weights)
        .select(max(col("budget"))).head().getLong(0)

    val q = StreamingMixture.sink(current, arriving,
        onBatch = (merged, id) => {
          totalsById = totalsById + (id -> merged.localCheckpoint())
          budgets :+= budgetOf(merged)
        })
      .start()
    try batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    finally q.stop()

    // parity: maintained state ≡ one-shot totals over the union
    assert(canon(current) == canon(Mixture.totalsOf(docs(batches.flatten))))

    // the plan tracked the corpus: W=4, B = min(4*Ta/3, 4*Tb) —
    // batch 0: min(10, 8) = 8; batch 1: min(18, 8) = 8 (b untouched);
    // batch 2: b grows to 5 ⇒ min(21, 20) = 20
    assert(budgets == Vector(8L, 8L, 20L))

    // replay batch 1 under overwrite-by-id: recompute its merge from
    // the PRE-batch state (id 0), as foreachBatch redelivery would —
    // the persisted state for id 1 is unchanged, not double-counted
    val replayed = Mixture.mergeTotals(
      totalsById(0L), Mixture.totalsOf(docs(batches(1))))
    assert(canon(replayed) == canon(totalsById(1L)))
  }
}
