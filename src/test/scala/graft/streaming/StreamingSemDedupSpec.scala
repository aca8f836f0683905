package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.extensions.{KMeans, Similarity}

/** MemoryStream proof of the embedding-side admission story: each
  * micro-batch's ADMITTED set from [[StreamingSemDedup]] equals the
  * batch-merged recompute — `semDedupSurvivors(index ∪ batch) ∩ batch`
  * — and appending admissions grows the index so later batches probe
  * earlier ones, mirroring StreamingDedup's growth loop. */
class StreamingSemDedupSpec extends SparkSpec {
  import spark.implicits._

  private val tau = 0.999

  // two well-separated clusters; ids 1-8 are the historical corpus
  private def vec(x: Double, y: Double) = Array(x, y)
  private lazy val corpus = Seq(
    (1L, vec(10.0, 0.0)), (2L, vec(0.0, 10.0)), // cluster anchors
    (3L, vec(10.0, 0.5)), (4L, vec(10.0, 0.5)), // dup pair in A: 4 dropped
    (5L, vec(0.5, 10.0)), (6L, vec(0.5, 10.0)), // dup pair in B: 6 dropped
    (7L, vec(11.0, 2.0)), (8L, vec(2.0, 11.0)))
    .toDF("vec_id", "embedding")
  private lazy val cents = KMeans.fit(corpus, k = 2, iters = 5).localCheckpoint()

  private def ids(df: DataFrame): Set[Long] =
    df.select("vec_id").as[Long].collect().toSet

  /** The batch-merged recompute the contract names: survivors of
    * (index survivors ∪ batch), restricted to the batch. */
  private def merged(index: DataFrame, batch: Seq[(Long, Array[Double])]): Set[Long] = {
    val all = index.select(col("vec_id"), col("cell_id").cast("long").as("label"),
        col("e").as("embedding"))
      .unionByName(StreamingSemDedup
        .assignWithNorm(batch.toDF("vec_id", "embedding"), cents)
        .select(col("vec_id"), col("cell_id").cast("long").as("label"),
          col("e").as("embedding")))
    val batchIds = batch.map(_._1).toSet
    ids(Similarity.semDedupSurvivors(all, tau)).intersect(batchIds)
  }

  test("survivorIndex holds exactly the semDedup survivors of the fitted cells") {
    val idx = StreamingSemDedup.survivorIndex(corpus, cents, tau)
    assert(ids(idx) == Set(1L, 2L, 3L, 5L, 7L, 8L),
      "the larger id of each planted dup pair is out of the index")
  }

  test("per-batch admissions equal the batch-merged recompute; admitted appends grow the index") {
    implicit val sqlCtx = spark.sqlContext
    var index = StreamingSemDedup.survivorIndex(corpus, cents, tau)
      .localCheckpoint()

    // batch 1: a near-dup of index survivor 3 (drop), a novel vector
    // (admit), and a mutually-duplicate novel pair (smaller admits)
    val batch1 = Seq(
      (101L, vec(10.0, 0.5)), // == survivor 3 -> dropped by index probe
      (102L, vec(6.0, 6.0)), // novel direction -> admitted
      (103L, vec(12.0, -1.0)), (104L, vec(12.0, -1.0))) // within-batch pair
    // batch 2: a near-dup of batch 1's ADMITTED 103 — only caught if
    // the growth loop fed batch 1's admissions back into the index
    val batch2 = Seq(
      (201L, vec(12.0, -1.0)), // dup of admitted 103 -> dropped
      (202L, vec(-5.0, 1.0))) // novel -> admitted

    val input = MemoryStream[(Long, Array[Double])]
    val arriving = input.toDF().toDF("vec_id", "embedding")
    val perBatch = mutable.Map.empty[Long, Set[Long]]
    val q = StreamingSemDedup.sink(index, cents, arriving, tau,
      (admitted, id) => perBatch.synchronized {
        perBatch(id) = ids(admitted)
        index = index.unionByName(admitted).localCheckpoint() // growth loop
      }).start()
    try {
      val exp1 = merged(index, batch1) // compute BEFORE the index grows
      input.addData(batch1)
      q.processAllAvailable()
      val exp2 = merged(index, batch2) // index now includes batch 1 admissions
      input.addData(batch2)
      q.processAllAvailable()
      assert(exp1 == Set(102L, 103L), s"fixture: $exp1")
      assert(perBatch(0L) == exp1,
        s"batch 1 admissions ${perBatch(0L)} != merged recompute $exp1")
      assert(exp2 == Set(202L), s"fixture: growth must veto 201, got $exp2")
      assert(perBatch(1L) == exp2,
        s"batch 2 admissions ${perBatch(1L)} != merged recompute $exp2")
    } finally q.stop()
  }

  test("driftSink scores each micro-batch against the cell baseline — parity with the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    import graft.extensions.EmbeddingDrift
    val baseline = EmbeddingDrift.cellProfile(
      StreamingSemDedup.assignWithNorm(corpus, cents)
        .select(col("cell_id").cast("long").as("cell")))
      .localCheckpoint()
    // a batch collapsed into cluster A's cell: drift must be positive
    // and equal the batch-mode score of the same vectors
    val batch = Seq((401L, vec(10.0, 0.2)), (402L, vec(11.0, 0.0)),
      (403L, vec(9.5, 0.1)))
    val input = MemoryStream[(Long, Array[Double])]
    val arriving = input.toDF().toDF("vec_id", "embedding")
    var got: Option[(Long, Long, Double)] = None
    val q = StreamingSemDedup.driftSink(baseline, cents, arriving,
      (drift, _) => {
        val r = drift.head()
        got = Some((r.getLong(0), r.getLong(1), r.getDouble(2)))
      }).start()
    try {
      input.addData(batch)
      q.processAllAvailable()
    } finally q.stop()
    val exp = EmbeddingDrift.driftVsProfile(
      StreamingSemDedup.assignWithNorm(batch.toDF("vec_id", "embedding"), cents)
        .select(col("cell_id").cast("long").as("cell")),
      baseline).head()
    assert(got.contains((exp.getLong(0), exp.getLong(1), exp.getDouble(2))),
      s"stream $got != batch (${exp.getLong(0)}, ${exp.getLong(1)}, ${exp.getDouble(2)})")
    assert(got.get._3 > 0.1, s"a collapsed batch must score positive drift: $got")
  }

  test("the streaming side stays stateless and narrow: no state store, no stream-side aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Array[Double])]
    val arriving = input.toDF().toDF("vec_id", "embedding")
    val assigned = StreamingSemDedup.assignWithNorm(arriving, cents)
    assert(assigned.isStreaming, "assignment must compose into the streaming plan")
    val plan = assigned.queryExecution.analyzed.toString
    assert(!plan.contains("Aggregate"), plan)
    // the whole admission query runs without watermarks or state: if the
    // narrow claim broke, start() would demand an output mode/watermark
    val q = StreamingSemDedup.sink(
      StreamingSemDedup.survivorIndex(corpus, cents, tau), cents, arriving,
      tau, (_, _) => ()).start()
    try {
      input.addData(Seq((301L, vec(1.0, 1.0))))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "admission must keep zero streaming state")
    } finally q.stop()
  }
}
