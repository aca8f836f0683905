package graft.streaming

import org.apache.spark.sql.execution.{FileSourceScanExec, SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.merge.ScdMerge
import graft.plans.Layout

/** The zero-sort bucketed merge wired into the streaming path as an
  * LSM over the state table (r19 VERDICT #6): parity with the batch
  * chain over a replayed snapshot sequence under ANY compaction
  * cadence, delta-append write economy (rows written per batch =
  * changed keys, not |state|), the two read-plan regimes (compacted:
  * Exchange- and Sort-free state side; fragmented: Sort but never
  * Exchange), and the batchId replay guard. */
class StreamingBucketedMergeSpec extends SparkSpec {
  import spark.implicits._

  private val tracked = Seq("v0", "v1", "v2")

  private def snap(ids: Seq[Long], tag: String) =
    ids.toDF("id").select(col("id"),
      concat(lit(tag), col("id")).as("v0"),
      (col("id") * 2).cast("string").as("v1"),
      lit(tag).as("v2"))

  private val snaps = Seq(
    snap(1L to 3000L, "a") -> "2024-01-01",
    snap(1501L to 4500L, "b") -> "2024-02-01",
    snap(1L to 1000L, "c") -> "2024-03-01",
    snap(2500L to 5000L, "d") -> "2024-04-01")

  private def chained: Seq[Seq[Any]] =
    snaps.foldLeft(ScdMerge.emptyState(snaps.head._1)) {
      case (st, (sn, day)) => ScdMerge.applySnapshot(st, sn, day, "id", tracked)
    }.collect().map(_.toSeq).sortBy(_.toString).toSeq

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _ => p.children
    }
    p +: kids.flatMap(flatten)
  }

  private def stateSideOf(merged: org.apache.spark.sql.DataFrame,
      table: String): SparkPlan = {
    val all = flatten(merged.queryExecution.executedPlan)
    val smj = all.collectFirst {
      case j: SortMergeJoinExec if j.joinType.sql == "FULL OUTER" => j
    }.getOrElse(fail(s"full-outer SMJ expected:\n${all.head}"))
    Seq(smj.left, smj.right).find(s => flatten(s).exists {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.exists(_.toString.contains(table))
      case _ => false
    }).getOrElse(fail(s"no $table scan under the SMJ"))
  }

  test("replayed snapshot sequence with policy compaction equals the in-memory batch chain; appends write only the delta") {
    var st = StreamingBucketedMerge.init(
      ScdMerge.emptyState(snaps.head._1), "scd_lsm_par", "id", tracked, 4)
    snaps.foreach { case (sn, day) =>
      val before = spark.table("scd_lsm_par").count()
      val expectDelta = ScdMerge.applySnapshotDelta(
        StreamingBucketedMerge.currentState(spark, st), sn, day, "id", tracked)
        .filter(col(ScdMerge.ChangedCol)).count()
      val preFragmented = st.fragmented
      st = StreamingBucketedMerge.applyBatchCompacting(
        spark, st, sn, day, maxFilesPerBucket = 2)
      if (st.fragmented) // no compaction fired this batch: pure append
        assert(spark.table("scd_lsm_par").count() == before + expectDelta,
          s"append must write exactly the $expectDelta changed rows" +
            s" (was $before, fragmented-before=$preFragmented)")
    }
    val got = StreamingBucketedMerge.currentState(spark, st)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(got == chained,
      "LSM state under policy compaction must equal the in-memory chain")
  }

  test("read-plan regimes: compacted state side is Exchange- and Sort-free; fragmented is Sort-but-never-Exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      var st = StreamingBucketedMerge.init(
        ScdMerge.applySnapshot(ScdMerge.emptyState(snaps.head._1),
          snaps.head._1, "2024-01-01", "id", tracked),
        "scd_lsm_plan", "id", tracked, 4)

      // regime 1: freshly init'ed (compacted) — the zero-sort merge
      val m1 = ScdMerge.applySnapshot(
        StreamingBucketedMerge.currentState(spark, st),
        snaps(1)._1, snaps(1)._2, "id", tracked)
      m1.collect()
      val side1 = flatten(stateSideOf(m1, "scd_lsm_plan"))
      assert(!side1.exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"compacted: NO exchange on the state side:\n${side1.head}")
      assert(!side1.exists(_.isInstanceOf[SortExec]),
        s"compacted: NO sort on the state side:\n${side1.head}")

      // fragment: apply a batch (delta append)
      st = StreamingBucketedMerge.applyBatch(spark, st, snaps(1)._1, snaps(1)._2)
      assert(st.fragmented, "the overlapping snapshot must append a delta")
      val m2 = ScdMerge.applySnapshot(
        StreamingBucketedMerge.currentState(spark, st),
        snaps(2)._1, snaps(2)._2, "id", tracked)
      m2.collect()
      val side2 = flatten(stateSideOf(m2, "scd_lsm_plan"))
      assert(!side2.exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"fragmented: bucketing still satisfies the window+join — NO " +
          s"exchange on the state side:\n${side2.head}")
      assert(side2.exists(_.isInstanceOf[SortExec]),
        "fragmented: the latest-per-key resolve pays the per-bucket sort " +
          "(exactly what compaction removes)")

      // regime 3: resolving compaction restores the zero-sort plan
      st = StreamingBucketedMerge.compact(spark, st)
      assert(!st.fragmented)
      val m3 = ScdMerge.applySnapshot(
        StreamingBucketedMerge.currentState(spark, st),
        snaps(2)._1, snaps(2)._2, "id", tracked)
      m3.collect()
      val side3 = flatten(stateSideOf(m3, "scd_lsm_plan"))
      assert(!side3.exists(_.isInstanceOf[ShuffleExchangeExec]) &&
        !side3.exists(_.isInstanceOf[SortExec]),
        s"post-compaction: Exchange- and Sort-free again:\n${side3.head}")
      // and the compacted table is back to one file per bucket
      assert(Layout.bucketedDataFiles(spark, "scd_lsm_plan") == 4)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("sink: replay guard skips batchIds at or below the applied generation") {
    implicit val sqlCtx = spark.sqlContext
    var st = StreamingBucketedMerge.init(
      ScdMerge.emptyState(snap(1L to 10L, "a")), "scd_lsm_guard", "id",
      tracked, 2)
    // pretend generations 1..3 were already applied (a restart whose
    // checkpointed source replays delivered batches 0..2)
    st = st.copy(gen = 3L)
    var applied = 0
    val input = MemoryStream[Long]
    val q = StreamingBucketedMerge.sink(
      () => st,
      input.toDF().select(col("value").as("id"),
        lit("x").as("v0"), lit("1").as("v1"), lit("x").as("v2")),
      dateOf = (_, _) => "2024-05-01",
      onBatch = (next, _) => { st = next; applied += 1 })
      .start()
    try {
      (1 to 3).foreach { i => // batchIds 0, 1, 2 — all ≤ gen 3
        input.addData(i.toLong)
        q.processAllAvailable()
      }
      assert(applied == 0, "replayed batchIds must be skipped")
      input.addData(99L) // batchId 3: 3 + 1 > 3 — applies
      q.processAllAvailable()
      assert(applied == 1 && st.gen == 4L,
        "the first fresh batchId advances the generation")
      assert(StreamingBucketedMerge.currentState(spark, st)
        .filter(col("id") === 99L).count() == 1L,
        "the fresh batch's key landed in the state")
    } finally q.stop()
  }

  test("crash between append and handle persist: a STALE handle still reads the resolved state and the replay is idempotent") {
    // crash model: applyBatch appended its delta (and advanced the
    // on-disk generation) but the process died BEFORE the caller
    // persisted the new handle — on restart, state() returns the old
    // {gen, fragmented=false} handle beside a physically fragmented
    // table. The flag is advisory; the physical max(_gen) test must
    // keep every read resolved and the redelivered batch a no-op.
    val stale = StreamingBucketedMerge.init(
      ScdMerge.emptyState(snaps.head._1), "scd_lsm_crash", "id", tracked, 4)
    val fresh = StreamingBucketedMerge.applyBatch(
      spark, stale, snaps(1)._1, snaps(1)._2)
    assert(fresh.fragmented, "the batch must have appended a delta")

    // reads through the STALE handle resolve: one row per key, equal
    // to the fresh handle's view (the direct scan would return BOTH
    // generations of every changed key)
    val viaStale = StreamingBucketedMerge.currentState(spark, stale)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val viaFresh = StreamingBucketedMerge.currentState(spark, fresh)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(viaStale == viaFresh,
      "stale-handle read must equal the resolved post-batch state")
    val keyCounts = StreamingBucketedMerge.currentState(spark, stale)
      .groupBy("id").count().filter(col("count") > 1).count()
    assert(keyCounts == 0L, "no key may surface twice through a stale handle")

    // redelivery with the stale handle: the delta against the already-
    // applied state is EMPTY, so no rows are appended (no duplicate
    // generations) and the table is unchanged
    val before = spark.table("scd_lsm_crash").count()
    val replayed = StreamingBucketedMerge.applyBatch(
      spark, stale, snaps(1)._1, snaps(1)._2)
    assert(spark.table("scd_lsm_crash").count() == before,
      "replaying an already-applied batch must append nothing")
    assert(StreamingBucketedMerge.currentState(spark, replayed)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq == viaFresh,
      "post-replay state must equal the once-applied state")
  }
}
