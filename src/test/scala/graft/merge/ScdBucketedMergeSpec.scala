package graft.merge

import org.apache.spark.sql.execution.{FileSourceScanExec, SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.Layout

/** The bucketed, SORT-FREE SCD merge demonstrated end-to-end (r18
  * VERDICT #1): with the state table written by
  * [[Layout.writeBucketedSorted]] (bucketed + sorted on the merge key,
  * one file per bucket), [[ScdMerge.applySnapshot]]'s full-outer
  * sort-merge join consumes the layout directly — the executed plan
  * carries NO Exchange and NO Sort anywhere on the state side (the
  * snapshot side still shuffles + sorts, as a fresh arrival must), and
  * the merged rows are identical to the unbucketed path. This is the
  * 100 TB answer to the measured 13.7×/decade sort-spill term
  * (PLANS.md r18 block): state that is never re-sorted cannot spill
  * its sort. */
class ScdBucketedMergeSpec extends SparkSpec {
  import spark.implicits._

  private val tracked = Seq("v0", "v1", "v2")

  private def snap(ids: Seq[Long], tag: String) =
    ids.toDF("id").select(col("id"),
      concat(lit(tag), col("id")).as("v0"),
      (col("id") * 2).cast("string").as("v1"),
      lit(tag).as("v2"))

  /** Flatten an executed plan, descending through AQE wrappers (the
    * Layout.scannedFiles walk, kept node-typed). */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _ => p.children
    }
    p +: kids.flatMap(flatten)
  }

  /** Run `f` with the bucketed-scan sort order exposed to the planner.
    * Spark ≥3.0 hides it by default (SPARK-28173: multi-file buckets
    * are only partially sorted); the legacy conf restores the 2.4
    * behavior, which claims the order ONLY when every bucket is a
    * single file — exactly the invariant [[Layout.writeBucketedSorted]]
    * establishes and [[Layout.compactBucketed]] restores. */
  private def withSortedBucketScan[A](f: => A): A = {
    val key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    val prev = spark.conf.get(key, "false")
    spark.conf.set(key, "true")
    try f finally spark.conf.set(key, prev)
  }

  test("bucketed state: full-outer SMJ with no Exchange and no Sort on the state side, rows unchanged") {
    val a = snap(1L to 5000L, "a")
    val b = snap(2001L to 7000L, "b")
    val s1 = ScdMerge.applySnapshot(
      ScdMerge.emptyState(a), a, "2024-01-01", "id", tracked)
    Layout.writeBucketedSorted(s1, "scd_state_bkt", Seq("id"), 4)

    val expected = ScdMerge
      .applySnapshot(s1, b, "2024-02-01", "id", tracked)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try withSortedBucketScan {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val merged = ScdMerge.applySnapshot(
        spark.table("scd_state_bkt"), b, "2024-02-01", "id", tracked)
      val got = merged.collect().map(_.toSeq).sortBy(_.toString).toSeq
      assert(got == expected, "bucketed and unbucketed merges must agree")

      // inspect the FINAL adaptive plan, post-execution
      val all = flatten(merged.queryExecution.executedPlan)
      val smj = all.collectFirst {
        case j: SortMergeJoinExec if j.joinType.sql == "FULL OUTER" => j
      }.getOrElse(fail(s"full-outer SMJ expected:\n${all.head}"))
      def hasStateScan(side: SparkPlan) = flatten(side).exists {
        case f: FileSourceScanExec =>
          f.relation.location.rootPaths.exists(_.toString.contains("scd_state_bkt"))
        case _ => false
      }
      val (stateSide, snapSide) =
        if (hasStateScan(smj.left)) (smj.left, smj.right)
        else (smj.right, smj.left)
      assert(hasStateScan(stateSide), "one SMJ side must scan the state table")
      val stateNodes = flatten(stateSide)
      assert(!stateNodes.exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"NO exchange on the state side:\n$stateSide")
      assert(!stateNodes.exists(_.isInstanceOf[SortExec]),
        s"NO sort on the state side (bucket sort order consumed):\n$stateSide")
      // sanity: the SMJ genuinely needs order — the fresh snapshot
      // side still sorts (and shuffles) as the contract allows
      val snapNodes = flatten(snapSide)
      assert(snapNodes.exists(_.isInstanceOf[SortExec]),
        s"snapshot side sorts:\n$snapSide")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("both sides bucketed + snapshotDeduped: ZERO Exchange and ZERO Sort in the whole merge") {
    val a = snap(1L to 3000L, "a")
    val b = snap(1001L to 4000L, "b")
    val s1 = ScdMerge.applySnapshot(
      ScdMerge.emptyState(a), a, "2024-01-01", "id", tracked)
    Layout.writeBucketedSorted(s1, "scd_state_bkt2", Seq("id"), 4)
    Layout.writeBucketedSorted(b, "scd_snap_bkt2", Seq("id"), 4)
    val expected = ScdMerge
      .applySnapshot(s1, b, "2024-02-01", "id", tracked)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try withSortedBucketScan {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val merged = ScdMerge.applySnapshot(
        spark.table("scd_state_bkt2"), spark.table("scd_snap_bkt2"),
        "2024-02-01", "id", tracked, snapshotDeduped = true)
      val got = merged.collect().map(_.toSeq).sortBy(_.toString).toSeq
      assert(got == expected)
      val all = flatten(merged.queryExecution.executedPlan)
      assert(!all.exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"the 100 TB merge plan has no exchange at all:\n${all.head}")
      assert(!all.exists(_.isInstanceOf[SortExec]),
        s"…and no sort at all:\n${all.head}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q_merge_scd_bucketed (the driver-verified row) rides the sort-free state scan") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val df = graft.queries.Registry.queries("q_merge_scd_bucketed")(
        spark, "/root/testdata/sf0.001")
      df.collect() // finalize the adaptive plan
      val all = flatten(df.queryExecution.executedPlan)
      val smj = all.collectFirst {
        case j: SortMergeJoinExec if j.joinType.sql == "FULL OUTER" => j
      }.getOrElse(fail("full-outer SMJ expected"))
      val stateSide = Seq(smj.left, smj.right).find(s => flatten(s).exists {
        case f: FileSourceScanExec =>
          f.relation.location.rootPaths.exists(_.toString.contains("scd_state_wide"))
        case _ => false
      }).getOrElse(fail("no bucketed state scan under the SMJ"))
      val nodes = flatten(stateSide)
      assert(!nodes.exists(_.isInstanceOf[ShuffleExchangeExec]) &&
        !nodes.exists(_.isInstanceOf[SortExec]),
        s"state side must be exchange- and sort-free:\n$stateSide")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("multi-generation loop: each merged state re-persisted bucketed, every generation's state scan sort-free, final rows ≡ chained in-memory merges") {
    // The production shape: day N's merge consumes day N-1's persisted
    // bucketed state and its output becomes day N+1's state. Three
    // generations, each written with writeBucketedSorted (one file per
    // bucket, so the scan may claim the order) — the chained result
    // must equal the pure in-memory chain, and EVERY generation's
    // merge must read its state exchange- and sort-free.
    val snaps = Seq(
      snap(1L to 3000L, "a") -> "2024-01-01",
      snap(1501L to 4500L, "b") -> "2024-02-01",
      snap(1L to 1000L, "c") -> "2024-03-01",
      snap(2500L to 5000L, "d") -> "2024-04-01")

    val expected = snaps.foldLeft(ScdMerge.emptyState(snaps.head._1)) {
      case (st, (sn, day)) => ScdMerge.applySnapshot(st, sn, day, "id", tracked)
    }.collect().map(_.toSeq).sortBy(_.toString).toSeq

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try withSortedBucketScan {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val g0 = ScdMerge.applySnapshot(
        ScdMerge.emptyState(snaps.head._1), snaps.head._1,
        snaps.head._2, "id", tracked)
      Layout.writeBucketedSorted(g0, "scd_gen0", Seq("id"), 4)
      snaps.tail.zipWithIndex.foreach { case ((sn, day), i) =>
        val merged = ScdMerge.applySnapshot(
          spark.table(s"scd_gen$i"), sn, day, "id", tracked)
        // pin the sort-free state scan BEFORE the write consumes it
        merged.collect()
        val all = flatten(merged.queryExecution.executedPlan)
        val smj = all.collectFirst {
          case j: SortMergeJoinExec if j.joinType.sql == "FULL OUTER" => j
        }.getOrElse(fail(s"gen$i: full-outer SMJ expected"))
        val stateSide = Seq(smj.left, smj.right).find(s => flatten(s).exists {
          case f: FileSourceScanExec =>
            f.relation.location.rootPaths.exists(_.toString.contains("scd_gen"))
          case _ => false
        }).getOrElse(fail(s"gen$i: no bucketed state scan under the SMJ"))
        val nodes = flatten(stateSide)
        assert(!nodes.exists(_.isInstanceOf[ShuffleExchangeExec]) &&
          !nodes.exists(_.isInstanceOf[SortExec]),
          s"gen$i state side must stay exchange- and sort-free:\n$stateSide")
        Layout.writeBucketedSorted(merged, s"scd_gen${i + 1}", Seq("id"), 4)
      }
      val got = spark.table(s"scd_gen${snaps.size - 1}")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      assert(got == expected,
        "the persisted-state chain must equal the in-memory chain")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("writeBucketedSorted produces exactly one file per bucket") {
    Layout.writeBucketedSorted(snap(1L to 1000L, "x"), "bkt_onefile", Seq("id"), 4)
    val dir = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath,
      "bkt_onefile")
    val files = dir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 4, s"one file per bucket, got $files")
    assert(spark.table("bkt_onefile").count() == 1000)
  }
}
