package graft.plans

import org.apache.spark.sql.execution.{FileSourceScanExec, SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.merge.ScdMerge

/** [[Layout.writeBucketedSortedStaged]] — the bounded-scratch bulk
  * build. The contract: N sequential bucket-range passes end at the
  * SAME table the monolithic [[Layout.writeBucketedSorted]] produces —
  * one sorted file per bucket, identical rows — so every sort-free
  * consumer (the bucketed SCD merge, the band-index probes) is
  * oblivious to HOW the table was built, while peak shuffle scratch
  * drops to total/passes (the property that made the sf100 state
  * build fit the dev box at all; PLANS.md round-19 sf100 block). */
class StagedBucketBuildSpec extends SparkSpec {
  import spark.implicits._

  private val tracked = Seq("v0", "v1", "v2")

  private def snap(ids: Seq[Long], tag: String) =
    ids.toDF("id").select(col("id"),
      concat(lit(tag), col("id")).as("v0"),
      (col("id") * 2).cast("string").as("v1"),
      lit(tag).as("v2"))

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _ => p.children
    }
    p +: kids.flatMap(flatten)
  }

  private def bucketFiles(table: String): Seq[java.io.File] = {
    val dir = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath,
      table)
    dir.listFiles().toSeq.filter(_.getName.endsWith(".parquet"))
  }

  test("staged ≡ monolithic: one sorted file per bucket, identical rows, any passes divisor") {
    val df = snap(1L to 5000L, "x")
    Layout.writeBucketedSorted(df, "stg_mono", Seq("id"), 8)
    val expected = spark.table("stg_mono")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    for (passes <- Seq(1, 2, 4, 8)) {
      Layout.writeBucketedSortedStaged(df, s"stg_p$passes", Seq("id"), 8, passes)
      assert(bucketFiles(s"stg_p$passes").size == 8,
        s"passes=$passes: one file per bucket")
      val got = spark.table(s"stg_p$passes")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      assert(got == expected, s"passes=$passes: rows identical to monolithic")
    }
  }

  test("a pass owns a whole bucket range: per-pass row sets are disjoint and cover everything") {
    val df = snap(1L to 2000L, "y")
    // the pass filter IS the writer's bucket assignment: hash() is
    // murmur3 seed 42, exactly what bucketBy uses
    val withBkt = df.withColumn("_b", pmod(hash(col("id")), lit(8)))
    val perPass = (0 until 4).map { p =>
      withBkt.filter(col("_b") >= p * 2 && col("_b") < (p + 1) * 2).count()
    }
    assert(perPass.sum == 2000, "passes cover every row exactly once")
    assert(perPass.forall(_ > 0), "murmur3 spreads ids across all ranges")
  }

  test("the staged table feeds the sort-free merge: no Exchange, no Sort on the state side") {
    val a = snap(1L to 3000L, "a")
    val b = snap(1501L to 4500L, "b")
    val s1 = ScdMerge.applySnapshot(
      ScdMerge.emptyState(a), a, "2024-01-01", "id", tracked)
    Layout.writeBucketedSortedStaged(s1, "stg_state", Seq("id"), 8, 4)
    val expected = ScdMerge
      .applySnapshot(s1, b, "2024-02-01", "id", tracked)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq

    val key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    val prevOrd = spark.conf.get(key, "false")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set(key, "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val merged = ScdMerge.applySnapshot(
        spark.table("stg_state"), b, "2024-02-01", "id", tracked)
      val got = merged.collect().map(_.toSeq).sortBy(_.toString).toSeq
      assert(got == expected)
      val all = flatten(merged.queryExecution.executedPlan)
      val smj = all.collectFirst {
        case j: SortMergeJoinExec if j.joinType.sql == "FULL OUTER" => j
      }.getOrElse(fail("full-outer SMJ expected"))
      val stateSide = Seq(smj.left, smj.right).find(s => flatten(s).exists {
        case f: FileSourceScanExec =>
          f.relation.location.rootPaths.exists(_.toString.contains("stg_state"))
        case _ => false
      }).getOrElse(fail("no staged state scan under the SMJ"))
      val nodes = flatten(stateSide)
      assert(!nodes.exists(_.isInstanceOf[ShuffleExchangeExec]) &&
        !nodes.exists(_.isInstanceOf[SortExec]),
        s"staged-built state must merge exchange- and sort-free:\n$stateSide")
    } finally {
      spark.conf.set(key, prevOrd)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }
}
