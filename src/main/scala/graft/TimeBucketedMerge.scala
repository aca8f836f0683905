package graft

import org.apache.spark.sql.functions._

import graft.merge.ScdMerge
import graft.plans.Layout
import graft.queries.CoreQueries

/** Dev measurement for the bucketed, SORT-FREE wide SCD merge (r18
  * VERDICT #1): the r18 noop billing measured q_merge_scd_wide
  * SUPER-linear at a fixed 8 GiB heap (13.7×/decade, attributed to the
  * full-outer SMJ sort-spilling 53-column UnsafeRows; PLANS.md r18
  * block), with "bucket the state on the merge key" as the stated —
  * but undemonstrated — remedy. This lever runs that remedy end to
  * end at sf1/sf10 and bills its pieces solo, at the ORIGINAL heap:
  *
  *  - state_build: snapshot A merged into empty state (the same wide
  *    projection q_merge_scd_wide uses), then written by
  *    [[Layout.writeBucketedSorted]] — the one-time index price.
  *  - merge_noop: [[ScdMerge.applySnapshot]] of the perturbed snapshot
  *    B against the BUCKETED state table, full projection via a noop
  *    sink (TimeOne's honest-billing mode). The state side runs with
  *    no Exchange and no Sort (ScdBucketedMergeSpec pins the plan), so
  *    the only sort left is the arriving snapshot's.
  *  - merge_noop_bktsnap: the same merge with snapshot B ALSO
  *    pre-bucketed — the zero-sort plan a 100 TB pipeline gets when
  *    arrivals are ingest-normalized into the state's bucketing.
  *
  * Usage: runMain graft.TimeBucketedMerge [sfDir] [buckets] [reps] [stages]
  * `stages` (csv of build,merge,bktmerge; default all) exists for the
  * disk-bounded scales: at sf100 the fresh-snapshot merge's arriving-
  * side sort spill PLUS both persisted tables exceed the dev box's
  * scratch, so the two-decade run does build + bktmerge in one JVM
  * (the zero-shuffle zero-sort merge needs no shuffle temp at all)
  * and prices the fresh-snapshot variant separately if disk allows. */
object TimeBucketedMerge {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "testdata_sf1"
    val buckets = if (args.length > 1) args(1).toInt else 32
    val reps = if (args.length > 2) args(2).toInt else 3
    val stages: Set[String] = if (args.length > 3) args(3).split(",").toSet
      else Set("build", "merge", "bktmerge")
    // passes > 1 routes the two table builds through
    // Layout.writeBucketedSortedStaged — the bounded-scratch bulk build
    // (peak shuffle scratch total/passes; required for sf100 on the
    // dev box, where the monolithic build's spill exceeds the disk)
    val passes = if (args.length > 4) args(4).toInt else 1
    // merge stages may rep more than the (expensive, idempotent)
    // builds: the tool session's warehouse is a temp dir, so a merge
    // retime cannot reuse a previous JVM's tables — one invocation
    // builds once and times the merge mergeReps times
    val mergeReps = if (args.length > 5) args(5).toInt else reps
    val spark = GraftSession.tool(defaultCpus = 8, logLevel = "ERROR")
    // sorted-bucket-scan claim now rides GraftSession.protectedConfs
    // (r20) — no per-tool conf mutation
    spark.range(1000000).selectExpr("sum(id)").collect()

    def timeN[A](label: String, n: Int)(f: => A): Unit =
      (1 to n).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"TIMING $label rep=$i sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    def time[A](label: String)(f: => A): Unit = timeN(label, reps)(f)

    val a = CoreQueries.wideSnap(spark, sfDir, perturb = false,
      col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    def b = CoreQueries.wideSnap(spark, sfDir, perturb = true,
      col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
    val cols = CoreQueries.wideCols

    def writeState(df: org.apache.spark.sql.DataFrame, tbl: String): Unit =
      if (passes == 1) Layout.writeBucketedSorted(df, tbl, Seq("id"), buckets)
      else Layout.writeBucketedSortedStaged(df, tbl, Seq("id"), buckets, passes)

    if (stages("build")) time("state_build") {
      val s1 = ScdMerge.applySnapshot(
        ScdMerge.emptyState(a), a, "1998-01-01", "id", cols)
      writeState(s1, "scd_state_bench")
    }
    if (stages("merge")) timeN("merge_noop", mergeReps) {
      ScdMerge.applySnapshot(
          spark.table("scd_state_bench"), b, "1998-06-01", "id", cols)
        .write.format("noop").mode("overwrite").save()
    }
    if (stages("bktmerge") || stages("bktmergeonly")) {
      // arrivals ingest-normalized into the state's bucketing: dedupe
      // at write time, then merge with snapshotDeduped = true — the
      // ZERO-Exchange ZERO-Sort plan on both sides. `bktmergeonly`
      // re-times the merge against tables a previous invocation built
      // (the long sf100 builds need not repeat for extra merge reps).
      if (stages("bktmerge")) time("snap_build") {
        writeState(b.dropDuplicates("id"), "scd_snap_bench")
      }
      timeN("merge_noop_bktsnap", mergeReps) {
        ScdMerge.applySnapshot(
            spark.table("scd_state_bench"), spark.table("scd_snap_bench"),
            "1998-06-01", "id", cols, snapshotDeduped = true)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
