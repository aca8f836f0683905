package graft.extensions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Hard-negative mining + prototypicality pruning: fixture-pinned
  * semantics (the foreign-cell restriction, the ordinal ranks, the
  * exact per-cell cut) and the scale-shape pins (broadcast dims, no
  * cartesian products, bounded anchor side). */
class HardNegativesSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated 2-D cells; anchors = vec_id % 4 == 0
  private def fixture = Seq(
    (0L, Seq(1.0f, 0.0f), 0), (1L, Seq(0.9f, 0.1f), 0),
    (4L, Seq(0.7f, 0.7f), 1), (5L, Seq(0.6f, 0.8f), 1),
    (8L, Seq(0.0f, 1.0f), 2), (9L, Seq(0.1f, 0.9f), 2)
  ).toDF("vec_id", "embedding", "label")

  test("negatives come from the nearest FOREIGN cell, ranked by cosine") {
    val out = Similarity.hardNegatives(fixture, anchorMod = 4,
      nprobe = 1, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (t._1, t._2)) // hardNegatives no longer presentation-sorts (r21)
    // anchor 0 (cell 0): nearest foreign centroid is cell 1;
    // cos(e0, e4)=0.7071 > cos(e0, e5)=0.6 -> ranks (4, 5)
    assert(out.filter(_._1 == 0L).toSeq ==
      Seq((0L, 1L, 4L, 1), (0L, 2L, 5L, 1)))
    // anchor 8 (cell 2): nearest foreign centroid is cell 1 again;
    // cos(e8, e5)=0.8 > cos(e8, e4)=0.7071 -> ranks (5, 4)
    assert(out.filter(_._1 == 8L).toSeq ==
      Seq((8L, 1L, 5L, 1), (8L, 2L, 4L, 1)))
    // NEVER a same-cell neighbor, never the anchor itself
    val labelOf = Map(0L -> 0, 1L -> 0, 4L -> 1, 5L -> 1, 8L -> 2, 9L -> 2)
    out.foreach { case (a, _, v, l) =>
      assert(l != labelOf(a), "foreign cells only")
      assert(v != a)
    }
  }

  test("plan shape: broadcast dim + probe, no cartesian product") {
    val plan = Similarity.hardNegatives(
      Tables.table(spark, "/root/testdata/sf0.001", "embeddings"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"no all-pairs:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"centroid/probe dims must broadcast:\n$plan")
  }

  test("anchor broadcast is guarded: under the cap the probe list broadcasts, over it the probe join shuffles, rows identical") {
    val emb = Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable AUTO broadcast so the plan shows only what the guard
      // decides (the LayoutSkewSpec discipline)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val under = Similarity.hardNegatives(emb) // cap default ≫ anchors
      assert(under.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "under the cap the probe join must be broadcast")
      val over = Similarity.hardNegatives(emb, broadcastAnchorCap = 0)
      val overPlan = over.queryExecution.executedPlan.toString
      assert(!overPlan.contains("CartesianProduct"), overPlan)
      assert(overPlan.contains("SortMergeJoin") ||
        overPlan.contains("ShuffledHashJoin"),
        s"over the cap the probe join must shuffle, not broadcast:\n$overPlan")
      val a = under.collect().map(_.toSeq).sortBy(_.toString).toSeq
      val b = over.collect().map(_.toSeq).sortBy(_.toString).toSeq
      assert(a == b, "the fallback path must return identical rows")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("prototypicality prune: exact per-cell cut, cores dropped, tails kept") {
    val out = Similarity.prototypicalityPrune(
      Tables.table(spark, "/root/testdata/sf0.001", "embeddings"),
      dropPerMille = 200)
    val perLabel = out.groupBy("label").agg(
      count(lit(1)).as("n"),
      sum(when(!col("keep"), 1L).otherwise(0L)).as("n_drop"),
      min(when(!col("keep"), col("cos_c"))).as("min_dropped"),
      max(when(col("keep"), col("cos_c"))).as("max_kept"))
      .collect()
    assert(perLabel.nonEmpty)
    perLabel.foreach { r =>
      val (n, nDrop) = (r.getLong(1), r.getLong(2))
      assert(nDrop == n * 200 / 1000,
        s"label ${r.get(0)}: exact 20% cut ($nDrop of $n)")
      if (nDrop > 0 && nDrop < n)
        assert(r.getDouble(3) >= r.getDouble(4),
          s"label ${r.get(0)}: dropped cores are the closest to centroid")
    }
  }

  test("prune total: every vector gets exactly one verdict") {
    val emb = Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val out = Similarity.prototypicalityPrune(emb)
    assert(out.count() == emb.count())
    assert(out.select("vec_id").distinct().count() == emb.count())
  }
}
