package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (r15 VERDICT #4): synthesize an sf1 slice — 10× sf0.1 — so
  * the heavy families get ONE measured point an order of magnitude above
  * the bench scale, turning the design-audited linear-cost claims into a
  * measured slope.
  *
  * Construction: `documents` and `orders` replicated `reps`× under
  * disjoint id strides. Document tokens carry a per-replica prefix
  * (replica 0 verbatim), so cross-replica text is NOT near-duplicate —
  * within-replica duplicate/Zipf structure is preserved, which is
  * exactly the workload whose linear scaling is under test (the same
  * construction [[Bench.lsmBench]] uses for term-space amplification; an
  * unprefixed copy would make every doc a 10-way near-dup and square the
  * candidate-pair count instead of scaling it). Id strides are multiples
  * of 10 (and 5), so the `doc_id % 5` reference slice and `doc_id % 10`
  * benchmark-slice conventions keep their per-replica proportions.
  *
  * Usage: runMain graft.MakeSf1 [srcDir] [dstDir] [reps]
  * Writes <dstDir>/{documents,orders}.parquet (the only tables the heavy
  * families read). Never part of the library surface. */
object MakeSf1 {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "testdata_sf1"
    val reps = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.table(spark, src, "documents")
    val docStride = 1000000L // multiple of 10: slice conventions survive
    (0 until reps).map { i =>
      docs.select(
        (col("doc_id") + lit(i * docStride)).as("doc_id"),
        (if (i == 0) col("text")
         else regexp_replace(col("text"), "(\\S+)", s"r${i}_$$1")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val orders = Tables.table(spark, src, "orders")
    val oStride = 100000000L
    (0 until reps).map { i =>
      orders.select(
        (col("o_orderkey") + lit(i * oStride)).as("o_orderkey"),
        col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"))
    }.reduce(_ unionByName _)
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dst/orders.parquet")

    println(s"MAKESF1 done: $dst at ${reps}x $src")
    spark.stop()
  }
}
