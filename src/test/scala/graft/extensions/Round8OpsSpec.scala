package graft.extensions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-8 plan-shape fixes: the row-local k-means argmin (the de-weaked
  * IVF index build), the sorted run-length entropy fold, the semDedup
  * cell-size guard, and the conditional contamination broadcast. */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val twoCells = Seq(
    (0, Array(1.0f, 0.0f)),
    (1, Array(0.0f, 1.0f))).toDF("cell_id", "centroid")

  test("KMeans.assign is a zero-exchange narrow projection — no shuffle, no join") {
    val emb = (1L to 20L)
      .map(i => (i, Array((i % 3).toFloat, (i % 5).toFloat)))
      .toDF("vec_id", "embedding")
    val p = KMeans.assign(emb, twoCells).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p) // neither shuffle nor broadcast
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p) // the old n×k argmin ranking is gone
  }

  test("KMeans.assign picks the nearest cell; ties break to the smallest cell_id") {
    val emb = Seq(
      (1L, Array(0.9f, 0.1f)), // near cell 0
      (2L, Array(0.1f, 0.9f)), // near cell 1
      (3L, Array(0.5f, 0.5f))) // equidistant -> cell 0 (smallest id wins)
      .toDF("vec_id", "embedding")
    val got = KMeans.assign(emb, twoCells)
      .select("vec_id", "cell_id").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 0))
  }

  test("KMeans.assign matches the windowed-argmin reference shape exactly") {
    // the old crossJoin + row_number plan, kept here as the semantic
    // oracle: the row-local fold must reproduce its assignment for every
    // vector, including distance ties
    import org.apache.spark.sql.expressions.Window
    val emb = (1L to 60L)
      .map(i => (i, Array((i % 7).toFloat, (i % 11).toFloat, (i % 3).toFloat)))
      .toDF("vec_id", "embedding")
    val cents = KMeans.fit(emb, k = 4, iters = 2)
    def dist2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
    val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("cell_id"))
    val reference = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .crossJoin(broadcast(cents.select(col("cell_id"),
        col("centroid").cast("array<double>").as("ce"))))
      .withColumn("d2", dist2(col("e"), col("ce")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("vec_id", "cell_id").as[(Long, Int)].collect().toMap
    val rowLocal = KMeans.assign(emb, cents)
      .select("vec_id", "cell_id").as[(Long, Int)].collect().toMap
    assert(rowLocal == reference)
  }
}
