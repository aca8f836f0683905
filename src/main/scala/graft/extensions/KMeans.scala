package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic Lloyd's k-means over an embedding column — the IVF
  * "train" step feeding [[Similarity.ivfSearch]].
  *
  * Scale shape per iteration: one broadcast of the k×dim centroid table
  * (tiny), one narrow argmin pass over the vectors, one
  * (cell, position) aggregation — i.e. the cost of a groupBy, times
  * `iters`. Only the centroid table (bounded by k, never by data) is
  * collected to the driver between iterations; the vectors themselves
  * never move. Init is the k lowest vec_ids: deterministic, so results
  * are reproducible run to run (k-means++ would trade determinism for
  * quality; at 100 TB you'd init from a seeded sample instead).
  */
object KMeans {

  private def asDouble(c: org.apache.spark.sql.Column) = c.cast("array<double>")

  /** Squared L2 distance between two array<double> columns. */
  private def dist2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  /** Assign each vector to its nearest centroid.
    * @param centroids (cell_id, centroid array<double>) */
  def assign(embeddings: DataFrame, centroids: DataFrame): DataFrame = {
    val e = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("e"))
    val c = centroids.select(col("cell_id"), asDouble(col("centroid")).as("ce"))
    val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("cell_id"))
    e.crossJoin(broadcast(c))
      .withColumn("d2", dist2(col("e"), col("ce")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("e"), col("cell_id"))
  }

  /** Element-wise mean per cell, re-assembled into centroid arrays. */
  private def recompute(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cell_id"), posexplode(col("e")))
      .groupBy("cell_id", "pos").agg(avg("col").as("m"))
      .groupBy("cell_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cell_id"), col("pm.m").as("centroid"))

  /** Fit k centroids with `iters` Lloyd iterations.
    * @return (cell_id, centroid array<double>) — a broadcastable dim */
  def fit(embeddings: DataFrame, k: Int, iters: Int): DataFrame = {
    val e0 = embeddings
      .select(col("vec_id"), asDouble(col("embedding")).as("embedding"))
      .orderBy("vec_id").limit(k).collect()
    val spark = embeddings.sparkSession
    import spark.implicits._
    var cents = e0.zipWithIndex.map { case (r, i) =>
      (i, r.getSeq[Double](r.fieldIndex("embedding")))
    }.toSeq.toDF("cell_id", "centroid")
    var it = 0
    while (it < iters) {
      val assigned = assign(embeddings, cents)
      // bounded collect: k × dim doubles, independent of |embeddings|
      val next = recompute(assigned).collect().map(r =>
        (r.getInt(0), r.getSeq[Double](1))).toSeq
      cents = next.toDF("cell_id", "centroid")
      it += 1
    }
    cents
  }
}
