package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic Lloyd's k-means over an embedding column — the IVF
  * "train" step feeding [[Similarity.ivfSearch]].
  *
  * Scale shape per iteration: the k×dim centroid table (tiny, bounded
  * by k, never by data) is collected and inlined, one ROW-LOCAL argmin
  * pass over the vectors (zero shuffle — see [[assign]]), one
  * (cell, position) aggregation — i.e. the cost of a groupBy, times
  * `iters`. Only the centroid table is collected to the driver between
  * iterations; the vectors themselves never move. Init is the k lowest
  * vec_ids: deterministic, so results are reproducible run to run
  * (k-means++ would trade determinism for quality; at 100 TB you'd init
  * from a seeded sample instead).
  */
object KMeans {

  private def asDouble(c: org.apache.spark.sql.Column) = c.cast("array<double>")

  /** Squared L2 distance between two array<double> columns — the native
    * [[graft.functions.SquaredL2]] expression (one fused codegen'd loop,
    * no zipped intermediate), bit-identical to the declarative
    * `aggregate(zip_with(...))` fold it replaced (same left-to-right
    * sum; Round8OpsSpec's windowed-reference parity test re-derives the
    * HOF form and must agree on every assignment). */
  private def dist2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    call_function("squared_l2", a, b)

  /** Assign each vector to its nearest centroid — ROW-LOCALLY. The
    * centroid table is collected once (bounded: k×dim doubles, the same
    * bound [[fit]] already relies on between iterations) and inlined as
    * an array-of-structs literal, so the argmin is a single narrow
    * projection: score all k cells per row, min-fold. Zero Exchange,
    * zero join — at IVF-realistic k (4k–65k cells) the previous
    * crossJoin + row_number window shuffled an n×k expanded frame every
    * Lloyd iteration, which is the difference between an index build
    * that scans the corpus `iters` times and one that shuffles
    * `iters`×k corpora.
    *
    * Ties break to the smallest cell_id: the literal is sorted by
    * cell_id and the fold keeps the incumbent on equal distance —
    * identical to the old `orderBy(d2, cell_id)` window ranking, so
    * NON-DEGENERATE assignments (and every downstream centroid) are
    * bit-for-bit unchanged. Degenerate rows — null embedding, null
    * element, dim mismatch, where EVERY centroid distance is NULL —
    * are DROPPED from the assignment (the fold's -1 sentinel is
    * filtered out) rather than silently landing in a cell: the old
    * window's NULLS-FIRST ranking "assigned" such rows to the smallest
    * cell_id on no evidence, and a -1 sentinel would leak a phantom
    * cell into every downstream groupBy. Quarantine semantics, same as
    * the multimodal decoders: an unassignable vector is data, not an
    * exception, and not a fake member of cell 0 either.
    * @param centroids (cell_id, centroid array<double>) */
  def assign(embeddings: DataFrame, centroids: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val cents = centroids
      .select(col("cell_id").cast("int"), asDouble(col("centroid")))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    val e = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("e"))
    // no centroids -> no assignments (the pre-round-8 crossJoin shape's
    // behavior; an empty-corpus fit reaches here)
    if (cents.isEmpty) return e.withColumn("cell_id", lit(0)).limit(0)
    val centLit = typedLit(cents.toSeq) // array<struct<_1:int,_2:array<double>>>
    // one-eval discipline: each cell's d2 is computed once inside the
    // scoring transform; the min-fold then only compares struct fields
    val scored = transform(centLit, c => struct(
      c.getField("_1").as("cell_id"),
      dist2(col("e"), c.getField("_2")).as("d2")))
    val best = aggregate(scored,
      struct(lit(-1).as("cell_id"), lit(Double.MaxValue).as("d2")),
      (acc, s) => when(s.getField("d2") < acc.getField("d2"), s).otherwise(acc))
    e.select(col("vec_id"), col("e"), best.getField("cell_id").as("cell_id"))
      .filter(col("cell_id") =!= -1) // degenerate rows: see scaladoc
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
