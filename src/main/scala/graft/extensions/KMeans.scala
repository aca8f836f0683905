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

  /** Assign each vector to its nearest centroid — ROW-LOCALLY. The
    * centroid table is collected once (bounded: k×dim doubles, the same
    * bound [[fit]] already relies on between iterations) and shipped as
    * a BROADCAST consumed by the native
    * [[graft.functions.NearestCell]] expression, so the argmin is a
    * single narrow projection: one fused k×dim loop per row. Zero
    * Exchange, zero join — at IVF-realistic k (4k–65k cells) the
    * previous crossJoin + row_number window shuffled an n×k expanded
    * frame every Lloyd iteration, which is the difference between an
    * index build that scans the corpus `iters` times and one that
    * shuffles `iters`×k corpora. (The round-8 intermediate — a typedLit
    * array-of-structs scored by interpreted HOF lambdas — was already
    * row-local but plan-embedded: at large k the literal rides every
    * stage's task binary and the lambdas evaluate interpretively per
    * (row, cell). The broadcast expression keeps the zero-shuffle plan
    * and drops both costs; `ann.index_build_k4096` prices the large-k
    * regime each round.)
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
    graft.functions.NearestCell.nearestCellCol(
      e, cents.map { case (id, v) => (id, v.toArray, 0.0) },
      cosine = false, col("e"), lit(0.0)) { nearest =>
      e.select(col("vec_id"), col("e"), nearest.as("cell_id"))
        .filter(col("cell_id") =!= -1) // degenerate rows: see scaladoc
    }
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
