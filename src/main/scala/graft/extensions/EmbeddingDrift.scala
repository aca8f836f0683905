package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cell-distribution drift for the EMBEDDING leg — the
  * [[TextAnalysis.sourceDrift]] sibling at the representation level:
  * the corpus' fitted-cell histogram is the baseline, and an arriving
  * batch whose vectors land in different cells (a topic shift, an
  * encoder change, a broken upstream embedder) raises the
  * Jensen-Shannon number within one batch — BEFORE any text-level
  * signal, because the cells partition the representation space the
  * models actually consume.
  *
  * Same determinism discipline as the text JS (q_src_drift): the grid
  * is folded in sorted-cell order with guarded divisions (zero totals
  * yield exact 0 terms, never ANSI 0/0), so the score is
  * engine-reproducible (q_emb_drift's DuckDB oracle). Scale shape: the
  * baseline is one bounded aggregation (|cells| rows); scoring a batch
  * is one bounded aggregation over its cell counts full-outer-joined
  * to the profile — cells NOVEL to a stale profile still score (their
  * q = 0 mass contributes p·ln 2 terms) instead of silently dropping. */
object EmbeddingDrift {

  /** The (cell, corpus_cnt) baseline histogram of an assignment frame
    * (any frame with a `cell` column — [[KMeans.assign]] output cast,
    * or the testdata's pre-clustered label). Bounded by |cells|. */
  def cellProfile(assigned: DataFrame): DataFrame =
    assigned.groupBy("cell").agg(count(lit(1)).as("corpus_cnt"))

  /** One-row drift summary of a batch's cell histogram vs the
    * baseline: (n_cells_hit, n_vecs, js_div). JS is bounded by
    * ln 2 ≈ 0.693; identical distributions score 0. */
  def driftVsProfile(assignedBatch: DataFrame, profile: DataFrame): DataFrame = {
    val bc = assignedBatch.groupBy("cell").agg(count(lit(1)).as("batch_cnt"))
    val grid = profile.select(col("cell"), col("corpus_cnt"))
      .join(bc, Seq("cell"), "full_outer")
      .withColumn("batch_cnt", coalesce(col("batch_cnt"), lit(0L)))
      .withColumn("corpus_cnt", coalesce(col("corpus_cnt"), lit(0L)))
    val per = grid.agg(
      sum("batch_cnt").as("batch_total"),
      sum(when(col("batch_cnt") > 0, 1L).otherwise(0L)).as("n_cells_hit"),
      sum("corpus_cnt").as("corpus_total"),
      array_sort(collect_list(struct(col("cell"), col("batch_cnt"),
        col("corpus_cnt")))).as("terms"))
    // coalesce: a fully-empty grid (empty profile AND empty batch)
    // aggregates to NULL sums — the summary row must stay readable
    // (0, 0, 0.0), not NPE its consumer
    per.select(coalesce(col("n_cells_hit"), lit(0L)).as("n_cells_hit"),
      coalesce(col("batch_total"), lit(0L)).as("n_vecs"),
      round(aggregate(col("terms"), lit(0.0), (acc, t) => {
        val p = t.getField("batch_cnt") * lit(1.0) /
          greatest(col("batch_total"), lit(1L))
        val q = t.getField("corpus_cnt") * lit(1.0) /
          greatest(col("corpus_total"), lit(1L))
        val m = (p + q) / lit(2.0)
        acc + (when(t.getField("batch_cnt") > 0, lit(0.5) * p * log(p / m))
            .otherwise(lit(0.0))
          + when(t.getField("corpus_cnt") > 0, lit(0.5) * q * log(q / m))
            .otherwise(lit(0.0)))
      }) + lit(0.0), 4).as("js_div"))
  }
}
