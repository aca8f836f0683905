package graft.extensions

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the correct
  * clustering of a near-dup pair graph (greedy drop-the-b keeps the
  * lowest id per CHAIN only transitively; components make that exact).
  *
  * Each iteration: every node takes the min label among itself and its
  * neighbors — one join + one aggregate, materialized by ONE job.
  *
  * Per-iteration cost control (each of these measurably mattered):
  *  - `localCheckpoint()` (not `cache()`) on edges and on every label
  *    generation: truncates lineage, so iteration k plans a constant-size
  *    plan instead of re-analyzing k generations of joins (plan growth —
  *    not data — dominated the cached formulation's wall time).
  *  - The convergence probe rides the SAME job via `Dataset.observe`:
  *    comp values only ever decrease under min-propagation, so
  *    sum(comp) is stationary exactly at the fixpoint — no separate
  *    convergence job. (A non-blocking fallback aggregate guards the
  *    rare case where the observed metric hasn't been delivered by the
  *    listener yet; it scans already-materialized blocks.)
  *  - Only this one scalar crosses the driver per iteration.
  *
  * Iteration count is bounded by the component diameter (near-dup
  * clusters are shallow); for web-scale graphs the same loop hosts the
  * large-star/small-star optimization — the per-iteration dataflow shape
  * is identical. Old label generations are dropped by reference so the
  * ContextCleaner reclaims their blocks. */
object ConnectedComponents {

  /** Sum of the observed metric if delivered, else a direct aggregate
    * over the (already materialized) frame. Empty frame ⇒ 0. */
  private def convergenceSum(obs: Observation, materialized: DataFrame): Long =
    try {
      // the listener delivering observed metrics is async wrt job
      // completion; wait briefly, then fall back to a cheap block scan
      val row = scala.concurrent.Await.result(
        obs.future, scala.concurrent.duration.Duration(2, "s"))
      row.getAs[Long]("s")
    } catch {
      case _: java.util.concurrent.TimeoutException =>
        materialized.agg(coalesce(sum("comp"), lit(0L))).head().getLong(0)
    }

  /** @param pairs (a, b) undirected edges
    * @param nodes single-column frame of all node ids (isolated nodes
    *              become singleton components)
    * @return (id, comp) where comp = min node id of the component */
  def label(nodes: DataFrame, pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val idCol = nodes.columns.head
    // materialize the symmetric edge set ONCE and cut its lineage:
    // without this every iteration re-plans (and first re-runs) the whole
    // upstream pair computation — e.g. the MinHash pipeline
    val edges = pairs.select(col("a"), col("b"))
      .union(pairs.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    var labels = nodes.select(col(idCol).as("id"), col(idCol).as("comp"))
      .localCheckpoint()
    // coalesce: empty node frame ⇒ sum(comp) is NULL ⇒ 0 (and the first
    // iteration observes 0 again ⇒ immediate convergence)
    var prevSum = labels.agg(coalesce(sum("comp"), lit(0L))).head().getLong(0)
    var it = 0
    var converged = labels.isEmpty
    while (it < maxIters && !converged) {
      val viaNeighbors = labels.join(edges, col("id") === col("a"))
        .select(col("b").as("id"), col("comp"))
      val obs = Observation()
      val next = labels.select("id", "comp").union(viaNeighbors)
        .groupBy("id").agg(min("comp").as("comp"))
        .observe(obs, coalesce(sum("comp"), lit(0L)).as("s"))
        .localCheckpoint() // eager: the one job of this iteration
      val sumNow = convergenceSum(obs, next)
      labels = next
      converged = sumNow == prevSum
      prevSum = sumNow
      it += 1
    }
    labels
  }
}
