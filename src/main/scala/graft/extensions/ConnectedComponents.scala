package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the correct
  * clustering of a near-dup pair graph (greedy drop-the-b keeps the
  * lowest id per CHAIN only transitively; components make that exact).
  *
  * Each iteration: every node takes the min label among itself and its
  * neighbors — one join + one aggregate. The driver loop runs until a
  * fixpoint; per iteration only a single changed-count scalar crosses
  * the driver. Iteration count is bounded by the component diameter
  * (near-dup clusters are shallow); for web-scale graphs the same loop
  * hosts the large-star/small-star optimization — the per-iteration
  * dataflow shape is identical.
  *
  * Labels are cached per iteration and the previous generation is
  * unpersisted, so lineage does not grow with iterations. */
object ConnectedComponents {

  /** @param pairs (a, b) undirected edges
    * @param nodes single-column frame of all node ids (isolated nodes
    *              become singleton components)
    * @return (id, comp) where comp = min node id of the component */
  def label(nodes: DataFrame, pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val idCol = nodes.columns.head
    // cache the symmetric edge set: without this, every iteration (and
    // the per-iteration convergence count) re-runs the upstream pair
    // computation — e.g. the whole MinHash pipeline
    val edges = pairs.select(col("a"), col("b"))
      .union(pairs.select(col("b").as("a"), col("a").as("b")))
      .cache()
    var labels = nodes.select(col(idCol).as("id"), col(idCol).as("comp")).cache()
    // Convergence probe: comp values only ever DECREASE under min
    // propagation, so sum(comp) strictly decreases until the fixpoint —
    // one scalar aggregate per iteration instead of a join-and-compare.
    var prevSum = labels.agg(sum("comp")).head().getLong(0)
    var it = 0
    var converged = false
    while (it < maxIters && !converged) {
      val viaNeighbors = labels.join(edges, col("id") === col("a"))
        .select(col("b").as("id"), col("comp"))
      val next = labels.select("id", "comp").union(viaNeighbors)
        .groupBy("id").agg(min("comp").as("comp"))
        .cache()
      val sumNow = next.agg(sum("comp")).head().getLong(0)
      labels.unpersist()
      labels = next
      converged = sumNow == prevSum
      prevSum = sumNow
      it += 1
    }
    labels
  }
}
