package graft.extensions

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** labelStar (large-star/small-star) must agree with min-label
  * propagation everywhere, and beat it on iteration count for deep
  * graphs — that is its reason to exist. */
class ConnectedComponentsStarSpec extends SparkSpec {
  import spark.implicits._

  private def nodes(ids: Seq[Long]): DataFrame = ids.toDF("id")
  private def edges(ps: Seq[(Long, Long)]): DataFrame = ps.toDF("a", "b")

  private def byId(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("agrees with min-label propagation on a mixed graph") {
    val n = nodes(1L to 12L)
    // two components + a triangle + singletons 11, 12
    val e = edges(Seq((1L, 2L), (2L, 3L), (5L, 4L), (6L, 5L),
      (8L, 7L), (9L, 8L), (7L, 9L), (10L, 9L)))
    assert(byId(ConnectedComponents.labelStar(n, e)) ==
      byId(ConnectedComponents.label(n, e)))
  }

  test("deep chain: correct labels in far fewer rounds than the diameter") {
    val n = nodes(0L to 40L)
    val chain = edges((0L until 40L).map(i => (i, i + 1)))
    val (lbl, iters) = ConnectedComponents.labelStarWithIters(n, chain, 30)
    val m = byId(lbl)
    assert(m.values.toSet == Set(0L))        // one component rooted at 0
    assert(iters <= 8, s"took $iters rounds") // O(log n), not 40 hops
    // min-label propagation needs ~diameter rounds on the same chain —
    // the star variant must be an order faster in rounds
    assert(iters < 40)
  }

  test("handles duplicate, reversed and self edges") {
    val n = nodes(Seq(1L, 2L, 3L))
    val e = edges(Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (2L, 3L)))
    assert(byId(ConnectedComponents.labelStar(n, e)) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("empty edge set: every node is its own component") {
    val n = nodes(Seq(5L, 9L))
    val e = edges(Seq.empty)
    assert(byId(ConnectedComponents.labelStar(n, e)) ==
      Map(5L -> 5L, 9L -> 9L))
  }
}
