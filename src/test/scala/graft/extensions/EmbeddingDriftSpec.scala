package graft.extensions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EmbeddingDriftSpec extends SparkSpec {
  import spark.implicits._

  private def profileOf(cells: Seq[Long]) =
    EmbeddingDrift.cellProfile(cells.toDF("cell"))

  private def drift(batch: Seq[Long], corpus: Seq[Long]): (Long, Long, Double) = {
    val r = EmbeddingDrift.driftVsProfile(batch.toDF("cell"), profileOf(corpus))
      .head()
    (r.getLong(0), r.getLong(1), r.getDouble(2))
  }

  test("a batch matching the corpus distribution scores 0; a shifted one scores > 0") {
    val corpus = Seq.fill(30)(0L) ++ Seq.fill(30)(1L) ++ Seq.fill(30)(2L)
    val (hits, n, js) = drift(Seq(0L, 1L, 2L), corpus)
    assert((hits, n) == ((3L, 3L)))
    assert(js == 0.0, s"identical cell shares must score exactly 0, got $js")
    val (_, _, skew) = drift(Seq.fill(10)(0L), corpus) // all mass in one cell
    assert(skew > 0.2, s"collapsed distribution must score high, got $skew")
  }

  test("cells novel to a stale profile still score (q = 0 mass), never silently drop") {
    val (hits, n, js) = drift(Seq(7L, 7L), Seq(0L, 1L)) // cell 7 unknown to baseline
    assert((hits, n) == ((1L, 2L)))
    // p = 1 on a q = 0 cell plus q-mass elsewhere: JS = ln 2 (max)
    assert(math.abs(js - math.log(2)) < 1e-3, s"got $js")
  }

  test("empty batch is well-formed: zero hits, zero vecs, finite score") {
    val (hits, n, js) = drift(Seq.empty, Seq(0L, 1L))
    assert((hits, n) == ((0L, 0L)))
    assert(!js.isNaN && js >= 0.0)
    // the degenerate empty-both case stays readable, never NULL/NPE
    val (h0, n0, js0) = drift(Seq.empty, Seq.empty)
    assert((h0, n0, js0) == ((0L, 0L, 0.0)))
  }
}
