package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[Layout.zInterleave]] (bit-exact parity with a driver-side
  * Morton reference over the full corner set + a random sweep) and the
  * [[Layout.writeZOrdered]] skipping claim: on an uncorrelated 2-D grid
  * the A-sorted layout's row groups span the FULL B range (no skipping
  * on B) while the z-ordered layout's groups bound both dimensions. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: interleave bit i of a to 2i, b to 2i+1. */
  private def mortonRef(a: Long, b: Long, bits: Int = 16): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zInterleave ≡ driver-side Morton reference (corners + 500 random pairs)") {
    val corners = Seq(
      (0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L),
      (1L, 0L), (0L, 1L), (3L, 5L), (43690L, 21845L))
    val rnd = new scala.util.Random(7)
    val pairs = corners ++ Seq.fill(500)(
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zInterleave(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) == mortonRef(a, b), s"z($a,$b)")
    }
  }

  test("zInterleave masks inputs to the bit budget") {
    val z = spark.range(1)
      .select(Layout.zInterleave(lit(65536L + 3L), lit(5L)).as("z"))
      .head().getLong(0)
    assert(z == mortonRef(3L, 5L)) // the 2^16 bit is dropped, not smeared
  }

  test("z-ordered layout bounds BOTH dimensions; linear sort leaves the second unbounded") {
    // uncorrelated grid: a = id % 200, b = id / 200 — sorting by a makes
    // every run of equal a span the entire b range
    val n = 40000L
    val pad = lit("x" * 64)
    val grid = spark.range(n).select(
      (col("id") % 200).as("a"), (col("id") / 200).as("b"),
      concat(pad, col("id")).as("pad"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    Layout.writeSorted(grid, s"$tmp/lin", "a", rowGroupBytes = 64 * 1024, files = 2)
    Layout.writeZOrdered(grid, s"$tmp/z", "a", "b",
      rowGroupBytes = 64 * 1024, files = 2)
    val probeA = 100L
    val probeB = 100L
    val (linTot, linHitA) = Layout.rowGroupStats(spark, s"$tmp/lin", "a", probeA)
    val (_, linHitB) = Layout.rowGroupStats(spark, s"$tmp/lin", "b", probeB)
    val (zTot, zHitA) = Layout.rowGroupStats(spark, s"$tmp/z", "a", probeA)
    val (_, zHitB) = Layout.rowGroupStats(spark, s"$tmp/z", "b", probeB)
    assert(linTot >= 4 && zTot >= 4, s"need multiple row groups: $linTot/$zTot")
    // the linear layout skips on its sort key but not on b
    assert(linHitA < linTot, s"lin a: $linHitA/$linTot")
    assert(linHitB == linTot, s"lin b should be unbounded: $linHitB/$linTot")
    // the z layout skips on BOTH
    assert(zHitA < zTot, s"z a: $zHitA/$zTot")
    assert(zHitB < zTot, s"z b: $zHitB/$zTot")
  }
}
