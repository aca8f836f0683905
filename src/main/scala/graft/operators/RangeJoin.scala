package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join — point-in-interval joins that stay hash joins.
  *
  * Spark plans a plain `fact.value >= iv.lo && fact.value < iv.hi` join
  * as a broadcast nested-loop join: every fact row tests EVERY interval.
  * Fine for a 3-row bracket dim (see q_range_join), catastrophic for a
  * large interval table — O(|facts| × |intervals|) comparisons with no
  * shuffle key to parallelize over.
  *
  * The classic fix (Databricks' range-join hint, DuckDB/Postgres
  * interval binning): pick a bin width `w`, assign each fact to bin
  * `floor(value / w)`, explode each interval into the bins it overlaps,
  * and equi-join on the bin with the range predicate kept as a residual
  * filter. Each fact lands in exactly ONE bin so no dedup is needed; the
  * interval side grows by (interval span / w) rows — choose `w` near the
  * median interval span so the blowup is a small constant. The plan
  * becomes a broadcast/sort-merge HASH join on `bin`: shuffleable,
  * AQE-skew-splittable, and linear in inputs — the 100 TB formulation.
  */
object RangeJoin {

  /** Join `facts` to `intervals` on `lo <= facts(valueCol) < hi`.
    *
    * @param intervals must carry numeric `lo` (inclusive) and `hi`
    *                  (exclusive) columns; spans must be finite — clamp
    *                  open-ended brackets to the domain edge first.
    * @param binWidth  bin size in value units; intervals explode into
    *                  `ceil(span / binWidth)` bucket rows each.
    */
  def pointInInterval(
      facts: DataFrame,
      valueCol: String,
      intervals: DataFrame,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val w = lit(binWidth)
    // Explode through floor(hi/w) unconditionally. When `hi` lands
    // exactly on a bin edge that last bin holds no true matches (hi is
    // exclusive), but its rows are only false-positive CANDIDATES the
    // residual range filter below removes — so correctness never depends
    // on floating-point boundary detection. (A pmod(hi,w)==0 decrement
    // would be wrong the other way: fp rounding can make pmod miss a
    // mathematically-zero remainder, or bin a fact value v < hi into the
    // decremented-away bin — a silent false NEGATIVE nothing recovers.)
    val loBin = floor(col("lo") / w).cast("long")
    val hiBin = floor(col("hi") / w).cast("long")
    val binned = intervals.withColumn(
      "bin", explode(sequence(loBin, greatest(hiBin, loBin))))
    facts
      .withColumn("bin", floor(col(valueCol) / w).cast("long"))
      .join(binned,
        Seq("bin"))
      .filter(col(valueCol) >= col("lo") && col(valueCol) < col("hi"))
      .drop("bin")
  }

  /** Convenience: non-equi join predicate form for callers that want the
    * residual comparison on separate columns (lo inclusive, hi
    * exclusive) without positional assumptions. */
  def brackets(
      facts: DataFrame,
      valueCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Double): DataFrame =
    pointInInterval(
      facts,
      valueCol,
      intervals.withColumnRenamed(loCol, "lo").withColumnRenamed(hiCol, "hi"),
      binWidth)
}
