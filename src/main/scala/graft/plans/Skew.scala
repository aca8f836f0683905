package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY §7.4: "salting strategy documented
  * for skewed area_name/employer_name groupings").
  *
  * Two tools:
  *  1. AQE skew-join splitting — free, enabled in [[GraftSession]]; handles
  *     join-side skew at runtime.
  *  2. Salted two-phase aggregation (below) — for groupBy skew, where one
  *     key (e.g. area_name = "Москва" holding a double-digit percent of a
  *     100 TB table) would pin a single reducer. Phase 1 aggregates
  *     (key, salt) over `parts` random buckets; phase 2 combines the
  *     partials per key. Cost: one extra narrow stage; benefit: the hot
  *     key's work spreads over `parts` reducers. */
object Skew {

  /** Content-derived salt: pmod(xxhash64(whole row), parts). Unlike a
    * position-derived salt (spark_partition_id / monotonically_
    * increasing_id), this is stable under task retries and AQE
    * re-partitioning — the same row always lands in the same salt
    * bucket, so phase-1 partials are deterministic for ANY aggregate,
    * not just associative-commutative ones. Caveat: rows identical in
    * every column share a bucket; for duplicate-heavy hot keys pass a
    * discriminating column set via `saltOn`. */
  private def contentSalt(df: DataFrame, parts: Int, saltOn: Seq[Column]): Column = {
    val cols = if (saltOn.nonEmpty) saltOn else df.columns.toSeq.map(col)
    pmod(xxhash64(cols: _*), lit(parts))
  }

  /** count(*) per key with salting. `parts` bounds the fan-out of the hot
    * key. */
  def saltedCount(
      df: DataFrame, key: Column, parts: Int = 16,
      saltOn: Seq[Column] = Seq.empty): DataFrame =
    df.withColumn("_salt", contentSalt(df, parts, saltOn))
      .groupBy(key.as("key"), col("_salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy("key")
      .agg(sum("partial").as("cnt"))

  /** General salted aggregation for any commutative-associative partial:
    * caller supplies the phase-1 partial aggregate and the phase-2
    * combiner over the partial column. */
  def saltedAgg(
      df: DataFrame, key: Column, parts: Int,
      partial: Column, combine: Column => Column,
      saltOn: Seq[Column] = Seq.empty): DataFrame =
    df.withColumn("_salt", contentSalt(df, parts, saltOn))
      .groupBy(key.as("key"), col("_salt"))
      .agg(partial.as("partial"))
      .groupBy("key")
      .agg(combine(col("partial")).as("agg"))
}
