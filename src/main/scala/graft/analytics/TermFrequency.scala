package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The term-frequency analytics family — the reference's flagship queries.
  *
  * Reference semantics: `count_freq_by_year` (001_….ipynb:743-757 [cell 15]),
  * `count_freq_skill_by_year` (ipynb:927-957 [cell 27]) and
  * `visualization_stat` (ipynb:764-778 [cell 16]) run a per-year pandas loop:
  * fillna('') → str.split → chain.from_iterable → Counter → sorted desc →
  * pd.concat(axis=1) → percent-of-total → top-N.
  *
  * Spark-first redesign: ONE declarative pipeline over all partitions at
  * once. tokenize+count collapse into a single hash aggregate (one shuffle,
  * map-side partial aggregation); the pct and rank windows reuse the same
  * hash partitioning on the group column, so the whole family costs two
  * shuffles regardless of data size — at 100 TB the per-year rescan loop
  * would be 15 full scans, this is one.
  */
object TermFrequency {

  /** fillna('') + split + flatten (ipynb:749-750). Empty tokens dropped. */
  def tokenize(df: DataFrame, textCol: String, sep: String, keep: Seq[String]): DataFrame =
    df.select((keep.map(col) :+
        explode(split(coalesce(col(textCol), lit("")), sep)).as("token")): _*)
      .filter(col("token") =!= "")

  /** Counter per group (ipynb:751): hash aggregate, partial+final automatic. */
  def counts(tokens: DataFrame, groupCols: Seq[String]): DataFrame =
    tokens.groupBy((groupCols :+ "token").map(col): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Ratio-to-report: share of each token within its group
    * (ipynb:772-774 — `df / (total/100)`), as an aggregate window that
    * reuses the groupBy partitioning (no extra shuffle under AQE). */
  def withPct(counted: DataFrame, groupCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
    counted.withColumn("pct", round(col("cnt") * 100.0 / sum("cnt").over(w), 4))
  }

  /** Per-group top-k (ipynb:777 `df_per[:N]`), deterministic: ties broken
    * by token. row_number beats global sort+slice — no single-node sort. */
  def topK(counted: DataFrame, groupCols: Seq[String], k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("cnt").desc, col("token"))
    counted.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** The pd.concat(axis=1) year alignment (ipynb:801) as a pivot — an
    * n-way full-outer join collapsed into one aggregate. Pivot values are
    * passed explicitly so no extra distinct-collect job runs. */
  def pivotCounts(counted: DataFrame, pivotCol: String, values: Seq[String]): DataFrame =
    counted.groupBy("token").pivot(pivotCol, values).sum("cnt")
}
