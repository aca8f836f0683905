package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted sampling — the mixture-curation primitives the rate-based
  * samplers ([[TextAnalysis.stratifiedSample]] Bernoulli-per-doc,
  * [[TextAnalysis.mixtureSample]] per-source rates) cannot express:
  * exact-k selection and selection probability proportional to token
  * MASS, the unit training budgets are written in.
  *
  *  - [[prioritySample]]: Efraimidis–Spirakis weighted reservoir
  *    (Inf. Proc. Letters 97(5), 2006) — per doc a priority
  *    key = u^(1/w) with u hash-uniform; the k largest keys per source
  *    are a weighted-without-replacement sample. One narrow projection
  *    + a per-source top-k.
  *  - [[systematicSample]]: systematic (every step-th token) selection
  *    over the per-source cumulative token axis — INTEGER-exact, zero
  *    float anywhere: a doc is picked iff its token interval contains
  *    a multiple of step = ⌈total/k⌉. Guarantees any doc with
  *    w ≥ step is picked (mass can't be skipped) and successive picks
  *    are exactly one stride apart in token space.
  *
  * Determinism: u is the md5-48-bit uniform ([[Sketches.kmvHash]] of
  * doc_id), so both samplers are pure functions of the corpus.
  * prioritySample orders by ln(u)/w (monotone in u^(1/w)); only the
  * ORDER crosses engines — every emitted column is integral — so the
  * oracle risk surface is a boundary tie between two keys within one
  * ulp, vanishingly unlikely and identical to the q_bigram_lm log2
  * precedent. */
object Sampling {

  /** Whitespace token count of `text` — the sampling weight
    * ([[TextTokens.count]], the repo-wide definition). */
  private def tokenWeight: Column = TextTokens.count

  /** Efraimidis–Spirakis: top-`k` docs per source by u^(1/w). Docs with
    * zero weight are never sampled (they carry no budget mass).
    * Output: (source, doc_id, n_tok, rank) — integral columns only.
    *
    * Scale shape: the key is a row-local projection; the per-source
    * top-k is a rank window whose partition is the source (bounded
    * group count) — at extreme per-source cardinality swap the window
    * for a per-source TopK aggregator; the emitted sample is k rows
    * per source either way. */
  def prioritySample(documents: DataFrame, k: Int): DataFrame = {
    val u = (Sketches.kmvHash(col("doc_id").cast("string")) + lit(1L))
      .cast("double") / lit(281474976710657.0) // (h+1)/(2^48+1) ∈ (0,1]
    val keyed = documents
      .select(col("source"), col("doc_id"), tokenWeight.as("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("es_key", log(u) / col("n_tok")) // monotone in u^(1/w)
    val w = Window.partitionBy("source")
      .orderBy(col("es_key").desc, col("doc_id"))
    keyed.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("source"), col("doc_id"), col("n_tok"),
        col("rank").cast("long").as("rank"))
  }

  /** Systematic token-budget sampling: per source, lay docs on the
    * cumulative token axis (doc_id order) and pick every doc whose
    * interval [start, start+w) contains a multiple of
    * step = ⌈source_total/k⌉ (so ≤ k picks). All-integer arithmetic.
    * Output: (source, doc_id, n_tok, start_tok).
    *
    * Scale shape: one per-source cumsum window (the
    * [[Packing.packChunks]] discipline; at extreme group sizes the
    * cumsum rides [[Packing.globalRowNumber]]'s range-partition +
    * prefix-offset enumeration instead). */
  def systematicSample(documents: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = documents
      .select(col("source"), col("doc_id"), tokenWeight.as("n_tok"))
      .withColumn("end_tok", sum("n_tok").over(w))
      .withColumn("start_tok", col("end_tok") - col("n_tok"))
    val totals = cum.groupBy("source")
      .agg(max("end_tok").as("total"))
      .withColumn("step", greatest(lit(1L),
        floor((col("total") + lit(k.toLong) - lit(1L)) / lit(k.toLong))))
    cum.join(broadcast(totals), "source")
      .filter(floor(col("start_tok") / col("step"))
        < floor(col("end_tok") / col("step")))
      .select("source", "doc_id", "n_tok", "start_tok")
  }
}
