package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Source-mixture rebalancing — the data-mixing step of a training-
  * data pipeline: given per-source integer weights (the target token
  * mixture), compute how many tokens each source contributes to the
  * largest corpus servable WITHOUT upsampling, then materialize that
  * corpus with a seeded, deterministic per-source selection.
  *
  * All arithmetic is integer (div = floor for the all-positive
  * operands here) and selection order is md5(seed ":" doc_id) — the
  * [[Packing.epochShuffle]] discipline — so a retried task, a re-run,
  * or an independent engine (the DuckDB oracle) reproduces the exact
  * same corpus. No floats cross engines, no RNG crosses attempts.
  *
  * Relation to [[TextAnalysis.mixtureSample]] (the RATE-based member
  * of this family): that op downsamples over-represented sources to a
  * per-source admission rate — expectation semantics, corpus size
  * falls where it falls. This op answers the budget questions the
  * rate filter cannot: what is the LARGEST corpus the target mixture
  * supports with no upsampling, exactly which tokens fill it, and
  * what repeat-epochs bill a larger budget incurs — with EXACT
  * per-source adherence (overshoot < one document), the contract a
  * token-budgeted pretraining run is planned against.
  *
  * Scale shape: one narrow groupBy(source) over the corpus for the
  * plan; the sample is one per-source window over (md5 key, doc_id) —
  * the [[Sampling.systematicSample]] cumsum discipline — with the
  * bounded plan frame broadcast back. Nothing driver-side: the budget
  * is a 1-row agg cross-joined as a broadcast, like every other
  * bounded summary in this repo. Overflow headroom: products are
  * bounded by Σweights · max-source-tokens, so Σweights ≤
  * Long.MaxValue / corpus-tokens — ~9·10⁵ at 10¹³ tokens (100 TB).
  */
object Mixture {

  /** Whitespace token count — [[TextTokens.count]], the repo-wide
    * definition shared with every oracle twin. */
  private def nTok: Column = TextTokens.count

  /** The mixture plan: one row per POSITIVE-weight source (weights
    * frame: `(source, weight)`; non-positive weights are excluded),
    *
    *  - `tokens_total` — what the source holds (0 when the weighted
    *    source is absent from the corpus or all-empty);
    *  - `budget` — the largest total token budget B such that every
    *    positive-weight source can serve its share `w_s·B/W` from what
    *    it holds: B = min_s ⌊tokens_total_s · W / w_s⌋. STRICT: a
    *    weighted source with zero tokens binds B to 0 — the plan says
    *    loudly that the target mixture is unservable, rather than
    *    silently emitting a corpus that misses a target share (its
    *    row is present with tokens_total = 0, so the culprit is
    *    visible in the output);
    *  - `keep_tokens` — this source's share ⌊w_s·B/W⌋ of that budget;
    *  - `epochs_at_2x` — passes over the source needed if the caller
    *    insists on a 2B-token corpus instead (the upsampling price):
    *    ⌈⌊w_s·2B/W⌋ / tokens_total⌉; 0 for an empty source (its share
    *    of the then-zero budget is zero tokens).
    */
  def plan(documents: DataFrame, weights: DataFrame): DataFrame =
    planFromTotals(totalsOf(documents), weights)

  /** The bounded per-source state the plan derives from — one
    * `(source, tokens_total)` row per source. This is the MERGEABLE
    * state of the streaming twin ([[graft.streaming.StreamingMixture]]):
    * totals of a batch decomposition fold back to the one-shot totals
    * via [[mergeTotals]] (sums — exact, order-free). */
  def totalsOf(documents: DataFrame): DataFrame =
    documents.select(col("source"), nTok.as("n_tok"))
      .groupBy("source").agg(sum(col("n_tok")).as("tokens_total"))

  /** DEDUP-ADJUSTED totals: per source, the effective token mass
    * Σ (1/|near-dup component|)·n_tok, floored to whole tokens — what
    * [[totalsOf]] should feed the plan when duplicated sources must not
    * buy mixture share with copies ([[Dedup.softDedupMass]]'s
    * discipline applied at token granularity). Per-doc contributions
    * are 6-decimal-rounded and DECIMAL-summed (order-independent);
    * `planFromTotals(effectiveTotalsOf(docs), w)` is then the
    * dedup-aware mixture plan with unchanged arithmetic. */
  def effectiveTotalsOf(documents: DataFrame): DataFrame =
    documents.select(col("source"), col("doc_id"), nTok.as("n_tok"))
      .join(Dedup.softDedupWeights(documents)
        .select(col("doc_id"), col("weight")), "doc_id")
      .select(col("source"),
        round(col("weight") * col("n_tok"), 6)
          .cast("decimal(28,6)").as("eff"))
      .groupBy("source")
      .agg(floor(sum("eff")).cast("long").as("tokens_total"))

  /** Fold two totals states: union + re-sum. NOT idempotent (sums) —
    * a streaming caller persists merged state keyed by batch id,
    * overwrite-by-id, the [[graft.streaming.StreamingSketch]]
    * discipline. */
  def mergeTotals(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("source")
      .agg(sum(col("tokens_total")).as("tokens_total"))

  /** [[plan]] from a precomputed totals state — what the streaming
    * twin calls per batch, paying O(state), never a corpus re-read. */
  def planFromTotals(totalsState: DataFrame, weights: DataFrame): DataFrame = {
    // BOTH intermediate frames are bounded (one row per source), and
    // both feed multiple consumers (w_sum + the join; budget + the
    // output; the sample's keep join) — freeze each once so a derived
    // weights frame and the corpus scan are paid once, not once per
    // consumer (the q_postings_compact re-derivation lesson)
    val wPos = weights.filter(col("weight") > 0).localCheckpoint()
    // weights DRIVE the join (left): a weighted source missing from the
    // corpus stays in the plan at tokens_total = 0 and binds the budget
    // to 0 — dropping it here would silently re-plan a different
    // mixture than the caller asked for
    val totals = wPos
      .join(broadcast(totalsState), Seq("source"), "left")
      .withColumn("tokens_total", coalesce(col("tokens_total"), lit(0L)))
      .crossJoin(broadcast(wPos.agg(sum(col("weight")).as("w_sum"))))
      .localCheckpoint()
    val budget = totals
      .agg(min(expr("(tokens_total * w_sum) div weight")).as("budget"))
    totals.crossJoin(broadcast(budget))
      .withColumn("keep_tokens", expr("(weight * budget) div w_sum"))
      .withColumn("epochs_at_2x",
        when(col("tokens_total") === 0L, lit(0L)).otherwise(
          expr("""((weight * budget * 2) div w_sum + tokens_total - 1)
                  div tokens_total""")))
      .select("source", "tokens_total", "weight", "budget", "keep_tokens",
        "epochs_at_2x")
  }

  /** Materialize the planned mixture: per source, take docs in
    * md5(seed ":" doc_id) order (doc_id tiebreak) while the tokens
    * taken so far are below `keep_tokens` — exact budget adherence (the
    * last doc may overshoot by < 1 doc), not Bernoulli expectation.
    * Emits `(source, doc_id, n_tok)`. */
  def sample(documents: DataFrame, weights: DataFrame, seed: Long): DataFrame = {
    val keeps = plan(documents, weights).select("source", "keep_tokens")
    val w = Window.partitionBy("source")
      .orderBy(col("_mx_key"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    documents
      .select(col("source"), col("doc_id"), nTok.as("n_tok"),
        md5(concat_ws(":", lit(seed), col("doc_id"))).as("_mx_key"))
      .join(broadcast(keeps), Seq("source"))
      .withColumn("_cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .filter(col("_cum_before") < col("keep_tokens"))
      .select("source", "doc_id", "n_tok")
  }
}
