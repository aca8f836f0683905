package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The corpus data card — the one-page profile a dataset ships with
  * (the "dataset card" convention): corpus size, composition, dup
  * rate, token statistics and the sketch-estimated cardinality, as a
  * uniform (metric, value) frame a release pipeline writes next to
  * the shards. Complements [[TrainingSet.compose]] (the data) with
  * the report ABOUT the data; the reference's notebooks print these
  * numbers ad hoc (counts, per-source shares) — here they are one
  * operator with one oracle.
  *
  * Determinism discipline: every metric is integer-derived (counts,
  * sums of longs) with at most ONE final double division, rounded —
  * no float accumulations anywhere, so the card is bitwise
  * reproducible (the corpus-ratio form of the per-doc means: e.g.
  * stop_ratio is corpus stop tokens / corpus tokens, not an
  * order-dependent average of per-doc ratios). distinct_token_est is
  * the KMV sketch beside the exact count — the pair IS the sketch's
  * accuracy line in the shipped report.
  *
  * Scale shape: one narrow pass derives per-doc counters; everything
  * aggregates map-side to single rows except the token frame (one
  * content-keyed shuffle for distinct/top-token, the KMV fold beside
  * it) — and the exact distinct column is the one you drop at 100 TB,
  * which is why its estimate ships in the same card. */
object DataCard {

  def build(documents: DataFrame, stopwords: Seq[String] = Seq("the", "a")): DataFrame = {
    val spark = documents.sparkSession
    val toks = filter(split(lower(coalesce(col("text"), lit(""))), " "),
      t => t =!= "")
    val perDoc = documents.select(
      col("doc_id"), col("source"), col("lang"),
      coalesce(col("n_chars"), lit(0L)).as("n_chars"),
      size(toks).cast("long").as("n_tok"),
      size(filter(toks, t => t.isin(stopwords.map(lit): _*)))
        .cast("long").as("n_stop"),
      md5(lower(coalesce(col("text"), lit(""))).cast("binary")).as("tkey"))
      .localCheckpoint()

    val base = perDoc.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("source")).as("n_sources"),
      countDistinct(col("lang")).as("n_langs"),
      sum("n_tok").as("total_tokens"),
      sum("n_chars").as("total_chars"),
      sum(when(col("n_tok") === 0, 1L).otherwise(0L)).as("empty_docs"),
      countDistinct(col("tkey")).as("distinct_texts"),
      sum("n_stop").as("total_stop"))

    val tokFrame = documents.select(explode(toks).as("tok"))
    // top-token count and distinct count come out of ONE aggregate over
    // the (tok, cnt) frame — the card only reports the top COUNT, so no
    // orderBy/limit branch is needed and the token explode+groupBy runs
    // once for both metrics (the KMV estimate is the second, sketch-side
    // pass over the raw token frame)
    val tokAgg = tokFrame.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .agg(max("cnt").as("top_tok_cnt"),
        count(lit(1)).as("distinct_tokens"))
    val distinctEst = Sketches.kmvCardinality(tokFrame, k = 256)
    val maxSource = perDoc.groupBy("source").agg(count(lit(1)).as("sd"))
      .agg(max("sd").as("max_source_docs"))

    val wide = base.crossJoin(tokAgg)
      .crossJoin(distinctEst).crossJoin(maxSource)

    // ONE evaluation of the 1-row wide frame, exploded to the 13 card
    // rows — the first draft union'd 13 single-row selects of `wide`,
    // which replicated the whole aggregate subtree (including three
    // separate token explode+groupBy passes) once per row in the plan:
    // the suite's slowest query for no semantic reason (r11 audit).
    def row(name: String, c: org.apache.spark.sql.Column) =
      struct(lit(name).as("metric"), round(c.cast("double"), 4).as("value"))

    wide.select(explode(array(
        row("n_docs", col("n_docs")),
        row("n_sources", col("n_sources")),
        row("n_langs", col("n_langs")),
        row("total_tokens", col("total_tokens")),
        row("total_chars", col("total_chars")),
        row("empty_docs", col("empty_docs")),
        row("exact_dup_docs", col("n_docs") - col("distinct_texts")),
        row("distinct_tokens", col("distinct_tokens")),
        row("distinct_token_est", col("d_est")),
        row("mean_doc_tokens",
          col("total_tokens").cast("double") / col("n_docs")),
        row("stop_ratio",
          col("total_stop").cast("double") / col("total_tokens")),
        row("top_token_share",
          col("top_tok_cnt").cast("double") / col("total_tokens")),
        row("max_source_share",
          col("max_source_docs").cast("double") / col("n_docs"))))
        .as("r"))
      .select(col("r.metric").as("metric"), col("r.value").as("value"))
  }

  /** [[build]] plus the quality-funnel drop table folded in as card
    * rows — `funnel_<rule>_dropped` per rule and `funnel_survivors`
    * for the pass row — so the shipped one-pager answers "how many
    * docs would each gate drop" next to what the corpus IS. Same
    * (metric, value) contract, same integer-derived determinism
    * ([[Funnel.funnel]]'s counts reconcile exactly by construction). */
  def buildWithFunnel(
      documents: DataFrame,
      stopwords: Seq[String] = Funnel.DefaultStopwords): DataFrame = {
    // stopwords reach BOTH the card's stop_ratio row (build) and the
    // funnel's stop-gate rows — a custom list must not leave the two
    // halves of the one-pager disagreeing on what a stop token is
    val f = Funnel.funnel(documents, stopwords = stopwords)
      .select(
        when(col("rule") === "pass", lit("funnel_survivors"))
          .otherwise(concat(lit("funnel_"), col("rule"), lit("_dropped")))
          .as("metric"),
        round(when(col("rule") === "pass", col("n_remaining"))
          .otherwise(col("n_dropped")).cast("double"), 4).as("value"))
    build(documents, stopwords).unionByName(f)
  }
}
