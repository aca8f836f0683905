package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.extensions.{DataSelection, QualityRules, Similarity, SpanCorrupt}

/** Round-18 additions: the published-recipe curation operators the
  * inventory still lacked — the Gopher rule battery with per-rule
  * attribution ([[QualityRules]]), DoReMi-style excess-loss domain
  * weights ([[DataSelection.excessLossWeights]]), ANN hard-negative
  * mining and D4 prototypicality pruning ([[Similarity]]), and T5/UL2
  * span-corruption example generation ([[SpanCorrupt]]). */
object Round18Queries {

  /** Shared oracle fragment: token array + the five Gopher-rule
    * metrics, NULL on an empty array (the Spark side's guarded
    * divisions), consumed by both q_gopher_rules and q_gopher_report. */
  private[queries] val duckGopher =
    """ga AS (SELECT doc_id,
                     list_filter(string_split(lower(coalesce(text, '')), ' '),
                                 t -> t <> '') AS arr
              FROM documents),
       gm AS (SELECT doc_id, len(arr) AS n_tok,
                     CASE WHEN len(arr) > 0 THEN
                       round(list_sum(list_transform(arr, t -> len(t)))
                             * 1.0 / len(arr), 4) END AS mean_len,
                     len(list_filter(arr,
                       t -> t IN ('the', 'a', 'of', 'to', 'and'))) AS n_stop,
                     CASE WHEN len(arr) > 0 THEN
                       round(list_max(list_transform(list_distinct(arr),
                               d -> len(list_filter(arr, x -> x = d))))
                             * 1.0 / len(arr), 4) END AS top_ratio,
                     CASE WHEN len(arr) > 0 THEN
                       round(len(list_distinct(arr)) * 1.0 / len(arr), 4)
                       END AS dis_ratio
              FROM ga),
       gf AS (SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
                     n_tok BETWEEN 10 AND 90 AS r_word_count,
                     coalesce(mean_len >= 2.0 AND mean_len <= 8.0, false)
                       AS r_mean_word_len,
                     n_stop >= 2 AS r_stopword,
                     coalesce(top_ratio <= 0.2, false) AS r_top_token,
                     coalesce(dis_ratio >= 0.3, false) AS r_distinct
              FROM gm),
       gp AS (SELECT *, r_word_count AND r_mean_word_len AND r_stopword
                          AND r_top_token AND r_distinct AS pass
              FROM gf)"""

  /** [[QualityRules.gopherFlags]] — the Gopher heuristic battery as
    * independent named booleans per document. */
  private val gopherRules = Q("q_gopher_rules",
    (s, dir) => QualityRules.gopherFlags(table(s, dir, "documents")),
    Some(s"""WITH $duckGopher
             SELECT doc_id, n_tok, r_word_count, r_mean_word_len,
                    r_stopword, r_top_token, r_distinct, pass
             FROM gp ORDER BY doc_id"""))

  /** [[QualityRules.gopherReport]] — per-rule INDEPENDENT fail counts
    * (threshold-tuning view) plus the survivor row. */
  private val gopherReport = Q("q_gopher_report",
    (s, dir) => QualityRules.gopherReport(table(s, dir, "documents")),
    Some(s"""WITH $duckGopher
             SELECT rule, n_docs FROM (
               SELECT 'r_word_count' AS rule, CAST(sum(CASE WHEN NOT r_word_count
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs FROM gp
               UNION ALL
               SELECT 'r_mean_word_len', CAST(sum(CASE WHEN NOT r_mean_word_len
                 THEN 1 ELSE 0 END) AS BIGINT) FROM gp
               UNION ALL
               SELECT 'r_stopword', CAST(sum(CASE WHEN NOT r_stopword
                 THEN 1 ELSE 0 END) AS BIGINT) FROM gp
               UNION ALL
               SELECT 'r_top_token', CAST(sum(CASE WHEN NOT r_top_token
                 THEN 1 ELSE 0 END) AS BIGINT) FROM gp
               UNION ALL
               SELECT 'r_distinct', CAST(sum(CASE WHEN NOT r_distinct
                 THEN 1 ELSE 0 END) AS BIGINT) FROM gp
               UNION ALL
               SELECT 'pass', CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END)
                 AS BIGINT) FROM gp)
             ORDER BY rule"""))

  /** Shared oracle fragment (used by q_doremi_weights AND
    * q_mixture_doremi — the SharedCteSpec discipline): per-source
    * reference-LM loss, clipped excess over the cross-source mean,
    * and the exp(excess) softmax numerators + denominator. Expects
    * Round15Queries.pplCtes in scope (the `base` CTE). */
  private[queries] val duckDoremi =
    """bs AS (SELECT d2.source, count(*) AS n_docs,
                     CAST(sum(CAST(b.avg_log2_p AS DECIMAL(18,4)))
                          AS DOUBLE) AS ssum,
                     count(b.avg_log2_p) AS n_scored
              FROM documents d2 LEFT JOIN base b USING (doc_id)
              GROUP BY 1),
       ls AS (SELECT source, n_docs,
                     CASE WHEN n_scored > 0
                          THEN round(-ssum / n_scored, 4) END AS loss
              FROM bs),
       bb AS (SELECT CAST(sum(CAST(loss AS DECIMAL(18,4))) AS DOUBLE)
                     / count(loss) AS base_loss FROM ls),
       ex AS (SELECT source, n_docs, loss,
                     coalesce(round(greatest(loss - base_loss, 0), 4),
                              0.0) AS excess
              FROM ls CROSS JOIN bb),
       w0 AS (SELECT *, CAST(round(exp(1.0 * excess), 6)
                             AS DECIMAL(18,6)) AS w0 FROM ex),
       tt AS (SELECT CAST(sum(w0) AS DOUBLE) AS wsum,
                     count(*) AS k FROM w0)"""

  /** [[DataSelection.excessLossWeights]] — per-source excess loss over
    * the cross-source mean under the reference LM, softmaxed into the
    * smoothed DoReMi mixture weights. Reuses the ppl oracle CTE chain
    * verbatim (Round15Queries.pplCtes — the SharedCteSpec discipline). */
  private val doremiWeights = Q("q_doremi_weights",
    (s, dir) => DataSelection.excessLossWeights(table(s, dir, "documents")),
    Some(s"""WITH ${Round15Queries.pplCtes},
                 $duckDoremi
            SELECT source, n_docs, loss, excess,
                   round(0.9 * CAST(w0 AS DOUBLE) / wsum + 0.1 / k, 6)
                     AS weight
            FROM w0 CROSS JOIN tt ORDER BY source"""))

  /** The excess-loss channel fed END-TO-END into mixture planning —
    * the channel symmetry q_mixture_soft set up: raw token mass
    * (q_mixture_plan), dedup-adjusted mass (q_mixture_soft), and now
    * learnability-weighted shares ([[DataSelection.excessLossWeights]]
    * → [[graft.extensions.Mixture.plan]]). Weights enter the plan as
    * integer PPM (round(weight·10⁶) — the plan's exact int64
    * arithmetic requires integral weights; at ≥10¹³-token corpora use
    * per-mille instead, since tokens_total·Σweights must stay inside
    * int64 — the Mixture scaladoc's headroom rule). */
  private val mixtureDoremi = Q("q_mixture_doremi",
    (s, dir) => {
      val docs = table(s, dir, "documents")
      val w = DataSelection.excessLossWeights(docs)
        .select(col("source"),
          round(col("weight") * lit(1000000L)).cast("long").as("weight"))
      graft.extensions.Mixture.plan(docs, w)
    },
    Some(s"""WITH ${Round15Queries.pplCtes},
                 $duckDoremi,
                 wts AS (SELECT source,
                                CAST(round((0.9 * CAST(w0 AS DOUBLE) / wsum
                                            + 0.1 / k) * 1000000)
                                     AS BIGINT) AS weight
                         FROM w0 CROSS JOIN tt),
                 t AS (${Round14Queries.tokSql}),
                 tot0 AS (SELECT source, CAST(sum(n_tok) AS BIGINT)
                                 AS tokens_total
                          FROM t GROUP BY source),
                 tot AS (SELECT wts.source,
                                CAST(coalesce(tokens_total, 0) AS BIGINT)
                                  AS tokens_total,
                                weight
                         FROM wts LEFT JOIN tot0 ON wts.source = tot0.source
                         WHERE weight > 0),
                 ws AS (SELECT CAST(sum(weight) AS BIGINT) AS w_sum FROM wts
                        WHERE weight > 0),
                 b AS (SELECT CAST(min((tokens_total * w_sum) // weight)
                                   AS BIGINT) AS budget
                       FROM tot, ws)
            SELECT source, tokens_total, weight, budget,
                   (weight * budget) // w_sum AS keep_tokens,
                   CASE WHEN tokens_total = 0 THEN CAST(0 AS BIGINT)
                        ELSE ((weight * budget * 2) // w_sum
                                + tokens_total - 1) // tokens_total
                   END AS epochs_at_2x
            FROM tot, ws, b ORDER BY source"""))

  /** [[SpanCorrupt.corrupt]] — deterministic T5-style (input, target)
    * denoising pairs; md5 window coins, ordinal sentinels. */
  private val spanCorrupt = Q("q_span_corrupt",
    (s, dir) => SpanCorrupt.corrupt(table(s, dir, "documents")),
    Some("""WITH d AS (SELECT doc_id,
                   list_filter(string_split(lower(coalesce(text, '')), ' '),
                               t -> t <> '') AS arr
                 FROM documents),
            w AS (SELECT doc_id, arr, (len(arr) + 7) // 8 AS nw FROM d),
            f AS (SELECT doc_id, arr, nw,
                    list_transform(range(0, CAST(nw AS INTEGER)), i ->
                      substr(md5(CAST(doc_id AS VARCHAR) || ':'
                               || CAST(i AS VARCHAR)), 1, 1) < '4') AS flags
                  FROM w)
            SELECT doc_id,
                   CAST(len(arr) AS BIGINT) AS n_tok,
                   CAST(nw AS BIGINT) AS n_windows,
                   CAST(len(list_filter(flags, x -> x)) AS BIGINT) AS n_masked,
                   CASE WHEN nw = 0 THEN '' ELSE
                     array_to_string(list_transform(
                       range(0, CAST(nw AS INTEGER)), i ->
                       CASE WHEN flags[i + 1]
                            THEN '<extra_id_' || CAST(len(list_filter(
                                   list_slice(flags, 1, i), x -> x))
                                   AS VARCHAR) || '>'
                            ELSE array_to_string(
                                   list_slice(arr, i * 8 + 1, i * 8 + 8), ' ')
                       END), ' ') END AS input_text,
                   -- DuckDB's array_to_string([]) is NULL, Spark's
                   -- array_join is '' — coalesce aligns the no-mask doc
                   CASE WHEN nw = 0 THEN '' ELSE
                     coalesce(array_to_string(list_transform(
                       list_filter(range(0, CAST(nw AS INTEGER)),
                                   i -> flags[i + 1]), i ->
                       '<extra_id_' || CAST(len(list_filter(
                         list_slice(flags, 1, i), x -> x)) AS VARCHAR)
                       || '> '
                       || array_to_string(
                            list_slice(arr, i * 8 + 1, i * 8 + 8), ' ')),
                       ' '), '') END AS target_text
            FROM f ORDER BY doc_id"""))

  /** Shared oracle fragment: the q_centroids per-cell mean vectors
    * re-assembled with their norms — the centroid dim table both
    * centroid-relative rows below probe. */
  private[queries] val duckCentroids =
    """cp AS (SELECT label, pos, round(avg(CAST(v AS DOUBLE)), 3) + 0.0 AS c
              FROM (SELECT label, unnest(embedding) AS v,
                           generate_subscripts(embedding, 1) AS pos
                    FROM embeddings)
              GROUP BY 1, 2),
       cv AS (SELECT label, cent,
                     sqrt(list_sum(list_transform(cent, x -> x * x))) AS cnrm
              FROM (SELECT label, list(c ORDER BY pos) AS cent
                    FROM cp GROUP BY 1))"""

  /** [[Similarity.hardNegatives]] — per anchor, the top-5 cosine
    * near-misses from its 2 nearest FOREIGN cells (ANCE-style
    * contrastive negatives). */
  private val hardNegatives = Q("q_hard_negatives",
    (s, dir) => Similarity.hardNegatives(table(s, dir, "embeddings")),
    Some(s"""WITH ${ExtensionQueries.duckNorm},
                 $duckCentroids,
                 anch AS (SELECT vec_id AS anchor_id, label AS albl,
                                 e AS ae, nrm AS anrm
                          FROM nn WHERE vec_id % 100 = 0),
                 pc AS (SELECT anchor_id, ae, anrm, label,
                               row_number() OVER (PARTITION BY anchor_id
                                 ORDER BY cos_c DESC, label) AS cr
                        FROM (SELECT a.anchor_id, a.ae, a.anrm, c.label,
                                     round(list_sum(list_transform(
                                             range(1, len(c.cent) + 1),
                                             i -> a.ae[i] * c.cent[i]))
                                           / (a.anrm * c.cnrm), 4) AS cos_c
                              FROM anch a JOIN cv c ON c.label <> a.albl)),
                 cand AS (SELECT p.anchor_id, n.vec_id, n.label,
                                 round(list_sum(list_transform(
                                         range(1, len(n.e) + 1),
                                         i -> p.ae[i] * n.e[i]))
                                       / (p.anrm * n.nrm), 4) AS cos_r
                          FROM pc p JOIN nn n ON n.label = p.label
                          WHERE p.cr <= 2),
                 rk AS (SELECT *, row_number() OVER (PARTITION BY anchor_id
                          ORDER BY cos_r DESC, vec_id) AS nrank FROM cand)
            SELECT anchor_id, CAST(nrank AS BIGINT) AS nrank, vec_id,
                   label, cos_r
            FROM rk WHERE nrank <= 5 ORDER BY anchor_id, nrank"""))

  /** [[Similarity.prototypicalityPrune]] — D4 diversification: drop
    * the 20% of each cell closest to its own centroid. */
  private val prototypePrune = Q("q_prototype_prune",
    (s, dir) => Similarity
      .prototypicalityPrune(table(s, dir, "embeddings")),
    Some(s"""WITH ${ExtensionQueries.duckNorm},
                 $duckCentroids,
                 sc AS (SELECT n.vec_id, n.label,
                               round(list_sum(list_transform(
                                       range(1, len(n.e) + 1),
                                       i -> n.e[i] * c.cent[i]))
                                     / (n.nrm * c.cnrm), 4) AS cos_c
                        FROM nn n JOIN cv c USING (label)),
                 rk AS (SELECT *, row_number() OVER (PARTITION BY label
                          ORDER BY cos_c DESC, vec_id) AS r,
                               count(*) OVER (PARTITION BY label) AS n
                        FROM sc)
            SELECT vec_id, label, cos_c, r * 1000 > n * 200 AS keep
            FROM rk ORDER BY vec_id"""))

  val all: Seq[Q] = Seq(gopherRules, gopherReport, doremiWeights,
    mixtureDoremi, spanCorrupt, hardNegatives, prototypePrune)
}
