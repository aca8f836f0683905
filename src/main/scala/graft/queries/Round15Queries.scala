package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.extensions.DataSelection

/** Round-15 additions: reference-model data curation
  * ([[graft.extensions.DataSelection]]) — DSIR importance weights +
  * top-K resampling, the CCNet perplexity head/middle/tail partition
  * with its governance roll-up, and the curriculum training order the
  * tiers induce. One held-out convention everywhere: doc_id % 5 = 0 is
  * the reference slice (the q_decontaminate / q_containment split). */
object Round15Queries {

  /** Shared oracle CTEs: tokenize, cut the reference slice, train the
    * add-k bigram LM on it, score every raw doc (the q_bigram_lm
    * transcendental discipline: round(avg(log2(...)), 4)), and rank
    * score thirds per language ((3·r) div n over the 0-based rank —
    * exact integer tiers, no quantile estimation to drift). */
  private[queries] val pplCtes =
    """d AS (SELECT doc_id, lang,
                    list_filter(string_split(lower(coalesce(text, '')), ' '),
                                t -> t <> '') AS arr,
                    doc_id % 5 = 0 AS is_ref
             FROM documents),
       bgs AS (SELECT doc_id, is_ref,
                      unnest(list_transform(range(1, CAST(len(arr) AS INTEGER)),
                        i -> array_to_string(list_slice(arr, i, i + 1), ' '))) AS bg
               FROM d),
       model AS (SELECT bg, count(*) AS c_bg FROM bgs WHERE is_ref GROUP BY 1),
       ctx AS (SELECT string_split(bg, ' ')[1] AS w1, sum(c_bg) AS c_w1
               FROM model GROUP BY 1),
       v AS (SELECT count(DISTINCT tok) AS v
             FROM (SELECT unnest(arr) AS tok FROM d WHERE is_ref)),
       sc AS (SELECT doc_id, count(*) AS n_bigrams,
                     round(avg(log2((coalesce(c_bg, 0) + 0.5)
                       / (coalesce(c_w1, 0) + 0.5 * v))), 4) AS avg_log2_p
              FROM (SELECT b.doc_id, m.c_bg, c.c_w1
                    FROM bgs b LEFT JOIN model m USING (bg)
                      LEFT JOIN ctx c ON string_split(b.bg, ' ')[1] = c.w1
                    WHERE NOT b.is_ref)
                CROSS JOIN v
              GROUP BY 1),
       base AS (SELECT d.doc_id, d.lang,
                       coalesce(sc.n_bigrams, 0) AS n_bigrams, sc.avg_log2_p
                FROM d LEFT JOIN sc USING (doc_id)
                WHERE NOT d.is_ref),
       rk AS (SELECT doc_id, lang, n_bigrams, avg_log2_p,
                     row_number() OVER (PARTITION BY lang
                       ORDER BY avg_log2_p DESC NULLS LAST, doc_id) - 1 AS r,
                     count(*) OVER (PARTITION BY lang) AS n
              FROM base),
       pt AS (SELECT doc_id, lang, n_bigrams, avg_log2_p,
                     CASE (r * 3) // n WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
                          ELSE 'tail' END AS bucket
              FROM rk)"""

  /** [[DataSelection.perplexityScore]] — every raw doc's mean
    * log₂ P(bigram) under the REFERENCE-trained LM. The contrast with
    * q_bigram_lm is the training set: self-trained scores drift as the
    * corpus grows; this one is an external yardstick (CCNet's). */
  private val pplScore = Q("q_ppl_score",
    (s, dir) => DataSelection.perplexityScore(table(s, dir, "documents")),
    Some(s"""WITH $pplCtes
             SELECT doc_id, lang, n_bigrams, avg_log2_p
             FROM base ORDER BY doc_id"""))

  /** [[DataSelection.perplexityPartition]] — CCNet head/middle/tail:
    * exact per-language rank thirds over the score, best first,
    * unscorable docs ranked last into the tail. */
  private val pplPartition = Q("q_ppl_partition",
    (s, dir) => DataSelection.perplexityPartition(table(s, dir, "documents")),
    Some(s"""WITH $pplCtes
             SELECT doc_id, lang, n_bigrams, avg_log2_p, bucket
             FROM pt ORDER BY doc_id"""))

  /** [[DataSelection.perplexitySummary]] — the partition's governance
    * roll-up, all int64 (share in ppm, the q_shard_balance lesson). */
  private val pplSummary = Q("q_ppl_summary",
    (s, dir) => DataSelection.perplexitySummary(table(s, dir, "documents")),
    Some(s"""WITH $pplCtes
             SELECT lang, bucket, count(*) AS n_docs,
                    CAST(sum(n_bigrams) AS BIGINT) AS bigram_sum,
                    (count(*) * 1000000)
                      // CAST(sum(count(*)) OVER (PARTITION BY lang) AS BIGINT)
                      AS share_ppm
             FROM pt GROUP BY lang, bucket ORDER BY lang, bucket"""))

  /** Shared DSIR oracle CTEs: 48-bit md5 lane mod 4096 as the hashed
    * unigram feature (the kmvHash idiom), add-k feature models for the
    * reference (target) and raw slices, per-token log-likelihood
    * ratios, per-doc means. */
  private val dsirCtes =
    """d AS (SELECT doc_id,
                    list_filter(string_split(lower(coalesce(text, '')), ' '),
                                t -> t <> '') AS arr,
                    doc_id % 5 = 0 AS is_ref
             FROM documents),
       t AS (SELECT doc_id, is_ref,
                    CAST(concat('0x', substr(md5(tok), 1, 12)) AS BIGINT)
                      % 4096 AS f
             FROM (SELECT doc_id, is_ref, unnest(arr) AS tok FROM d)),
       cnts AS (SELECT f,
                       sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS c_t,
                       sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS c_r
                FROM t GROUP BY 1),
       tot AS (SELECT sum(c_t) AS n_t, sum(c_r) AS n_r FROM cnts),
       ratio AS (SELECT f, log2(((c_t + 0.5) / (n_t + 2048.0))
                           * ((n_r + 2048.0) / (c_r + 0.5))) AS lr
                 FROM cnts CROSS JOIN tot),
       sc AS (SELECT doc_id, count(*) AS n_tok, round(avg(lr), 4) AS llr_avg
              FROM t JOIN ratio USING (f) WHERE NOT is_ref GROUP BY 1),
       w AS (SELECT d.doc_id, coalesce(sc.n_tok, 0) AS n_tok, sc.llr_avg
             FROM d LEFT JOIN sc USING (doc_id)
             WHERE NOT d.is_ref)"""

  /** [[DataSelection.dsirWeights]] — hashed-unigram importance weights
    * (mean log₂ p_target/p_raw per token); positive = reference-like. */
  private val dsirWeights = Q("q_dsir_weights",
    (s, dir) => DataSelection.dsirWeights(table(s, dir, "documents")),
    Some(s"""WITH $dsirCtes
             SELECT doc_id, n_tok, llr_avg FROM w ORDER BY doc_id"""))

  /** [[DataSelection.dsirSelect]] — the importance-resampling
    * selection: top-50 raw docs by weight (TakeOrderedAndProject —
    * per-task heaps, never a global sort). */
  private val dsirTop = Q("q_dsir_top",
    (s, dir) => DataSelection.dsirSelect(table(s, dir, "documents"), topK = 50),
    Some(s"""WITH $dsirCtes
             SELECT doc_id, n_tok, llr_avg FROM w
             ORDER BY llr_avg DESC NULLS LAST, doc_id LIMIT 50"""))

  /** [[DataSelection.curriculum]] — the training order the perplexity
    * tiers induce: head stage first, seeded md5 shuffle within a stage
    * (the epochShuffle key), one global 0-based position. */
  private val curriculumQ = Q("q_curriculum",
    (s, dir) => DataSelection.curriculum(table(s, dir, "documents"), seed = 7L),
    Some(s"""WITH $pplCtes,
             st AS (SELECT doc_id,
                           CAST(CASE bucket WHEN 'head' THEN 0
                                WHEN 'middle' THEN 1 ELSE 2 END AS BIGINT)
                             AS stage,
                           md5(concat('7', ':', CAST(doc_id AS VARCHAR))) AS ky
                    FROM pt)
             SELECT doc_id, stage,
                    row_number() OVER (ORDER BY stage, ky, doc_id) - 1
                      AS position
             FROM st ORDER BY doc_id"""))

  /** [[DataSelection.trainerFeed]] — the capstone: curriculum order →
    * round-robin shard placement (stage mix AND doc counts balanced by
    * construction) → per-shard running token totals cut into 512-token
    * chunk spans. All-integer output; the oracle replays the identical
    * order, placement, cumsum, and chunk arithmetic. */
  private val trainerFeed = Q("q_trainer_feed",
    (s, dir) => DataSelection.trainerFeed(
      table(s, dir, "documents"), numShards = 8, budget = 512, seed = 7L),
    Some(s"""WITH $pplCtes,
             st AS (SELECT doc_id,
                           CAST(CASE bucket WHEN 'head' THEN 0
                                WHEN 'middle' THEN 1 ELSE 2 END AS BIGINT)
                             AS stage,
                           md5(concat('7', ':', CAST(doc_id AS VARCHAR))) AS ky
                    FROM pt),
             cu AS (SELECT doc_id, stage,
                           row_number() OVER (ORDER BY stage, ky, doc_id) - 1
                             AS position
                    FROM st),
             tk AS (SELECT doc_id,
                           CAST(len(list_filter(
                             string_split(lower(coalesce(text, '')), ' '),
                             x -> x <> '')) AS BIGINT) AS n_tok
                    FROM documents),
             sh AS (SELECT cu.doc_id, stage, position, position % 8 AS shard,
                           n_tok
                    FROM cu JOIN tk USING (doc_id)),
             cs AS (SELECT doc_id, stage, position, shard, n_tok,
                           CAST(sum(n_tok) OVER (PARTITION BY shard
                             ORDER BY position ROWS UNBOUNDED PRECEDING)
                             AS BIGINT) AS end_tok
                    FROM sh)
             SELECT doc_id, stage, position, shard, n_tok, end_tok,
                    (end_tok - n_tok) // 512 AS chunk_first,
                    greatest((end_tok - n_tok) // 512,
                             (greatest(end_tok, 1) - 1) // 512) AS chunk_last
             FROM cs ORDER BY doc_id"""))

  /** [[graft.extensions.Sketches.hllDistinct]] — the fourth mergeable
    * summary (HyperLogLog, Flajolet et al. 2007) under the accuracy-
    * contract discipline: per-source exact distinct 3-gram count
    * beside the m=64 HLL estimate. rho is derived from length(bin(·))
    * — pure integer/string ops — and the register power sum is int64
    * fixed point, so the one float division is mirrored verbatim. */
  private val hllSql =
    """WITH d AS (SELECT source,
                              list_filter(string_split(lower(coalesce(text, '')), ' '),
                                          t -> t <> '') AS arr
                       FROM documents),
             g AS (SELECT source,
                          unnest(list_transform(range(1, CAST(len(arr) AS INTEGER) - 1),
                            i -> array_to_string(list_slice(arr, i, i + 2), ' '))) AS s
                   FROM d),
             h AS (SELECT DISTINCT source,
                          CAST(concat('0x', substr(md5(s), 1, 12)) AS BIGINT) AS h
                   FROM g),
             st AS (SELECT source, h % 64 AS bucket,
                           CASE WHEN h // 64 > 0
                                THEN 43 - length(bin(h // 64))
                                ELSE 43 END AS rho
                    FROM h),
             reg AS (SELECT source, bucket, max(rho) AS r
                     FROM st GROUP BY 1, 2),
             est AS (SELECT source, count(*) AS n_buckets,
                            sum(1::BIGINT << (43 - r)) AS s_present
                     FROM reg GROUP BY 1),
             fin AS (SELECT source, 64 - n_buckets AS zeros,
                            s_present + (64 - n_buckets) * 8796093022208
                              AS s_fixed
                     FROM est),
             ex AS (SELECT source, count(DISTINCT s) AS n_exact
                    FROM g GROUP BY 1)
             SELECT ex.source, ex.n_exact,
                    round(CASE WHEN zeros > 0
                               AND 0.709 * 3.6028797018963968e16 / s_fixed <= 160.0
                               THEN 64.0 * ln(64.0 / zeros)
                               ELSE 0.709 * 3.6028797018963968e16 / s_fixed END,
                          4) AS hll_est
             FROM ex JOIN fin USING (source)
             ORDER BY source"""

  private val hllDistinct = Q("q_hll_distinct",
    (s, dir) => graft.extensions.Sketches
      .hllDistinct(table(s, dir, "documents"), n = 3),
    Some(hllSql))

  /** [[graft.extensions.Sketches.hllDistinctMerged]] — the SAME flat
    * oracle, but the Spark side builds the state in two doc_id-parity
    * halves and merges: the driver's hash gate (not only a spec) pins
    * merge ∘ build ≡ build ∘ union (the q_card_merged discipline). */
  private val hllMerged = Q("q_hll_merged",
    (s, dir) => graft.extensions.Sketches
      .hllDistinctMerged(table(s, dir, "documents"), n = 3),
    Some(hllSql))

  /** [[DataSelection.selectionAgreement]] — the curation cross-check:
    * per perplexity tier, how many docs DSIR's top-200 also picked
    * (agreement in ppm, all int64). The healthy shape — agreement
    * concentrated in the head — is itself the diagnostic. */
  private val selectionOverlap = Q("q_selection_overlap",
    (s, dir) => DataSelection.selectionAgreement(
      table(s, dir, "documents"), topK = 200),
    Some(s"""WITH $pplCtes,
             d2 AS (SELECT doc_id,
                           list_filter(string_split(lower(coalesce(text, '')), ' '),
                                       t -> t <> '') AS arr,
                           doc_id % 5 = 0 AS is_ref
                    FROM documents),
             t2 AS (SELECT doc_id, is_ref,
                           CAST(concat('0x', substr(md5(tok), 1, 12)) AS BIGINT)
                             % 4096 AS f
                    FROM (SELECT doc_id, is_ref, unnest(arr) AS tok FROM d2)),
             cnts2 AS (SELECT f,
                              sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS c_t,
                              sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS c_r
                       FROM t2 GROUP BY 1),
             tot2 AS (SELECT sum(c_t) AS n_t, sum(c_r) AS n_r FROM cnts2),
             ratio2 AS (SELECT f, log2(((c_t + 0.5) / (n_t + 2048.0))
                                  * ((n_r + 2048.0) / (c_r + 0.5))) AS lr
                        FROM cnts2 CROSS JOIN tot2),
             sc2 AS (SELECT doc_id, round(avg(lr), 4) AS llr_avg
                     FROM t2 JOIN ratio2 USING (f) WHERE NOT is_ref
                     GROUP BY 1),
             w2 AS (SELECT d2.doc_id, sc2.llr_avg
                    FROM d2 LEFT JOIN sc2 USING (doc_id)
                    WHERE NOT d2.is_ref),
             top AS (SELECT doc_id FROM w2
                     ORDER BY llr_avg DESC NULLS LAST, doc_id LIMIT 200)
             SELECT bucket, count(*) AS n_docs,
                    CAST(sum(CASE WHEN top.doc_id IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_dsir_top,
                    (CAST(sum(CASE WHEN top.doc_id IS NOT NULL
                              THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
                      // count(*) AS agree_ppm
             FROM pt LEFT JOIN top USING (doc_id)
             GROUP BY bucket ORDER BY bucket"""))

  val all: Seq[Q] = Seq(
    pplScore, pplPartition, pplSummary, dsirWeights, dsirTop, curriculumQ,
    trainerFeed, hllDistinct, hllMerged, selectionOverlap)
}
