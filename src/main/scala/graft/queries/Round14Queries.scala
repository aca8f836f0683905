package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-14 additions: the COUNT aggregate pushdown of the paged
  * source — the fourth and final DSv2 pushdown surface (after
  * filters, limit, statistics) — and source-mixture rebalancing, the
  * data-mixing step (target token mixture → per-source budgets →
  * deterministic sampled corpus). */
object Round14Queries {

  /** Test-mixture weights derived in-plan from the source name
    * (srcN → N % 4 + 1) so Spark and the oracle build the identical
    * weights frame from the data alone — no literal table to drift. */
  private[queries] def testWeights(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents").select("source").distinct()
      .withColumn("weight",
        pmod(expr("CAST(substr(source, 4) AS BIGINT)"), lit(4L)) + lit(1L))

  private[queries] val weightsSql =
    """SELECT source, CAST(substr(source, 4) AS BIGINT) % 4 + 1 AS weight
       FROM (SELECT DISTINCT source FROM documents)"""

  private[queries] val tokSql =
    """SELECT source, doc_id,
              CAST(len(list_filter(
                string_split(lower(coalesce(text, '')), ' '),
                x -> x <> '')) AS BIGINT) AS n_tok
       FROM documents"""

  /** [[graft.extensions.Mixture.plan]] — per-source token totals, the
    * largest no-upsampling budget for the target mixture, each
    * source's keep share, and the upsampling epochs a 2× budget would
    * cost. Integer-only arithmetic (div = floor on positives in both
    * engines), so the oracle recomputes every column exactly. */
  private val mixturePlan = Q("q_mixture_plan",
    (s, dir) => graft.extensions.Mixture.plan(
      table(s, dir, "documents"), testWeights(s, dir)),
    Some(s"""WITH t AS ($tokSql),
             wts AS ($weightsSql),
             tot0 AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS tokens_total
                      FROM t GROUP BY source),
             tot AS (SELECT wts.source,
                            CAST(coalesce(tokens_total, 0) AS BIGINT)
                              AS tokens_total,
                            weight
                     FROM wts LEFT JOIN tot0 ON wts.source = tot0.source
                     WHERE weight > 0),
             ws AS (SELECT CAST(sum(weight) AS BIGINT) AS w_sum FROM wts
                    WHERE weight > 0),
             b AS (SELECT CAST(min((tokens_total * w_sum) // weight) AS BIGINT)
                            AS budget
                   FROM tot, ws)
             SELECT source, tokens_total, weight, budget,
                    (weight * budget) // w_sum AS keep_tokens,
                    CASE WHEN tokens_total = 0 THEN CAST(0 AS BIGINT)
                         ELSE ((weight * budget * 2) // w_sum
                                 + tokens_total - 1) // tokens_total
                    END AS epochs_at_2x
             FROM tot, ws, b"""))

  /** [[graft.extensions.Mixture.sample]] — the materialized mixture:
    * per source, docs in md5(seed ":" doc_id) order while the running
    * token total stays below the source's keep budget. The oracle
    * replays the identical cumsum-over-md5-order rule, so a mismatch in
    * selection order, budget arithmetic, or the one-doc overshoot rule
    * breaks the hash. */
  private val mixtureSample = Q("q_mixture_sample",
    (s, dir) => graft.extensions.Mixture.sample(
      table(s, dir, "documents"), testWeights(s, dir), seed = 7L),
    Some(s"""WITH t AS ($tokSql),
             wts AS ($weightsSql),
             tot0 AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS tokens_total
                      FROM t GROUP BY source),
             tot AS (SELECT wts.source,
                            CAST(coalesce(tokens_total, 0) AS BIGINT)
                              AS tokens_total,
                            weight
                     FROM wts LEFT JOIN tot0 ON wts.source = tot0.source
                     WHERE weight > 0),
             ws AS (SELECT CAST(sum(weight) AS BIGINT) AS w_sum FROM wts
                    WHERE weight > 0),
             b AS (SELECT CAST(min((tokens_total * w_sum) // weight) AS BIGINT)
                            AS budget
                   FROM tot, ws),
             keeps AS (SELECT source,
                              (weight * budget) // w_sum AS keep_tokens
                       FROM tot, ws, b),
             sel AS (SELECT t.source, t.doc_id, t.n_tok, keep_tokens,
                            CAST(coalesce(sum(n_tok) OVER (
                              PARTITION BY t.source
                              ORDER BY md5('7:' || CAST(doc_id AS VARCHAR)),
                                       doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING), 0) AS BIGINT)
                              AS cum_before
                     FROM t JOIN keeps ON t.source = keeps.source)
             SELECT source, doc_id, n_tok
             FROM sel WHERE cum_before < keep_tokens"""))

  /** [[graft.sources.PagedSource]] aggregate pushdown — a filtered
    * group-free count/min/max over the paged feed is answered entirely
    * from `found()` metadata probes: the physical plan is a one-row
    * PagedCountScan, zero pages fetched (PagedAggSpec pins the
    * odometer). The oracle recomputes all three from the fixture's
    * row function over the same half-open ts window, so a planner
    * that double-counted a bisection boundary, summed `found(root)`
    * instead of the reachable leaves, or mis-bisected a boundary
    * second breaks the compare. */
  private val pagedCount = Q("q_paged_count",
    (s, _) => s.read.format("graft.sources.PagedSource")
      .option("n", "5000").option("base", "1600000000")
      .option("span", "864000")
      .option("perPage", "100").option("maxPages", "5")
      .option("minRange", "60")
      .load()
      .filter(col("ts_sec") >= 1600216000L && col("ts_sec") < 1600432000L)
      .groupBy().agg(count(lit(1)).as("n"),
        min(col("ts_sec")).as("ts_min"), max(col("ts_sec")).as("ts_max")),
    Some("""SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(min(ts_sec) AS BIGINT) AS ts_min,
                   CAST(max(ts_sec) AS BIGINT) AS ts_max
            FROM (SELECT 1600000000 + (t.id * 2654435761) % 864000 AS ts_sec
                  FROM range(0, 5000) t(id))
            WHERE ts_sec >= 1600216000 AND ts_sec < 1600432000"""))

  /** [[graft.extensions.Packing.lengthBuckets]] — padded-batch
    * assembly: bucket by ⌊n_tok/32⌋, enumerate within bucket in doc_id
    * order, cut into 16-doc batches, bill each batch's padding. The
    * oracle's per-bucket row_number twin pins that the distributed
    * rank-minus-bucket-start enumeration equals the straightforward
    * within-bucket ordinal. */
  private val lengthBuckets = Q("q_length_buckets",
    (s, dir) => graft.extensions.Packing.lengthBuckets(
      table(s, dir, "documents"), bucketWidth = 32L, docsPerBatch = 16),
    Some(s"""WITH t AS ($tokSql),
             r AS (SELECT doc_id, n_tok, n_tok // 32 AS bucket,
                          row_number() OVER (
                            PARTITION BY n_tok // 32 ORDER BY doc_id) - 1
                            AS ord
                   FROM t)
             SELECT bucket, ord // 16 AS batch_id,
                    CAST(count(*) AS BIGINT) AS n_docs,
                    max(n_tok) AS max_tok,
                    CAST(sum(n_tok) AS BIGINT) AS tok_sum,
                    CAST(count(*) * max(n_tok) - sum(n_tok) AS BIGINT)
                      AS padding_waste
             FROM r GROUP BY 1, 2"""))

  /** [[graft.extensions.Packing.paddingWaste]] — the lever measured:
    * padded tokens under bucketed vs naive (doc_id-order) batching,
    * waste in integer ppm so no float crosses engines. */
  private val paddingWaste = Q("q_padding_waste",
    (s, dir) => graft.extensions.Packing.paddingWaste(
      table(s, dir, "documents"), bucketWidth = 32L, docsPerBatch = 16),
    Some(s"""WITH t AS ($tokSql),
             rb AS (SELECT n_tok, n_tok // 32 AS bucket,
                           (row_number() OVER (
                              PARTITION BY n_tok // 32 ORDER BY doc_id) - 1)
                             // 16 AS batch_id
                    FROM t),
             bb AS (SELECT count(*) AS n_docs, max(n_tok) AS max_tok,
                           sum(n_tok) AS tok_sum
                    FROM rb GROUP BY bucket, batch_id),
             rn AS (SELECT n_tok,
                           (row_number() OVER (ORDER BY doc_id) - 1) // 16
                             AS batch_id
                    FROM t),
             nb AS (SELECT count(*) AS n_docs, max(n_tok) AS max_tok,
                           sum(n_tok) AS tok_sum
                    FROM rn GROUP BY batch_id),
             roll AS (
               SELECT 'bucketed' AS policy,
                      CAST(count(*) AS BIGINT) AS n_batches,
                      CAST(sum(tok_sum) AS BIGINT) AS tok_sum,
                      CAST(sum(n_docs * max_tok) AS BIGINT) AS padded_tokens
               FROM bb
               UNION ALL
               SELECT 'naive',
                      CAST(count(*) AS BIGINT),
                      CAST(sum(tok_sum) AS BIGINT),
                      CAST(sum(n_docs * max_tok) AS BIGINT)
               FROM nb)
             SELECT policy, n_batches, tok_sum, padded_tokens,
                    (padded_tokens - tok_sum) * 1000000 // padded_tokens
                      AS waste_ppm
             FROM roll"""))

  val all: Seq[Q] = Seq(pagedCount, mixturePlan, mixtureSample,
    lengthBuckets, paddingWaste)
}
