package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-12 additions: LSM postings compaction — the one
  * promised-but-absent scale lever VERDICT r11 found
  * ([[graft.streaming.StreamingPostings.compact]]). */
object Round12Queries {

  /** [[graft.streaming.StreamingPostings.compact]] driven MID-STREAM:
    * base over half the corpus, a batch-0 delta appended to the log,
    * the log COMPACTED into a new base (and truncated), then a batch-1
    * delta computed against the compacted base and resolved through
    * [[graft.streaming.StreamingPostings.view]]. The oracle is the
    * flat [[graft.extensions.Postings.build]] SQL over the full union
    * corpus — q_postings' SQL verbatim — so the row pins compaction
    * TRANSPARENCY: folding the log early must change nothing about
    * what later deltas and views produce (merged gap encodings, df
    * sums, cap transitions included), which is exactly the license an
    * operator needs to run compaction as a background job under a
    * live stream.
    *
    * One corpus scan (r12 VERDICT #3): the three legs (base, batch-0
    * delta, batch-1 delta) used to each re-derive their (doc, term)
    * pairs from `documents` — 4 parquet scans in the audited plan.
    * [[graft.extensions.Postings.termPairs]] now derives the pair
    * frame ONCE, checkpointed, and each leg cuts its doc slice from
    * the materialized pairs with a `doc_id % 4` predicate. */
  private val postingsCompact = Q("q_postings_compact",
    (s, dir) => {
      import graft.extensions.Postings
      import graft.streaming.StreamingPostings
      val docs = table(s, dir, "documents")
      val pairs = Postings.termPairs(docs).localCheckpoint()
      val base = Postings.buildFromPairs(
        pairs.filter(col("doc_id") % 4 >= 2))
      val log0 = Postings
        .appendDeltaFromPairs(base, pairs.filter(col("doc_id") % 4 === 1))
        .withColumn("batch_id", lit(0L))
      // background compaction: fold batch 0 into the base, drop the log
      val compacted = StreamingPostings.compact(base, log0).localCheckpoint()
      // the stream continues against the compacted base, empty log
      val log1 = Postings
        .appendDeltaFromPairs(compacted, pairs.filter(col("doc_id") % 4 === 0))
        .withColumn("batch_id", lit(1L))
      StreamingPostings.view(compacted, log1)
    },
    Some("""WITH d AS (SELECT doc_id,
                   list_filter(string_split(lower(coalesce(text, '')), ' '),
                               t -> t <> '') AS arr
                 FROM documents),
            g AS (SELECT DISTINCT doc_id,
                    unnest(list_transform(range(1, CAST(len(arr) AS INTEGER) - 1),
                      i -> array_to_string(list_slice(arr, i, i + 2), ' ')))
                      AS term
                  FROM d),
            f AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM g GROUP BY 1),
            l AS (SELECT term, list(doc_id ORDER BY doc_id) AS ids
                  FROM g GROUP BY 1)
            SELECT f.term, f.df,
                   CASE WHEN f.df <= 6 THEN ids[1] END AS first_doc,
                   CASE WHEN f.df <= 6 THEN ids[CAST(len(ids) AS INTEGER)] END
                     AS last_doc,
                   CASE WHEN f.df <= 6 THEN array_to_string(
                     list_transform(range(1, CAST(len(ids) AS INTEGER) + 1),
                       i -> CAST(CASE WHEN i = 1 THEN ids[i]
                                      ELSE ids[i] - ids[i - 1] END AS VARCHAR)),
                     ',') END AS postings
            FROM f JOIN l USING (term) ORDER BY term"""))

  /** [[graft.extensions.Sketches.histState]]/mergeHist/histQuantile —
    * the mergeable QUANTILE state completing the bounded-summary
    * family (CMS counts, KMV distincts, histogram quantiles): doc
    * token counts binned over [0, 200) into 32 bins, the state built
    * as TWO half-corpus states merged (the 100 TB shape — per-partition
    * states, union+sum merge, no re-read), then p50/p90/p99 read as
    * the covering bin's upper edge. Everything int64 — binning, ranks
    * (per-mille q so ⌈q·N/1000⌉ stays integer), and the reported edge —
    * so the oracle (which builds the histogram FLAT) hashes bitwise:
    * one row pins merge-exactness and the quantile arithmetic
    * together. Error ≤ one bin width by construction
    * (HistQuantileSpec pins that against exact order statistics). */
  private val histQuantileQ = Q("q_hist_quantile",
    (s, dir) => {
      import graft.extensions.Sketches
      val vals = table(s, dir, "documents")
        .select(col("doc_id"),
          size(split(coalesce(col("text"), lit("")), " "))
            .cast("long").as("v"))
      val a = Sketches.histState(
        vals.filter(col("doc_id") % 2 === 0), "v", 0L, 200L, 32)
      val b = Sketches.histState(
        vals.filter(col("doc_id") % 2 === 1), "v", 0L, 200L, 32)
      Sketches.histQuantile(Sketches.mergeHist(a, b),
          Seq(500, 900, 990), 0L, 200L, 32)
    },
    Some("""WITH t AS (SELECT CAST(len(string_split(coalesce(text, ''), ' '))
                              AS BIGINT) AS v
                       FROM documents),
                 h AS (SELECT CAST(CASE WHEN v < 0 THEN 0
                                        WHEN v >= 200 THEN 31
                                        ELSE v * 32 // 200 END AS INTEGER) AS bin,
                              CAST(count(*) AS BIGINT) AS cnt
                       FROM t GROUP BY 1),
                 c AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum,
                              sum(cnt) OVER () AS n
                       FROM h),
                 q(q_permille) AS (VALUES (500), (900), (990)),
                 r AS (SELECT q_permille, min(bin) AS bin
                       FROM q JOIN c ON cum >= (q_permille * n + 999) // 1000
                       GROUP BY 1)
            SELECT q_permille,
                   CAST((bin + 1) * 200 // 32 AS BIGINT) AS est
            FROM r ORDER BY q_permille"""))

  val all: Seq[Q] = Seq(postingsCompact, histQuantileQ)
}
