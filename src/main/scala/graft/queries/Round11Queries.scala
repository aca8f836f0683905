package graft.queries

import org.apache.spark.sql.functions._

/** Round-11 additions: the S8 paged-source scan (the last §2.1 row) —
  * see [[graft.sources.PagedSource]]. */
object Round11Queries {

  /** [[graft.sources.PagedSource]] — the recursive date-bisect paged
    * scan, end to end: the fixture feed's 5000 rows overflow the
    * 100×5 page cap across the whole 10-day span, so the planner
    * bisects to ≤500-row windows and fans the pages out as input
    * partitions. The oracle reproduces the fixture's row function
    * (id, base + (id·2654435761) mod span, 'vac-'||id) independently —
    * a planner that dropped, duplicated, or boundary-shifted any
    * window breaks the hash. */
  private val pagedSource = Q("q_paged_source",
    (s, _) => s.read.format("graft.sources.PagedSource")
      .option("n", "5000").option("base", "1600000000")
      .option("span", "864000")
      .option("perPage", "100").option("maxPages", "5")
      .option("minRange", "60")
      .load()
      .orderBy("id"),
    Some("""SELECT CAST(t.id AS BIGINT) AS id,
                   CAST(1600000000 + (t.id * 2654435761) % 864000 AS BIGINT)
                     AS ts_sec,
                   'vac-' || t.id AS title
            FROM range(0, 5000) t(id) ORDER BY id"""))

  private def packed(s: org.apache.spark.sql.SparkSession, dir: String) =
    graft.extensions.Packing.packChunks(
      graft.Tables.table(s, dir, "documents"), budget = 64)

  private def deletesOf(m: org.apache.spark.sql.DataFrame) =
    m.select("doc_id").filter(col("doc_id") % 37 === 0)

  /** [[graft.extensions.Packing.applyDeletes]] — right-to-be-forgotten
    * propagation through the q_pack_chunks manifest (every 37th doc
    * deleted): each shard's token stream closes up over the removed
    * spans WITHOUT re-tokenizing any text. The oracle re-derives the
    * packed geometry over the retained population independently, so a
    * repack that drifted from pack-the-filtered-corpus semantics (the
    * spec-pinned equivalence) breaks the hash here too. */
  private val deleteRepack = Q("q_delete_repack",
    (s, dir) => {
      val m = packed(s, dir)
      graft.extensions.Packing.applyDeletes(m, deletesOf(m), budget = 64)
        .orderBy("shard", "doc_id")
    },
    Some("""WITH t AS (SELECT doc_id, lang AS shard,
                              CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS n_tok
                       FROM documents WHERE doc_id % 37 <> 0),
                 c AS (SELECT doc_id, shard, n_tok,
                              sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_tok
                       FROM t)
            SELECT doc_id, shard, n_tok,
                   CAST(end_tok AS BIGINT) AS end_tok,
                   CAST(end_tok - n_tok AS BIGINT) AS start_tok,
                   CAST(floor((end_tok - n_tok) / 64) AS BIGINT) AS chunk_first,
                   CAST(floor((end_tok - 1) / 64) AS BIGINT) AS chunk_last
            FROM c ORDER BY shard, doc_id"""))

  /** [[graft.extensions.Packing.repackCost]] — the bounded-rewrite
    * bill for the delete pass: per shard, chunks before/after and how
    * many must rewrite (everything from the first deleted doc's
    * chunk_first on; every earlier chunk keeps its file byte-
    * identical). The oracle recomputes both manifests and the bound
    * independently; all columns int64. */
  private val deleteRepackCost = Q("q_delete_repack_cost",
    (s, dir) => {
      val m = packed(s, dir)
      graft.extensions.Packing.repackCost(m, deletesOf(m), budget = 64)
        .orderBy("shard")
    },
    Some("""WITH t AS (SELECT doc_id, lang AS shard,
                              CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS n_tok
                       FROM documents),
                 b AS (SELECT doc_id, shard, n_tok,
                              sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_tok
                       FROM t),
                 before AS (SELECT shard,
                                   CAST(max((end_tok - 1) // 64) + 1 AS BIGINT) AS chunks_before
                            FROM b GROUP BY shard),
                 hit AS (SELECT shard,
                                CAST(min((end_tok - n_tok) // 64) AS BIGINT) AS first_hit
                         FROM b WHERE doc_id % 37 = 0 GROUP BY shard),
                 a AS (SELECT shard, n_tok,
                              sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_tok
                       FROM b WHERE doc_id % 37 <> 0),
                 after AS (SELECT shard,
                                  CAST(max((end_tok - 1) // 64) + 1 AS BIGINT) AS chunks_after
                           FROM a GROUP BY shard)
            SELECT before.shard, chunks_before,
                   coalesce(chunks_after, 0) AS chunks_after,
                   CASE WHEN first_hit IS NULL THEN 0
                        ELSE greatest(coalesce(chunks_after, 0) - first_hit, 0)
                   END AS chunks_rewritten
            FROM before
            LEFT JOIN after USING (shard)
            LEFT JOIN hit USING (shard)
            ORDER BY shard"""))

  val all: Seq[Q] = Seq(pagedSource, deleteRepack, deleteRepackCost)
}
