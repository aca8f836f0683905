package graft.queries

import graft.Tables.table
import graft.extensions.Similarity

/** Round-8 surface: the semantic-dedup cell-size guard's approximation
  * semantics made ORACLE-VERIFIED (not just spec'd), and the survivor
  * list an admission pipeline actually consumes. Same contract as every
  * other row: deterministic rank chunking (total order on vec_id),
  * rounded cosines, total-order sort keys — bitwise DuckDB oracles. */
object Round8Queries {

  /** [[Similarity.semDedup]] with the maxCellSize guard ENGAGED
    * (cap 3, far below the sf0.01 cell sizes): the oracle replicates
    * the rank chunking exactly — row_number within the cell by vec_id,
    * integer-divided into cap-sized blocks, pairs scanned within a
    * block only — so the guard's approximation is pinned to a spec, not
    * just "fewer pairs". q_semdedup (uncapped regime) stays the
    * exact-semantics row; this row is the guard's. */
  private val semDedupCapped = Q("q_semdedup_capped",
    (s, dir) => Similarity.semDedup(table(s, dir, "embeddings"),
      tau = 0.3, maxCellSize = 3).orderBy("label"),
    Some(s"""WITH ${ExtensionQueries.duckNorm},
             blkd AS (SELECT vec_id, label, e, nrm,
                             CAST((row_number() OVER (PARTITION BY label
                                     ORDER BY vec_id) - 1) // 3 AS INT) AS blk
                      FROM nn),
             p AS (SELECT b.vec_id AS b
                   FROM blkd a JOIN blkd b
                     ON a.label = b.label AND a.blk = b.blk
                        AND a.vec_id < b.vec_id
                   WHERE round(list_sum(list_transform(range(1, len(a.e) + 1),
                                                       i -> a.e[i] * b.e[i]))
                               / (a.nrm * b.nrm), 4) >= 0.3),
             d AS (SELECT DISTINCT b AS vec_id FROM p)
             SELECT nn.label,
                    CAST(count(*) AS BIGINT) AS n_vecs,
                    CAST(count(d.vec_id) AS BIGINT) AS n_dropped,
                    CAST(count(*) - count(d.vec_id) AS BIGINT) AS n_kept,
                    round((count(*) - count(d.vec_id)) * 1.0 / count(*), 4)
                      AS keep_ratio
             FROM nn LEFT JOIN d USING (vec_id)
             GROUP BY nn.label ORDER BY nn.label"""))

  /** [[Similarity.semDedupSurvivors]]: the per-vector admission list
    * (q_semdedup's summary, materialized) — every vector without a
    * smaller-id near-dup in its cell. */
  private val semDedupKeep = Q("q_semdedup_keep",
    (s, dir) => Similarity.semDedupSurvivors(table(s, dir, "embeddings"),
      tau = 0.3).orderBy("vec_id"),
    Some(s"""WITH ${ExtensionQueries.duckNorm},
             p AS (SELECT b.vec_id AS b
                   FROM nn a JOIN nn b
                     ON a.label = b.label AND a.vec_id < b.vec_id
                   WHERE round(list_sum(list_transform(range(1, len(a.e) + 1),
                                                       i -> a.e[i] * b.e[i]))
                               / (a.nrm * b.nrm), 4) >= 0.3),
             d AS (SELECT DISTINCT b AS vec_id FROM p)
             SELECT nn.vec_id, nn.label
             FROM nn LEFT JOIN d USING (vec_id)
             WHERE d.vec_id IS NULL
             ORDER BY nn.vec_id"""))

  val all: Seq[Q] = Seq(semDedupCapped, semDedupKeep)
}
