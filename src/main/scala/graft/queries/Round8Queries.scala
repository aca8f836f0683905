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
      tau = 0.3, maxCellSize = 3),
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
      tau = 0.3),
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

  /** The md5 MinHash-LSH candidate machinery, verbatim from
    * q_minhash_est's oracle (Round4Queries) — sh / sigs / buckets /
    * pairs over the case-sensitive word-3-gram shingles. */
  private[queries] val duckMinhashPairs =
    """sh AS (SELECT DISTINCT doc_id, s FROM
                (SELECT doc_id,
                        unnest(list_transform(
                          range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
                          i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' '))) AS s
                 FROM documents)),
       sigs AS (SELECT doc_id, sd.seed,
                       min(md5(CAST(sd.seed AS VARCHAR) || ':' || s)) AS mh
                FROM sh CROSS JOIN (SELECT unnest(range(0, 8)) AS seed) sd
                GROUP BY 1, 2),
       buckets AS (SELECT doc_id, CAST(floor(seed / 4) AS INTEGER) AS band,
                          md5(string_agg(mh, '|' ORDER BY seed)) AS bkey
                   FROM sigs GROUP BY 1, 2),
       pairs AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                 FROM buckets x JOIN buckets y
                   ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id)"""

  /** Broder containment over the LSH candidate pairs
    * (Dedup.containment): the asymmetric direction of a near-dup —
    * which side is the subset — that symmetric Jaccard can't give a
    * survivor policy. */
  private val containmentQ = Q("q_containment",
    (s, dir) => graft.extensions.Dedup.containment(table(s, dir, "documents")),
    Some(s"""WITH $duckMinhashPairs,
             sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
             inter AS (SELECT p.a, p.b, count(*) AS i
                       FROM pairs p
                         JOIN sh x ON x.doc_id = p.a
                         JOIN sh y ON y.doc_id = p.b AND y.s = x.s
                       GROUP BY 1, 2)
             SELECT p.a, p.b,
                    round(coalesce(i, 0) * 1.0 / sza.n, 4) AS cont_a,
                    round(coalesce(i, 0) * 1.0 / szb.n, 4) AS cont_b
             FROM pairs p
               JOIN sz sza ON sza.doc_id = p.a
               JOIN sz szb ON szb.doc_id = p.b
               LEFT JOIN inter ON inter.a = p.a AND inter.b = p.b
             ORDER BY p.a, p.b"""))

  /** Leakage-safe fold split (Dedup.leakageSafeSplit, 10 folds): whole
    * near-dup components share a fold, so splits drawn from folds can't
    * leak a near-duplicate of a training doc into eval. Oracle shares
    * q_dedup_cc's recursive closure CTE and q_sample_mixture's md5
    * bucket idiom. */
  private val splitLeakage = Q("q_split_leakage",
    (s, dir) => graft.extensions.Dedup
      .leakageSafeSplit(table(s, dir, "documents")),
    Some(s"""WITH RECURSIVE ${ExtensionQueries.duckCcReach},
             comps AS (SELECT id AS doc_id, min(r) AS comp FROM reach GROUP BY id)
             SELECT doc_id, comp,
                    CAST(CAST(concat('0x', substr(md5(CAST(comp AS VARCHAR)), 1, 4))
                              AS BIGINT) % 10 AS BIGINT) AS fold
             FROM comps ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(semDedupCapped, semDedupKeep, containmentQ,
    splitLeakage)
}
