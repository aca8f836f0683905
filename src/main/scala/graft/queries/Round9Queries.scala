package graft.queries

import graft.Tables.table
import graft.extensions.{Dedup, TextAnalysis}

/** Round-9 surface: the containment SIGNAL becomes a containment
  * SURVIVOR POLICY (q_containment told you which side is the subset;
  * q_dedup_containment drops it), and the leakage-safe folds become the
  * train/eval artifact a pipeline actually ships. Same contract as
  * every row: rounded floats, total-order sort keys, bitwise DuckDB
  * oracles. */
object Round9Queries {

  /** [[Dedup.dedupByContainment]] at tau 0.97 — a threshold the sf0.01
    * candidate set genuinely straddles, so all three branches engage:
    * contained-a drops (cont_a ≥ τ > cont_b), contained-b drops, and
    * mutual containment falling back to the smaller-id rule. Oracle
    * reuses q_containment's candidate/intersection CTEs verbatim. */
  private val dedupContainment = Q("q_dedup_containment",
    (s, dir) => Dedup.dedupByContainment(table(s, dir, "documents"),
      tau = 0.97),
    Some(s"""WITH ${Round8Queries.duckMinhashPairs},
             sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
             inter AS (SELECT p.a, p.b, count(*) AS i
                       FROM pairs p
                         JOIN sh x ON x.doc_id = p.a
                         JOIN sh y ON y.doc_id = p.b AND y.s = x.s
                       GROUP BY 1, 2),
             cont AS (SELECT p.a, p.b,
                             round(coalesce(i, 0) * 1.0 / sza.n, 4) AS ca,
                             round(coalesce(i, 0) * 1.0 / szb.n, 4) AS cb
                      FROM pairs p
                        JOIN sz sza ON sza.doc_id = p.a
                        JOIN sz szb ON szb.doc_id = p.b
                        LEFT JOIN inter ON inter.a = p.a AND inter.b = p.b),
             dr AS (SELECT DISTINCT doc_id FROM (
                      SELECT a AS doc_id FROM cont WHERE ca >= 0.97 AND cb < 0.97
                      UNION ALL
                      SELECT b AS doc_id FROM cont WHERE cb >= 0.97))
             SELECT d.doc_id, (dr.doc_id IS NULL) AS kept
             FROM documents d LEFT JOIN dr USING (doc_id)
             ORDER BY d.doc_id"""))

  /** [[Dedup.trainEvalSplit]] — the end-to-end split artifact: folds
    * 8–9 are eval (mixture-exempt), folds 0–7 intersect the mixture
    * sampler's admission into train, the rest drop. Oracle composes
    * q_split_leakage's recursive-CC fold CTE with q_sample_mixture's
    * rate/admission machinery verbatim. */
  private val splitAssign = Q("q_split_assign",
    (s, dir) => Dedup.trainEvalSplit(table(s, dir, "documents")),
    Some(s"""WITH RECURSIVE ${ExtensionQueries.duckCcReach},
             comps AS (SELECT id AS doc_id, min(r) AS comp FROM reach GROUP BY id),
             folds AS (SELECT doc_id,
                              CAST(CAST(concat('0x', substr(md5(CAST(comp AS VARCHAR)), 1, 4))
                                        AS BIGINT) % 10 AS BIGINT) AS fold
                       FROM comps),
             per AS (SELECT source, sum(n_chars) AS n_chars
                     FROM documents GROUP BY 1),
             t AS (SELECT source,
                          CAST(n_chars AS BIGINT) AS n_chars,
                          sqrt(CAST(n_chars AS DOUBLE)) AS t
                   FROM per),
             tot AS (SELECT CAST(sum(n_chars) AS BIGINT) AS chars_tot,
                            list_sum(list(t ORDER BY source)) AS t_tot
                     FROM t),
             r AS (SELECT source,
                          least(1.0, round(round(t / t_tot, 4)
                                           / round(n_chars * 1.0 / chars_tot, 4), 4))
                            AS rate
                   FROM t, tot),
             adm AS (SELECT d.doc_id FROM documents d JOIN r USING (source)
                     WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                                AS BIGINT) % 100 < floor(rate * 100 + 0.5))
             SELECT f.doc_id, d.source, f.fold,
                    CASE WHEN f.fold >= 8 THEN 'eval'
                         WHEN adm.doc_id IS NOT NULL THEN 'train'
                         ELSE 'dropped' END AS assignment
             FROM folds f
               JOIN documents d USING (doc_id)
               LEFT JOIN adm USING (doc_id)
             ORDER BY f.doc_id"""))

  /** [[Dedup.hammingBandPairs]] — the generic 64-bit Hamming banding
    * shared by text SimHash and image perceptual hashes
    * ([[graft.multimodal.Multimodal.imageHashPairs]]) — oracled over
    * the documents' simhash column with the COMPLETE 4×16-bit banding
    * (numBands > maxHamming ⇒ pigeonhole-complete candidates, so this
    * row verifies the full ≤3-Hamming pair set, not a banding-shaped
    * subset; media payloads aren't DuckDB-readable, so the shared band
    * operator is pinned on the text fingerprint both engines can
    * compute). */
  private val hammingPairs = Q("q_hamming_pairs_b4",
    (s, dir) => Dedup.hammingBandPairs(
      Dedup.simHash(table(s, dir, "documents")), "doc_id", "simhash",
      maxHamming = 3, numBands = 4),
    Some(s"""WITH ${ExtensionQueries.simhashCtes},
             bands AS (SELECT doc_id, simhash, bi.i,
                              (simhash >> CAST(bi.i * 16 AS INTEGER)) & 65535 AS bv
                       FROM sh CROSS JOIN (SELECT unnest(range(0, 4)) AS i) bi),
             cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
                             x.simhash AS ha, y.simhash AS hb
                      FROM bands x JOIN bands y
                        ON x.i = y.i AND x.bv = y.bv AND x.doc_id < y.doc_id)
             SELECT a, b, CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
             FROM cand WHERE bit_count(xor(ha, hb)) <= 3
             ORDER BY a, b"""))

  /** [[graft.extensions.EmbeddingDrift]] — the cell-distribution JS
    * monitor of the embedding leg, oracled over the testdata's
    * pre-clustered labels (the same label-as-cell trick as q_ann_ivf;
    * the fitted-cells path is the identical code on a KMeans.assign
    * frame): baseline = the full corpus' label histogram, "batch" = the
    * vec_id % 5 slice. Same sorted-fold JS determinism as
    * q_src_drift. */
  private val embDrift = Q("q_emb_drift",
    (s, dir) => {
      import org.apache.spark.sql.functions.col
      val emb = table(s, dir, "embeddings")
      graft.extensions.EmbeddingDrift.driftVsProfile(
        emb.filter(col("vec_id") % 5 === 0).select(col("label").as("cell")),
        graft.extensions.EmbeddingDrift.cellProfile(
          emb.select(col("label").as("cell"))))
    },
    Some("""WITH base AS (SELECT label AS cell, count(*) AS corpus_cnt
                          FROM embeddings GROUP BY 1),
                 bc AS (SELECT label AS cell, count(*) AS batch_cnt
                        FROM embeddings WHERE vec_id % 5 = 0 GROUP BY 1),
                 grid AS (SELECT base.cell,
                                 coalesce(bc.batch_cnt, 0) AS batch_cnt,
                                 base.corpus_cnt
                          FROM base LEFT JOIN bc USING (cell)),
                 per AS (SELECT CAST(sum(batch_cnt) AS BIGINT) AS n_vecs,
                                CAST(sum(CASE WHEN batch_cnt > 0 THEN 1 ELSE 0 END)
                                     AS BIGINT) AS n_cells_hit,
                                CAST(sum(corpus_cnt) AS BIGINT) AS corpus_total,
                                list(struct_pack(cell := cell,
                                                 batch_cnt := batch_cnt,
                                                 corpus_cnt := corpus_cnt)
                                     ORDER BY cell) AS terms
                         FROM grid)
            SELECT n_cells_hit, n_vecs,
                   round(list_sum(list_transform(terms, t ->
                     (CASE WHEN t.batch_cnt > 0
                        THEN 0.5 * (t.batch_cnt * 1.0 / greatest(n_vecs, 1))
                             * ln((t.batch_cnt * 1.0 / greatest(n_vecs, 1))
                                  / (((t.batch_cnt * 1.0 / greatest(n_vecs, 1))
                                      + (t.corpus_cnt * 1.0 / greatest(corpus_total, 1))) / 2.0))
                        ELSE 0.0 END)
                     + (CASE WHEN t.corpus_cnt > 0
                          THEN 0.5 * (t.corpus_cnt * 1.0 / greatest(corpus_total, 1))
                               * ln((t.corpus_cnt * 1.0 / greatest(corpus_total, 1))
                                    / (((t.batch_cnt * 1.0 / greatest(n_vecs, 1))
                                        + (t.corpus_cnt * 1.0 / greatest(corpus_total, 1))) / 2.0))
                          ELSE 0.0 END))) + 0.0, 4) AS js_div
            FROM per"""))

  /** Shared CTE chain for the exact-substring rows: positioned 6-token
    * windows, cross-doc duplicated ones with their min-doc_id owner, and
    * the gaps-and-islands merge into maximal [start, end) token spans —
    * the DuckDB twin of [[TextAnalysis.exactSubstrSpans]]'s front half.
    * `extraDp` narrows the duplicated-position set (the clean row drops
    * owner-held positions). */
  private[queries] def duckSubstrSpans(extraDp: String): String =
    s"""ag AS (SELECT doc_id,
                      list_filter(string_split(lower(coalesce(text, '')), ' '),
                                  t -> t <> '') AS arr
               FROM documents),
        w AS (SELECT doc_id,
                     unnest(CASE WHEN len(arr) < 6 THEN []
                            ELSE list_transform(range(1, CAST(len(arr) AS INTEGER) - 4),
                                   i -> struct_pack(pos := CAST(i - 1 AS BIGINT),
                                                    win := array_to_string(arr[i : i + 5], ' ')))
                            END) AS pw
              FROM ag),
        ww AS (SELECT doc_id, pw.pos AS pos, pw.win AS win FROM w),
        own AS (SELECT win, min(doc_id) AS owner
                FROM ww GROUP BY win HAVING count(DISTINCT doc_id) > 1),
        dp AS (SELECT ww.doc_id, ww.pos FROM ww JOIN own USING (win)$extraDp),
        fl AS (SELECT doc_id, pos,
                      CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                                OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 6
                           THEN 1 ELSE 0 END AS new_run
               FROM dp),
        rn AS (SELECT doc_id, pos,
                      sum(new_run) OVER (PARTITION BY doc_id ORDER BY pos
                                         ROWS UNBOUNDED PRECEDING) AS run
               FROM fl),
        sp AS (SELECT doc_id, min(pos) AS span_start, max(pos) + 6 AS span_end,
                      CAST(count(*) AS BIGINT) AS n_windows
               FROM rn GROUP BY doc_id, run)"""

  /** [[TextAnalysis.exactSubstrSpans]] — maximal cross-doc duplicated
    * token spans (the removal-ready geometry q_dup_spans only counts):
    * overlapping duplicated 6-token windows fused gaps-and-islands
    * style into disjoint [start, end) intervals. */
  private val substrSpans = Q("q_substr_spans",
    (s, dir) => TextAnalysis.exactSubstrSpans(table(s, dir, "documents")),
    Some(s"""WITH ${duckSubstrSpans("")}
             SELECT doc_id, span_start, span_end,
                    span_end - span_start AS span_tokens, n_windows
             FROM sp
             ORDER BY doc_id, span_start"""))

  /** [[TextAnalysis.exactSubstrClean]] — the keep-one-canonical-copy
    * removal budget: tokens inside merged spans of duplicated windows
    * this doc does NOT own (owner = min doc_id per window), with the
    * kept fraction per doc. Oracle shares q_substr_spans' CTE chain,
    * narrowing dp to non-owner positions. */
  private val substrClean = Q("q_substr_clean",
    (s, dir) => TextAnalysis.exactSubstrClean(table(s, dir, "documents")),
    Some(s"""WITH ${duckSubstrSpans(" WHERE ww.doc_id <> own.owner")},
             rm AS (SELECT doc_id, CAST(sum(span_end - span_start) AS BIGINT) AS n_removed
                    FROM sp GROUP BY doc_id),
             nt AS (SELECT doc_id, CAST(len(arr) AS BIGINT) AS n_tok FROM ag)
             SELECT nt.doc_id, nt.n_tok,
                    coalesce(rm.n_removed, 0) AS n_removed,
                    CASE WHEN nt.n_tok > 0
                         THEN round((nt.n_tok - coalesce(rm.n_removed, 0)) * 1.0 / nt.n_tok, 4)
                         ELSE 1.0 END AS keep_frac
             FROM nt LEFT JOIN rm USING (doc_id)
             ORDER BY nt.doc_id"""))

  val all: Seq[Q] = Seq(dedupContainment, splitAssign, hammingPairs, embDrift,
    substrSpans, substrClean)
}
