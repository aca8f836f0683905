package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.extensions.{BpeTrain, Dedup, Similarity, TextAnalysis, Winnowing}

/** Round-6 surface: winnowing (rolling-hash) document fingerprints and
  * their MOSS-style candidate pairs, the ANN recall@k accuracy contract,
  * and per-source distribution-drift monitoring. Same contract as every
  * other row: exact integer counts, ordered double folds, rounded
  * outputs, total-order sort keys — each query carries a bitwise DuckDB
  * oracle. */
object Round6Queries {

  /** Shared DuckDB CTE chain: per-doc winnowed fingerprint sets with
    * k=3 word-grams, window w=4 (mirrors Winnowing.winnowedSet: docs
    * shorter than one window keep one min; 32-bit md5-prefix hashes). */
  private val winnowCtes =
    """wt AS (SELECT doc_id,
                     list_filter(string_split(lower(coalesce(text, '')), ' '),
                                 t -> t <> '') AS toks
              FROM documents),
       wg AS (SELECT doc_id,
                     CASE WHEN len(toks) < 3 THEN CAST([] AS VARCHAR[])
                          ELSE list_transform(range(1, greatest(len(toks) - 1, 1)),
                                 i -> array_to_string(list_slice(toks, i, i + 2), ' '))
                     END AS grams
              FROM wt),
       wh AS (SELECT doc_id,
                     list_transform(grams,
                       g -> CAST(concat('0x', substr(md5(g), 1, 8)) AS BIGINT)) AS hs
              FROM wg),
       wf AS (SELECT doc_id, len(hs) AS n_grams,
                     CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[])
                          WHEN len(hs) <= 3 THEN [list_min(hs)]
                          ELSE list_transform(range(1, len(hs) - 2),
                                 i -> list_min(list_slice(hs, i, i + 3)))
                     END AS mins
              FROM wh),
       wn AS (SELECT doc_id, n_grams,
                     list_sort(list_distinct(mins)) AS fps
              FROM wf)"""

  /** Winnowing fingerprint summary (Winnowing.fingerprints): per-doc gram
    * count, selected-fingerprint count, density, and the ordered-set md5
    * digest. */
  private val winnow = Q("q_winnow",
    (s, dir) => Winnowing.fingerprints(table(s, dir, "documents")),
    Some(s"""WITH $winnowCtes
             SELECT doc_id,
                    CAST(n_grams AS BIGINT) AS n_grams,
                    CAST(len(fps) AS BIGINT) AS n_fps,
                    CASE WHEN n_grams > 0
                      THEN round(len(fps) * 1.0 / n_grams, 4) END AS density,
                    md5(array_to_string(list_transform(fps,
                          f -> CAST(f AS VARCHAR)), ' ')) AS fp_digest
             FROM wn ORDER BY doc_id"""))

  /** MOSS-style shared-fingerprint candidate pairs over the winnowed
    * index (Winnowing.sharedFingerprintPairs, minShared=2, and the
    * default maxDf=20 hot-fingerprint cap — see the operator scaladoc
    * for why min-selection makes the cap load-bearing). */
  private val winnowPairs = Q("q_winnow_pairs",
    (s, dir) => Winnowing.sharedFingerprintPairs(table(s, dir, "documents")),
    Some(s"""WITH $winnowCtes,
             idx0 AS (SELECT doc_id, unnest(fps) AS fp FROM wn),
             idx AS (SELECT doc_id, fp FROM idx0
                     QUALIFY count(*) OVER (PARTITION BY fp) <= 20)
             SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    count(*) AS n_shared
             FROM idx a JOIN idx b
               ON a.fp = b.fp AND a.doc_id < b.doc_id
             GROUP BY 1, 2 HAVING count(*) >= 2
             ORDER BY doc_a, doc_b"""))

  /** Winnowing accuracy contract (Winnowing.resemblanceEstimate):
    * per candidate pair, resemblance estimated from the capped winnowed
    * sets vs the exact distinct-trigram Jaccard. */
  private val winnowEst = Q("q_winnow_est",
    (s, dir) => Winnowing.resemblanceEstimate(table(s, dir, "documents")),
    Some(s"""WITH $winnowCtes,
             idx0 AS (SELECT doc_id, unnest(fps) AS fp FROM wn),
             idx AS (SELECT doc_id, fp FROM idx0
                     QUALIFY count(*) OVER (PARTITION BY fp) <= 20),
             pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                              count(*) AS n_shared
                       FROM idx a JOIN idx b
                         ON a.fp = b.fp AND a.doc_id < b.doc_id
                       GROUP BY 1, 2 HAVING count(*) >= 2),
             nf AS (SELECT doc_id, count(*) AS nf FROM idx GROUP BY 1),
             ws AS (SELECT DISTINCT doc_id, s FROM
                      (SELECT doc_id, unnest(grams) AS s FROM wg)),
             ns AS (SELECT doc_id, count(*) AS n FROM ws GROUP BY 1),
             it AS (SELECT p.doc_a, p.doc_b, count(*) AS i
                    FROM pairs p
                    JOIN ws x ON x.doc_id = p.doc_a
                    JOIN ws y ON y.doc_id = p.doc_b AND y.s = x.s
                    GROUP BY 1, 2)
             SELECT p.doc_a, p.doc_b, p.n_shared,
                    round(p.n_shared * 1.0
                          / (fa.nf + fb.nf - p.n_shared), 4) AS est_jac,
                    round(coalesce(it.i, 0) * 1.0
                          / (na.n + nb.n - coalesce(it.i, 0)), 4) AS exact_jac
             FROM pairs p
             JOIN nf fa ON fa.doc_id = p.doc_a
             JOIN nf fb ON fb.doc_id = p.doc_b
             JOIN ns na ON na.doc_id = p.doc_a
             JOIN ns nb ON nb.doc_id = p.doc_b
             LEFT JOIN it ON it.doc_a = p.doc_a AND it.doc_b = p.doc_b
             ORDER BY p.doc_a, p.doc_b"""))

  /** ANN accuracy contract (Similarity.recallAtK): recall@10 of the
    * IVF single-cell search vs exact brute force, per query vector. */
  private val annRecall = Q("q_ann_recall",
    (s, dir) => Similarity.recallAtK(table(s, dir, "embeddings"),
      queryIds = 0L until 8L, k = 10),
    Some(s"""WITH ${ExtensionQueries.duckNorm},
             q AS (SELECT vec_id AS qid, label AS qlabel, e AS qe, nrm AS qn
                   FROM nn WHERE vec_id IN (0, 1, 2, 3, 4, 5, 6, 7)),
             scored AS (SELECT q.qid, q.qlabel, nn.label, nn.vec_id,
                               round(list_sum(list_transform(range(1, len(e) + 1),
                                                             i -> e[i] * qe[i]))
                                     / (nrm * qn), 4) AS cos_r
                        FROM nn CROSS JOIN q WHERE nn.vec_id <> q.qid),
             brute AS (SELECT qid, vec_id FROM
                         (SELECT qid, vec_id,
                                 row_number() OVER (PARTITION BY qid
                                   ORDER BY cos_r DESC, vec_id) AS rn
                          FROM scored) WHERE rn <= 10),
             ivf AS (SELECT qid, vec_id FROM
                       (SELECT qid, vec_id,
                               row_number() OVER (PARTITION BY qid
                                 ORDER BY cos_r DESC, vec_id) AS rn
                        FROM scored WHERE label = qlabel) WHERE rn <= 10)
             SELECT b.qid AS qid,
                    CAST(count(i.vec_id) AS BIGINT) AS n_hits,
                    round(count(i.vec_id) / 10.0, 4) AS recall
             FROM brute b LEFT JOIN ivf i
               ON b.qid = i.qid AND b.vec_id = i.vec_id
             GROUP BY b.qid ORDER BY 1"""))

  /** Per-source Jensen-Shannon drift vs the corpus distribution
    * (TextAnalysis.sourceDrift, top-50 vocab). */
  private val srcDrift = Q("q_src_drift",
    (s, dir) => TextAnalysis.sourceDrift(table(s, dir, "documents")),
    Some("""WITH tok AS (SELECT source,
                                unnest(list_filter(string_split(lower(coalesce(text, '')), ' '),
                                                   t -> t <> '')) AS token
                         FROM documents),
                 vocab AS (SELECT token, count(*) AS corpus_cnt
                           FROM tok GROUP BY 1
                           ORDER BY corpus_cnt DESC, token LIMIT 50),
                 sc AS (SELECT source, token, count(*) AS src_cnt
                        FROM tok JOIN vocab USING (token) GROUP BY 1, 2),
                 grid AS (SELECT s.source, v.token, v.corpus_cnt,
                                 coalesce(sc.src_cnt, 0) AS src_cnt
                          FROM (SELECT DISTINCT source FROM documents) s
                          CROSS JOIN vocab v
                          LEFT JOIN sc ON sc.source = s.source AND sc.token = v.token),
                 per AS (SELECT source,
                                CAST(sum(src_cnt) AS BIGINT) AS src_total,
                                CAST(sum(CASE WHEN src_cnt > 0 THEN 1 ELSE 0 END) AS BIGINT)
                                  AS n_vocab_hits,
                                CAST(sum(corpus_cnt) AS BIGINT) AS corpus_total,
                                list(struct_pack(token := token,
                                                 src_cnt := src_cnt,
                                                 corpus_cnt := corpus_cnt)
                                     ORDER BY token) AS terms
                         FROM grid GROUP BY 1)
            SELECT source, n_vocab_hits, src_total,
                   round(list_sum(list_transform(terms, t ->
                     (CASE WHEN t.src_cnt > 0
                        THEN 0.5 * (t.src_cnt * 1.0 / greatest(src_total, 1))
                             * ln((t.src_cnt * 1.0 / greatest(src_total, 1))
                                  / (((t.src_cnt * 1.0 / greatest(src_total, 1))
                                      + (t.corpus_cnt * 1.0 / greatest(corpus_total, 1))) / 2.0))
                        ELSE 0.0 END)
                     + (CASE WHEN t.corpus_cnt > 0
                          THEN 0.5 * (t.corpus_cnt * 1.0 / greatest(corpus_total, 1))
                               * ln((t.corpus_cnt * 1.0 / greatest(corpus_total, 1))
                                    / (((t.src_cnt * 1.0 / greatest(src_total, 1))
                                        + (t.corpus_cnt * 1.0 / greatest(corpus_total, 1))) / 2.0))
                          ELSE 0.0 END))) + 0.0, 4) AS js_div
            FROM per ORDER BY source"""))

  /** Unrolled DuckDB twin of BpeTrain.learn's iteration `n`: each stage
    * is the same (pair count → argmax → literal replace) round the Spark
    * loop runs, so the merge SEQUENCE is reproduced bit-for-bit. Each
    * stage LEFT-joins its 1-row argmax and coalesces back to the
    * unchanged seq, so on a degenerate corpus that exhausts merge pairs
    * before round `n` the chain passes seqs through — matching
    * BpeTrain.learn's early stop — instead of collapsing to zero rows
    * on an empty b_i. */
  private[queries] def bpeCtes(n: Int): String = {
    val s0 =
      """tok AS (SELECT unnest(list_filter(string_split(lower(coalesce(text, '')), ' '),
                                           t -> t <> '')) AS word
                 FROM documents),
         w AS (SELECT word, count(*) AS freq FROM tok GROUP BY 1),
         s0 AS (SELECT word,
                       ' ' || array_to_string(list_transform(range(1, len(word) + 1),
                                i -> substr(word, i, 1)), '  ') || ' ' AS seq,
                       freq
                FROM w)"""
    val stages = (1 to n).map { i =>
      s"""ss${i - 1} AS (SELECT word, string_split(trim(seq), '  ') AS syms, freq
                         FROM s${i - 1}),
          pr$i AS (SELECT unnest(list_transform(range(1, len(syms)), j -> syms[j])) AS l,
                          unnest(list_transform(range(1, len(syms)), j -> syms[j + 1])) AS r,
                          freq
                   FROM ss${i - 1} WHERE len(syms) > 1),
          b$i AS (SELECT l, r, sum(freq) AS c FROM pr$i GROUP BY 1, 2
                  ORDER BY c DESC, l, r LIMIT 1),
          s$i AS (SELECT word,
                         coalesce(replace(seq, ' ' || b$i.l || '  ' || b$i.r || ' ',
                                          ' ' || b$i.l || b$i.r || ' '), seq) AS seq,
                         freq
                  FROM s${i - 1} LEFT JOIN b$i ON true)"""
    }
    (s0 +: stages).mkString(",\n")
  }

  /** BPE vocabulary learning (BpeTrain.learn, 4 merges over the
    * word-frequency table — never the corpus). */
  private val bpeTrain = Q("q_bpe_train",
    (s, dir) => BpeTrain.learnDf(s, table(s, dir, "documents"), numMerges = 4),
    Some(s"""WITH ${bpeCtes(4)}
             SELECT * FROM (
               ${(1 to 4).map(i =>
                 s"""SELECT CAST($i AS INTEGER) AS rank, l AS "left", r AS "right",
                            CAST(c AS BIGINT) AS pair_freq FROM b$i""")
                 .mkString("\n UNION ALL \n")})
             ORDER BY rank"""))

  /** Subword segmentation under the learned merges (BpeTrain.segment):
    * per vocabulary word, its symbol sequence and count after the same
    * 4 merges. */
  private val bpeSegment = Q("q_bpe_segment",
    (s, dir) => {
      val docs = table(s, dir, "documents")
      BpeTrain.segment(docs, BpeTrain.learn(docs, numMerges = 4))
    },
    Some(s"""WITH ${bpeCtes(4)}
             SELECT word, freq,
                    array_to_string(string_split(trim(seq), '  '), ' ') AS segmentation,
                    CAST(len(string_split(trim(seq), '  ')) AS BIGINT) AS n_symbols
             FROM s4 ORDER BY word"""))

  /** Cross-source content-overlap matrix (Dedup.sourceOverlap, 6-token
    * windows): which feeds share boilerplate/copied spans, with the
    * overlap coefficient over distinct window sets. */
  private val srcOverlap = Q("q_source_overlap",
    (s, dir) => Dedup.sourceOverlap(table(s, dir, "documents")),
    Some("""WITH wt AS (SELECT source,
                               list_filter(string_split(lower(coalesce(text, '')), ' '),
                                           t -> t <> '') AS toks
                        FROM documents),
                 wins AS (SELECT source,
                                 unnest(CASE WHEN len(toks) < 6 THEN CAST([] AS VARCHAR[])
                                        ELSE list_transform(range(1, len(toks) - 4),
                                               i -> array_to_string(list_slice(toks, i, i + 5), ' '))
                                        END) AS win
                          FROM wt),
                 hs AS (SELECT DISTINCT md5(win) AS h, source FROM wins),
                 totals AS (SELECT source, count(*) AS n FROM hs GROUP BY 1),
                 pairs AS (SELECT a.source AS src_a, b.source AS src_b,
                                  count(*) AS n_shared
                           FROM hs a JOIN hs b
                             ON a.h = b.h AND a.source < b.source
                           GROUP BY 1, 2)
            SELECT src_a, src_b, n_shared,
                   round(n_shared * 1.0 / least(ta.n, tb.n), 4) AS overlap_coef
            FROM pairs
            JOIN totals ta ON ta.source = pairs.src_a
            JOIN totals tb ON tb.source = pairs.src_b
            ORDER BY src_a, src_b"""))

  val all: Seq[Q] = Seq(winnow, winnowPairs, winnowEst, annRecall, srcDrift,
    bpeTrain, bpeSegment, srcOverlap)
}
