package graft.queries

import org.apache.spark.sql.functions.col

import graft.Tables.table
import graft.extensions.{Dedup, Similarity, TextAnalysis}

/** Round-7 surface: semantic (embedding-layer) deduplication, and two
  * per-document quality signals a pretraining pipeline gates on —
  * unigram entropy and mean-IDF novelty. Same contract as every other
  * row: exact integer counts, one deterministic fold order (or exact
  * decimal sums) for every float, rounded outputs, total-order sort
  * keys — each query carries a bitwise DuckDB oracle. */
object Round7Queries {

  /** SemDeDup-style per-cell admission summary (Similarity.semDedup,
    * tau = 0.3): vectors with a smaller-id cosine-near-dup in their
    * cell are dropped. */
  private val semDedup = Q("q_semdedup",
    (s, dir) => Similarity.semDedup(table(s, dir, "embeddings"), tau = 0.3),
    Some(s"""WITH ${ExtensionQueries.duckNorm},
             p AS (SELECT b.vec_id AS b
                   FROM nn a JOIN nn b
                     ON a.label = b.label AND a.vec_id < b.vec_id
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

  /** Per-doc unigram Shannon entropy (TextAnalysis.tokenEntropy):
    * histogram over sorted distinct tokens, one deterministic fold. */
  private val tokenEntropy = Q("q_token_entropy",
    (s, dir) => TextAnalysis.tokenEntropy(table(s, dir, "documents")),
    Some("""WITH wt AS (SELECT doc_id,
                               list_filter(string_split(lower(coalesce(text, '')), ' '),
                                           t -> t <> '') AS toks
                        FROM documents),
                 ws AS (SELECT doc_id, toks,
                               list_sort(list_distinct(toks)) AS ds
                        FROM wt)
            SELECT doc_id,
                   CAST(len(toks) AS BIGINT) AS n_tok,
                   CAST(len(ds) AS BIGINT) AS n_distinct,
                   CASE WHEN len(toks) > 0 THEN
                     round(-list_sum(list_transform(ds, t ->
                       (len(list_filter(toks, x -> x = t)) * 1.0 / len(toks))
                       * ln(len(list_filter(toks, x -> x = t)) * 1.0 / len(toks)))), 4)
                     + 0.0
                   ELSE 0.0 END AS entropy
            FROM ws ORDER BY doc_id"""))

  /** Mean-IDF novelty per doc (TextAnalysis.docNovelty): exact decimal
    * sum of 6-decimal IDFs so the distributed fold is order-free. */
  private val docNovelty = Q("q_doc_novelty",
    (s, dir) => TextAnalysis.docNovelty(table(s, dir, "documents")),
    Some("""WITH tok AS (SELECT doc_id,
                                unnest(list_filter(string_split(lower(coalesce(text, '')), ' '),
                                                   t -> t <> '')) AS token
                         FROM documents),
                 dfreq AS (SELECT token, count(*) AS df FROM
                             (SELECT DISTINCT doc_id, token FROM tok)
                           GROUP BY 1),
                 tot AS (SELECT count(*) AS n_docs FROM documents),
                 idf AS (SELECT token,
                                CAST(round(ln(n_docs * 1.0 / df), 6)
                                     AS DECIMAL(18,6)) AS idf
                         FROM dfreq CROSS JOIN tot)
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_tok,
                   round(CAST(sum(idf) AS DOUBLE) / count(*), 4) AS novelty
            FROM tok JOIN idf USING (token)
            GROUP BY doc_id ORDER BY doc_id"""))

  /** Per-benchmark-doc leak report (TextAnalysis.contaminationReport,
    * 4-grams; benchmark = doc_id % 10 == 0 as in q_decontaminate): the
    * eval-integrity readout, with zero-leak rows kept so "clean" is
    * distinguishable from "not checked". */
  private val contamReport = Q("q_contamination_report",
    (s, dir) => {
      val docs = table(s, dir, "documents")
      TextAnalysis.contaminationReport(
        docs.filter(ExtensionQueries.corpusSide(col("doc_id"))),
        docs.filter(ExtensionQueries.heldOut(col("doc_id"))),
        n = 4)
    },
    Some("""WITH g AS (SELECT doc_id,
                              list_filter(string_split(lower(coalesce(text, '')), ' '),
                                          t -> t <> '') AS arr
                       FROM documents),
                 gr AS (SELECT doc_id,
                               unnest(CASE WHEN len(arr) < 4 THEN CAST([] AS VARCHAR[])
                                      ELSE list_transform(range(1, len(arr) - 2),
                                             i -> array_to_string(list_slice(arr, i, i + 3), ' '))
                                      END) AS gram
                        FROM g),
                 cg AS (SELECT doc_id AS corpus_id, gram FROM gr WHERE doc_id % 10 <> 0),
                 bg AS (SELECT DISTINCT doc_id AS bench_id, gram FROM gr WHERE doc_id % 10 = 0),
                 hits AS (SELECT bench_id,
                                 count(DISTINCT corpus_id) AS n_corpus_docs,
                                 count(DISTINCT gram) AS n_leaked_grams
                          FROM cg JOIN bg USING (gram) GROUP BY 1)
            SELECT b.bench_id,
                   CAST(coalesce(h.n_corpus_docs, 0) AS BIGINT) AS n_corpus_docs,
                   CAST(coalesce(h.n_leaked_grams, 0) AS BIGINT) AS n_leaked_grams
            FROM (SELECT DISTINCT doc_id AS bench_id FROM documents
                  WHERE doc_id % 10 = 0) b
            LEFT JOIN hits h USING (bench_id)
            ORDER BY bench_id"""))

  /** Near-dup cluster-size histogram over the MinHash-LSH component
    * graph (ConnectedComponents.label ∘ Dedup.minHashLsh) — the
    * dedup-observability readout: how much of the corpus sits in
    * 2-clusters vs mega-clusters decides the survivor policy. */
  private val ccSizes = Q("q_cc_sizes",
    (s, dir) => {
      import org.apache.spark.sql.functions.{count, lit}
      Dedup.ccLabels(table(s, dir, "documents"))
        .groupBy("comp").agg(count(lit(1)).as("sz"))
        .groupBy(col("sz").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"))
    },
    Some(s"""WITH RECURSIVE ${ExtensionQueries.duckCcReach},
             comps AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
             szs AS (SELECT comp, count(*) AS sz FROM comps GROUP BY 1)
             SELECT CAST(sz AS BIGINT) AS cluster_size,
                    CAST(count(*) AS BIGINT) AS n_clusters
             FROM szs GROUP BY sz ORDER BY cluster_size"""))

  /** kNN majority-label classification (Similarity.knnClassify, k=10
    * over the recallAtK query sample — both contracts share one
    * memoized scored frame, so the corpus is scanned once). */
  private val knnClassify = Q("q_knn_classify",
    (s, dir) => Similarity.knnClassify(table(s, dir, "embeddings"),
      queryIds = 0L until 8L, k = 10),
    Some(s"""WITH ${ExtensionQueries.duckNorm},
             q AS (SELECT vec_id AS qid, e AS qe, nrm AS qn
                   FROM nn WHERE vec_id IN (0, 1, 2, 3, 4, 5, 6, 7)),
             scored AS (SELECT q.qid, nn.label, nn.vec_id,
                               round(list_sum(list_transform(range(1, len(e) + 1),
                                                             i -> e[i] * qe[i]))
                                     / (nrm * qn), 4) AS cos_r
                        FROM nn CROSS JOIN q WHERE nn.vec_id <> q.qid),
             top AS (SELECT qid, label FROM
                       (SELECT qid, label,
                               row_number() OVER (PARTITION BY qid
                                 ORDER BY cos_r DESC, vec_id) AS rn
                        FROM scored) WHERE rn <= 10),
             v AS (SELECT qid, label, count(*) AS votes FROM top GROUP BY 1, 2),
             w AS (SELECT qid, label AS pred_label, votes,
                          row_number() OVER (PARTITION BY qid
                            ORDER BY votes DESC, label) AS vr
                   FROM v),
             t AS (SELECT vec_id AS qid, label AS true_label FROM nn
                   WHERE vec_id IN (0, 1, 2, 3, 4, 5, 6, 7))
             SELECT w.qid, w.pred_label, CAST(w.votes AS BIGINT) AS votes,
                    t.true_label,
                    CAST(CASE WHEN w.pred_label = t.true_label
                         THEN 1 ELSE 0 END AS BIGINT) AS hit
             FROM w JOIN t USING (qid) WHERE vr = 1 ORDER BY w.qid"""))

  /** Mixture-enforcing sampler (TextAnalysis.mixtureSample, α=0.5):
    * q_mix_weights' target weights applied as deterministic per-source
    * admission rates. */
  private val sampleMixture = Q("q_sample_mixture",
    (s, dir) => TextAnalysis.mixtureSample(table(s, dir, "documents")),
    Some("""WITH per AS (SELECT source, count(*) AS n_docs,
                                sum(n_chars) AS n_chars
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
                 adm AS (SELECT d.source, count(*) AS n_admitted
                         FROM documents d JOIN r USING (source)
                         WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                                    AS BIGINT) % 100 < floor(rate * 100 + 0.5)
                         GROUP BY 1)
            SELECT r.source, r.rate,
                   CAST(coalesce(adm.n_admitted, 0) AS BIGINT) AS n_admitted
            FROM r LEFT JOIN adm USING (source)
            ORDER BY r.source"""))

  val all: Seq[Q] = Seq(semDedup, tokenEntropy, docNovelty, contamReport,
    ccSizes, knnClassify, sampleMixture)
}
