package graft.queries

import graft.Tables.table
import graft.extensions.{Similarity, TextAnalysis}

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
    (s, dir) => Similarity.semDedup(table(s, dir, "embeddings"), tau = 0.3)
      .orderBy("label"),
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
    (s, dir) => TextAnalysis.tokenEntropy(table(s, dir, "documents"))
      .orderBy("doc_id"),
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
    (s, dir) => TextAnalysis.docNovelty(table(s, dir, "documents"))
      .orderBy("doc_id"),
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

  val all: Seq[Q] = Seq(semDedup, tokenEntropy, docNovelty)
}
