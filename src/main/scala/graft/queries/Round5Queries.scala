package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.extensions.{Dedup, TextAnalysis}

/** Round-5 surface: leak-proof cluster-level dataset splitting, per-source
  * dedup survivorship, temperature-based source mixing weights, and
  * per-document text statistics — the corpus-observability and
  * train/eval-hygiene layer over the dedup/quality operators. Same
  * contract as every other row: md5-based hashing, ordered double folds,
  * and rounded outputs so each query carries a bitwise DuckDB oracle. */
object Round5Queries {

  /** Cluster-level train/val/test split (Dedup.splitByCluster): near-dups
    * (same SimHash cluster) always land in the same split. */
  private val splitCluster = Q("q_split_cluster",
    (s, dir) => Dedup.splitByCluster(table(s, dir, "documents")),
    Some(s"""WITH ${ExtensionQueries.simhashCtes},
             cl AS (SELECT d.doc_id,
                           coalesce(s.simhash, d.doc_id) AS cluster
                    FROM documents d LEFT JOIN sh s USING (doc_id))
             SELECT doc_id, cluster,
                    CASE WHEN substr(md5(CAST(cluster AS VARCHAR)), 1, 1) < 'c'
                           THEN 'train'
                         WHEN substr(md5(CAST(cluster AS VARCHAR)), 1, 1) < 'e'
                           THEN 'val'
                         ELSE 'test' END AS split
             FROM cl ORDER BY doc_id"""))

  /** Per-source dedup survivorship — the observability readout a corpus
    * pipeline publishes after near-dup removal: how much of each source
    * survived canonical selection (Dedup.keepCanonical). */
  private val dedupRate = Q("q_dedup_rate",
    (s, dir) => {
      val docs = table(s, dir, "documents")
      Dedup.keepCanonical(docs)
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
        .withColumn("dedup_rate",
          round(lit(1.0) - col("n_kept") * lit(1.0) / col("n_docs"), 4))
    },
    Some(s"""WITH ${ExtensionQueries.simhashCtes},
             j AS (SELECT d.doc_id, d.source, d.n_chars,
                          coalesce(s.simhash, d.doc_id) AS cluster
                   FROM documents d LEFT JOIN sh s USING (doc_id)),
             k AS (SELECT doc_id, source,
                          doc_id = first_value(doc_id) OVER
                            (PARTITION BY cluster
                             ORDER BY n_chars DESC, doc_id) AS kept
                   FROM j)
             SELECT source, count(*) AS n_docs,
                    CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                    round(1.0 - sum(CASE WHEN kept THEN 1 ELSE 0 END) * 1.0
                                / count(*), 4) AS dedup_rate
             FROM k GROUP BY 1 ORDER BY 1"""))

  /** Temperature mixing weights (TextAnalysis.mixingWeights, α = 0.5):
    * sqrt-tempered per-source sampling weights; the normalizing sum is an
    * ordered fold over the source-sorted list in BOTH engines. */
  private val mixWeights = Q("q_mix_weights",
    (s, dir) => TextAnalysis.mixingWeights(table(s, dir, "documents")),
    Some("""WITH per AS (SELECT source, count(*) AS n_docs,
                                sum(n_chars) AS n_chars
                         FROM documents GROUP BY 1),
                 t AS (SELECT source, n_docs,
                              CAST(n_chars AS BIGINT) AS n_chars,
                              sqrt(CAST(n_chars AS DOUBLE)) AS t
                       FROM per),
                 tot AS (SELECT CAST(sum(n_chars) AS BIGINT) AS chars_tot,
                                list_sum(list(t ORDER BY source)) AS t_tot
                         FROM t)
            SELECT source, n_docs, n_chars,
                   round(n_chars * 1.0 / chars_tot, 4) AS share,
                   round(t / t_tot, 4) AS weight
            FROM t, tot ORDER BY source"""))

  /** Per-document surface profile (TextAnalysis.textStats): token count,
    * distinct count, type-token ratio, mean token length. */
  private val textStats = Q("q_text_stats",
    (s, dir) => TextAnalysis.textStats(table(s, dir, "documents")),
    Some("""WITH d AS (SELECT doc_id,
                              list_filter(string_split(lower(coalesce(text, '')), ' '),
                                          t -> t <> '') AS arr
                       FROM documents)
            SELECT doc_id,
                   CAST(len(arr) AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct(arr)) AS BIGINT) AS n_distinct,
                   CASE WHEN len(arr) > 0
                     THEN round(len(list_distinct(arr)) * 1.0 / len(arr), 4)
                   END AS ttr,
                   CASE WHEN len(arr) > 0
                     THEN round(list_sum(list_transform(arr,
                            t -> CAST(length(t) AS DOUBLE))) / len(arr), 4)
                   END AS mean_tok_len
            FROM d ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(splitCluster, dedupRate, mixWeights, textStats)
}
