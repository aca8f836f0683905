package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Df-capped, delta-encoded POSTING LISTS — the inverted-index artifact
  * that accelerates contamination probes and attribution lookups
  * ("which training docs contain this benchmark phrase?") without
  * paying a corpus scan per probe. Terms are word n-grams (the corpus'
  * 31-token unigram vocabulary is degenerate; 3-grams give a 16k–27k
  * term space with df 1–25 across the sf dirs).
  *
  * The cap is the scale contract: a term's posting list is only
  * materialized when df ≤ maxDf — stop-grams keep their df but emit
  * NULL postings (the classic stop-list economics: a term in 10⁹ docs
  * is useless as an index key AND is exactly the list that OOMs a
  * collect_list). Crucially the cap is applied BEFORE any list is
  * built: df comes from a count-only aggregation, the (term, doc)
  * pairs semi-join against the under-cap terms, and only then does the
  * sorted list materialize — the same prune-before-materialize
  * discipline as [[Dedup]]'s df=1 shingle prune. Lists are stored
  * delta-encoded (sorted doc_ids, gaps after the first), the standard
  * index compression that turns monotone ids into small ints.
  *
  * Shuffles: pairs-distinct (term, doc), df count (term), pairs⋈df
  * (term; the df side is already partitioned), final groupBy reuses
  * the join partitioning — 3 exchanges, all key-hashed, none carrying
  * an unbounded value. */
object Postings {

  /** Build the posting-list frame: (term, df, first_doc, last_doc,
    * postings) with postings = comma-joined delta-encoded doc ids,
    * NULL above the cap. */
  def build(documents: DataFrame, n: Int = 3, maxDf: Int = 6): DataFrame = {
    val grams = documents.select(col("doc_id"),
      explode(TextAnalysis.wordNgrams(n)).as("term"))
    val pairs = grams.distinct()
    val df = pairs.groupBy("term").agg(count(lit(1)).as("df"))
    val under = df.filter(col("df") <= maxDf)
    val lists = pairs
      .join(under, Seq("term"))
      .groupBy("term")
      .agg(first(col("df")).as("df"),
        sort_array(collect_list("doc_id")).as("_ids"))
      .select(col("term"), col("df"),
        element_at(col("_ids"), 1).as("first_doc"),
        element_at(col("_ids"), size(col("_ids"))).as("last_doc"),
        concat_ws(",", transform(col("_ids"), (x, i) =>
          when(i === 0, x).otherwise(x - element_at(col("_ids"), i))
            .cast("string"))).as("postings"))
    val capped = df.filter(col("df") > maxDf)
      .select(col("term"), col("df"),
        lit(null).cast("long").as("first_doc"),
        lit(null).cast("long").as("last_doc"),
        lit(null).cast("string").as("postings"))
    lists.unionByName(capped)
  }

  /** Probe the index: exact doc hits for each query phrase (n-gram),
    * resolved entirely from the posting lists — the contamination
    * lookup path. Phrases that hit a capped term return no rows (the
    * caller falls back to the scan path; the NULL is the signal). */
  def probe(index: DataFrame, phrases: Seq[String]): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val q = phrases.toDF("term")
    index.join(broadcast(q), Seq("term"))
      .filter(col("postings").isNotNull)
      .select(col("term"),
        explode(expr(
          """aggregate(split(postings, ','), CAST(array() AS ARRAY<BIGINT>),
               (acc, d) -> array_append(acc,
                 IF(size(acc) = 0, CAST(d AS BIGINT),
                    element_at(acc, size(acc)) + CAST(d AS BIGINT))))"""))
          .as("doc_id"))
  }
}
