package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
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

  /** sorted id array → comma-joined gap encoding (first id, then deltas). */
  private def encodeIds(ids: Column): Column =
    concat_ws(",", transform(ids, (x, i) =>
      when(i === 0, x).otherwise(x - element_at(ids, i)).cast("string")))

  /** comma-joined gap encoding → sorted id array (inverse of
    * [[encodeIds]]; running-sum fold). */
  private def decodeIds(postings: Column): Column =
    aggregate(split(postings, ","), array().cast("array<bigint>"),
      (acc, d) => array_append(acc,
        when(size(acc) === 0, d.cast("long"))
          .otherwise(element_at(acc, size(acc)) + d.cast("long"))))

  /** The distinct (doc_id, term) n-gram pair frame — the single input
    * every build/delta leg consumes. Exposed so a MULTI-LEG pipeline
    * (q_postings_compact: base + two deltas over disjoint doc slices)
    * can derive it from the corpus ONCE, checkpoint it, and cut each
    * leg from the materialized pairs with a doc_id predicate — one
    * corpus scan total instead of one per leg (r12 VERDICT #3). */
  def termPairs(documents: DataFrame, n: Int = 3): DataFrame =
    // r20 (guide §2.4): per-doc dedup via array_distinct BEFORE the
    // explode — (doc_id, term) pairs are unique across docs by
    // construction, so the old post-explode `.distinct()` shuffled the
    // whole exploded gram stream to remove only WITHIN-doc repeats a
    // per-row hash set removes for free. Same rows, one exchange fewer
    // in every build/delta/view leg.
    documents.select(col("doc_id"),
      explode(array_distinct(TextAnalysis.wordNgrams(n))).as("term"))

  /** Build the posting-list frame: (term, df, first_doc, last_doc,
    * postings) with postings = comma-joined delta-encoded doc ids,
    * NULL above the cap.
    *
    * The distinct (term, doc) pair frame feeds THREE consumers (the df
    * count, the under-cap list build, the capped residue), so it is
    * materialized once (`materialize`, default on) — the stage boundary
    * a cluster build persists to storage; leaving it lazy re-runs the
    * gram explode + distinct per consumer (measured ~2× build cost on
    * the 3M-term bench corpus). */
  def build(
      documents: DataFrame, n: Int = 3, maxDf: Int = 6,
      materialize: Boolean = true): DataFrame = {
    val pairs0 = termPairs(documents, n)
    val pairs = if (materialize) pairs0.localCheckpoint() else pairs0
    buildFromPairs(pairs, maxDf)
  }

  /** [[build]] from an already-derived [[termPairs]] frame (assumed
    * distinct, and already materialized by the caller if it feeds more
    * than this build). */
  def buildFromPairs(pairs: DataFrame, maxDf: Int = 6): DataFrame = {
    // r20 (guide §2.3/§2.4): ONE aggregation over the pair frame —
    // the bounded [[graft.functions.DfCappedIds]] buffer carries the
    // exact df plus at most maxDf+1 ids, so the old shape's second
    // full exchange of the pairs (the df-count pass followed by the
    // under-cap semi-join feeding a second aggregation) collapses into
    // the single groupBy the build fundamentally needs. The
    // prune-before-materialize contract is unchanged — a stop-term's
    // buffer never exceeds maxDf+1 longs no matter its df — it just
    // lives inside the aggregate instead of across a join.
    val st = udaf(new graft.functions.DfCappedIds(maxDf))
    pairs.groupBy("term").agg(st(col("doc_id")).as("_st"))
      .select(col("term"), col("_st._1").as("df"),
        when(col("_st._1") <= maxDf, sort_array(col("_st._2"))).as("_ids"))
      .select(col("term"), col("df"),
        element_at(col("_ids"), 1).as("first_doc"),
        element_at(col("_ids"), size(col("_ids"))).as("last_doc"),
        when(col("_ids").isNotNull, encodeIds(col("_ids"))).as("postings"))
  }

  /** The fallback [[probe]]'s NULL postings signal points at: resolve
    * phrase hits by re-scanning the corpus (explode + filter + distinct
    * — what every lookup costs WITHOUT the index; priced against the
    * index probe in the scale bench each round). Also the correct path
    * for capped terms, whose lists were deliberately never built. */
  def scanProbe(documents: DataFrame, phrases: Seq[String], n: Int = 3): DataFrame =
    documents
      .select(col("doc_id"), explode(TextAnalysis.wordNgrams(n)).as("term"))
      .filter(col("term").isin(phrases: _*))
      .select("term", "doc_id").distinct()

  /** Probe the index: exact doc hits for each query phrase (n-gram),
    * resolved entirely from the posting lists — the contamination
    * lookup path. Phrases that hit a capped term return no rows (the
    * caller falls back to [[scanProbe]]; the NULL is the signal).
    *
    * The phrase list is a LITERAL `isin`, not a join: an In predicate
    * pushes into the parquet scan, so over an index stored sorted by
    * term ([[graft.plans.Layout.writeSorted]] — how a posting index
    * should live on disk) the probe reads only the row groups whose
    * term min/max straddle a queried phrase. A broadcast join returns
    * the same rows but prunes nothing — the scan-side economics are the
    * whole point of the index (priced vs [[scanProbe]] in the scale
    * bench). */
  def probe(index: DataFrame, phrases: Seq[String]): DataFrame =
    index
      .filter(col("term").isin(phrases: _*) && col("postings").isNotNull)
      .select(col("term"),
        explode(decodeIds(col("postings"))).as("doc_id"))

  /** The complete lookup: [[probe]] the index for every phrase, then
    * [[scanProbe]] the corpus ONLY for phrases whose term is capped
    * (df > maxDf ⇒ NULL postings — the fall-back signal acted on).
    * Returns exactly [[scanProbe]]'s rows for any phrase mix
    * (spec-pinned), at index cost for the common case: the capped
    * phrase set is resolved by one pushed-down index read (a driver
    * list bounded by |phrases|), and the corpus scan runs only when
    * that set is non-empty. A phrase absent from the index entirely
    * appears in no document (the index covers every term), so it needs
    * neither path. */
  def lookup(
      index: DataFrame, documents: DataFrame,
      phrases: Seq[String], n: Int = 3): DataFrame = {
    val capped = index
      .filter(col("term").isin(phrases: _*) && col("postings").isNull)
      .select("term").collect().map(_.getString(0)).toSeq
    val hits = probe(index, phrases)
    if (capped.isEmpty) hits
    else hits.unionByName(scanProbe(documents, capped, n))
  }

  /** INCREMENTAL index maintenance — the upsert set for an arriving
    * batch: one (term, df, first_doc, last_doc, postings) row per term
    * the batch touches, already merged with the term's existing row.
    * [[applyDelta]]-ing these rows into the stored index reproduces
    * [[build]] on the union corpus EXACTLY (spec-pinned), at cost ∝
    * the batch's term set plus one columnar pass over the stored
    * index's term column (the semi-join's probe side; over an index
    * stored BUCKETED by term — [[graft.plans.Layout.writeBucketed]],
    * the StreamingDedup index discipline — that side also exchanges
    * nothing), never a rebuild-side CORPUS scan: the
    * [[Dedup.lshProbe]] discipline applied to the inverted index.
    *
    * Cap transitions are total: a term the batch pushes past maxDf
    * flips to the NULL-postings form (its list is dropped, df kept
    * advancing), and an already-capped term stays capped — a list is
    * never resurrected, matching what build-on-union produces.
    *
    * Contract: batch doc_ids must be NEW (the admission discipline of
    * the streaming dedup family) — re-appending an indexed doc would
    * double-count df. */
  def appendDelta(
      index: DataFrame, newDocuments: DataFrame,
      n: Int = 3, maxDf: Int = 6): DataFrame =
    appendDeltaFromPairs(index, termPairs(newDocuments, n), maxDf)

  /** [[appendDelta]] from an already-derived [[termPairs]] frame for
    * the arriving docs — the multi-leg single-scan entry point
    * ([[buildFromPairs]]'s delta twin). */
  def appendDeltaFromPairs(
      index: DataFrame, newPairs: DataFrame, maxDf: Int = 6): DataFrame = {
    // r20: same bounded single-pass aggregate as [[buildFromPairs]] —
    // a batch term already past maxDf on its own is capped regardless
    // of the stored row, so its ids are never needed and the buffer
    // stays ≤ maxDf+1 longs (the old collect_list was unbounded in the
    // batch's hottest term).
    val st = udaf(new graft.functions.DfCappedIds(maxDf))
    val newAgg = newPairs
      .groupBy("term").agg(st(col("doc_id")).as("_st"))
      .select(col("term"), col("_st._1").as("df_new"),
        when(col("_st._1") <= maxDf, sort_array(col("_st._2"))).as("new_ids"))
    val affectedOld = index
      .join(newAgg.select("term"), Seq("term"), "left_semi")
      .select(col("term"), col("df").as("df_old"),
        when(col("postings").isNotNull, decodeIds(col("postings")))
          .as("old_ids"))
    newAgg.join(affectedOld, Seq("term"), "left_outer")
      .select(col("term"),
        (col("df_new") + coalesce(col("df_old"), lit(0L))).as("df"),
        sort_array(concat(
          coalesce(col("old_ids"), array().cast("array<bigint>")),
          col("new_ids"))).as("_ids"),
        (col("df_new") + coalesce(col("df_old"), lit(0L)) > maxDf)
          .as("_capped"))
      .select(col("term"), col("df"),
        when(!col("_capped"), element_at(col("_ids"), 1)).as("first_doc"),
        when(!col("_capped"), element_at(col("_ids"), size(col("_ids"))))
          .as("last_doc"),
        when(!col("_capped"), encodeIds(col("_ids"))).as("postings"))
  }

  /** Upsert [[appendDelta]]'s rows into an index frame: untouched terms
    * pass through, touched terms are replaced. (With the index stored
    * as a table, this is the overwrite-by-key write the delta is shaped
    * for; the frame form exists for the parity contract and tests.) */
  def applyDelta(index: DataFrame, delta: DataFrame): DataFrame =
    index.join(delta.select("term"), Seq("term"), "left_anti")
      .unionByName(delta)
}
