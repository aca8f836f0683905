package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03)
  * — the rolling-hash fingerprinting layer of the training-data pipeline
  * (SURVEY.md §7.1 step 7 "document fingerprinting").
  *
  * Semantics: hash every word k-gram of a document, slide a window of
  * `w` consecutive gram hashes, and keep the minimum hash of each
  * window. The selected set is the document's fingerprint: any shared
  * substring of at least k + w - 1 tokens is guaranteed to contribute at
  * least one common fingerprint to both documents (the paper's coverage
  * guarantee), while only ~2/(w+1) of all gram hashes are retained.
  *
  * That 1/w-style density is the scale story vs the full inverted index
  * of [[Dedup.ngramJaccard]]: the candidate join in [[sharedFingerprintPairs]]
  * shuffles a winnowed index that is a fraction of the full shingle
  * index, with the same "shared long substring ⇒ candidate pair"
  * recall contract. Reference analog: the dedup the reference performs
  * row-at-a-time in SQL (`feeder_postgres.py` upsert on content hash) is
  * subsumed by exact dedup; winnowing is the substring-robust upgrade.
  *
  * Everything is narrow per-document work — split, gram, hash, window
  * min, distinct — one projection, zero shuffles, entirely inside
  * whole-stage codegen via higher-order functions. The per-window scan
  * is O(n·w) per doc instead of the deque-based O(n); for w ≤ 8 the
  * constant is tiny and the expression stays declarative (and therefore
  * DuckDB-oracle-expressible: q_winnow / q_winnow_pairs).
  *
  * Hashes are the first 8 hex chars of md5 (32-bit values in a long),
  * the same engine-portable idiom as [[TextAnalysis.stratifiedSample]].
  */
object Winnowing {

  /** Per-gram 32-bit rolling hashes of the k-gram stream, in document
    * order: array<long> per doc. */
  private def gramHashes(k: Int): Column =
    // r20 (guide §1.2 step 2): first 8 hex chars of md5 == the first
    // 32-bit lane of the native Md5Lanes digest, bit-for-bit (lane i =
    // hex chars [8i, 8i+8) — Md5LanesSpec) — one digest per gram, no
    // 32-char hex string, no radix parse, in the per-gram inner loop
    // of every fingerprint build. Callers register the function
    // (every public entry point below does; graft-built sessions carry
    // it via GraftExtensions anyway).
    transform(TextAnalysis.wordNgrams(k),
      g => element_at(call_function("md5_lanes", g), 1))

  /** The winnowed fingerprint set: sorted distinct window minima.
    * Documents shorter than one window keep the min of what they have
    * (the paper's boundary case: one window covering the whole doc);
    * empty docs fingerprint to the empty set.
    *
    * The hash array is LET-BOUND via a single-element `transform` lambda
    * (the wordNgrams idiom): every window's `slice` references the
    * lambda variable, which evaluates once per row. Inlining `hashes`
    * directly — even via `withColumn`, which CollapseProject undoes —
    * re-executes the full gram+md5 pipeline per WINDOW position,
    * quadratic in document length (measured: 40 s → 1.4 s for the
    * sf0.1 pair query).
    *
    * COST BOUND: each window takes its min over a w-slice, so the build
    * is O(n·w) per document — declarative, narrow, and the right trade
    * for the small windows winnowing uses in practice (w ≤ 8; the
    * SIGMOD'03 guarantee degrades fast beyond that). A deque-style O(n)
    * sliding minimum needs an order-preserving stateful fold that Spark
    * SQL's HOFs cannot express without a per-row UDF; revisit only if a
    * w > 8 use-case appears — at w = 4 the O(n·w) form wins on codegen
    * alone. */
  private def winnowedSet(hashes: Column, w: Int): Column =
    array_sort(array_distinct(flatten(transform(array(hashes), h => {
      val nWin = size(h) - (w - 1)
      when(size(h) === 0, array().cast("array<bigint>"))
        .when(nWin <= 0, array(array_min(h)))
        .otherwise(transform(sequence(lit(1), nWin),
          i => array_min(slice(h, i, lit(w)))))
    }))))

  /** Fingerprint summary per document: gram count, fingerprint count,
    * selection density, and an md5 digest of the ordered fingerprint set
    * (the value a 100 TB index would store per doc for cheap equality /
    * containment probes). Scalar columns only, so the row is
    * driver-hash-verifiable. */
  def fingerprints(documents: DataFrame, k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")
    graft.functions.GraftFunctions.register(documents.sparkSession)
    // every output field is computed inside ONE lambda scope (h and f
    // are lambda variables, so their 2-3 references cost nothing), and
    // the whole struct reaches the final projection through a
    // single-element explode: Generate is a projection barrier, so
    // CollapseProject cannot re-inline the struct into the four field
    // extracts and re-evaluate the pipeline per column
    val summary = transform(array(gramHashes(k)), h =>
      element_at(transform(array(winnowedSet(h, w)), f =>
        struct(
          size(h).cast("bigint").as("n_grams"),
          size(f).cast("bigint").as("n_fps"),
          when(size(h) > 0,
            round(size(f) / size(h).cast("double"), 4)).as("density"),
          md5(concat_ws(" ",
            transform(f, x => x.cast("string"))).cast("binary"))
            .as("fp_digest"))), 1))
    documents
      .select(col("doc_id"), explode(summary).as("s"))
      .select(col("doc_id"), col("s.n_grams").as("n_grams"),
        col("s.n_fps").as("n_fps"), col("s.density").as("density"),
        col("s.fp_digest").as("fp_digest"))
  }

  /** The exploded (doc_id, fp) winnowed inverted index — the frame a
    * pipeline persists between stages. It feeds BOTH sides of the
    * candidate self-join; without a stage boundary Spark recomputes the
    * winnow build per side, so it is memoized like the shingle and
    * signature frames ([[Dedup.sharedFrame]]: one build, localCheckpoint,
    * session-evicted, `spark.graft.dedup.shareFrames` opt-out). */
  def index(documents: DataFrame, k: Int = 3, w: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    Dedup.sharedFrame(documents, "winnow_idx", k, w)(
      documents
        .withColumn("fps", winnowedSet(gramHashes(k), w))
        .select(col("doc_id"), explode(col("fps")).as("fp")))
  }

  /** Distinct (doc_id, s) k-gram frame under the WINNOW normalization
    * (lowercased, empty-token-filtered [[TextAnalysis.wordNgrams]]) —
    * the exact-side twin of the fingerprint build, memoized like
    * [[index]]. NOT [[Dedup.shingles]]: that frame is raw case-sensitive
    * trigrams, a different gram definition — mixing the two made
    * [[resemblanceEstimate]]'s exact column disagree with its estimate
    * (and its oracle) on any corpus with case or whitespace variance,
    * and silently ignored `k`. */
  def grams(documents: DataFrame, k: Int = 3): DataFrame =
    Dedup.sharedFrame(documents, "winnow_grams", k)(
      documents.select(col("doc_id"),
        explode(array_distinct(TextAnalysis.wordNgrams(k))).as("s")))

  /** MOSS-style candidate pairs: documents sharing >= `minShared`
    * winnowed fingerprints, via an inverted-index equi-join on the
    * fingerprint value — the same banded shape as [[Dedup.ngramJaccard]]'s
    * candidate join but over the ~2/(w+1)-dense winnowed index, so the
    * index shuffle shrinks by the same factor.
    *
    * `maxDf` is the hot-key lever, and here it is MORE load-bearing than
    * in the plain inverted index: winnowing's window-min selection is
    * biased toward globally SMALL hash values, so a common gram that
    * hashes low gets selected in nearly every document containing it —
    * min-selection CONCENTRATES document frequency onto few fingerprints
    * instead of spreading it. Measured at sf0.1 (low-entropy corpus,
    * ~40-token vocabulary): the uncapped self-join took 84 s where
    * maxDf=20 runs in well under a second with the same resolution on
    * non-hot pairs. Hence the default is ON; `maxDf=None` is the exact
    * mode for high-entropy corpora. Semantics of capping are the
    * standard ones ([[Dedup.ngramJaccard]]): only pairs whose ONLY
    * shared fingerprints are stop-fingerprints can be missed. */
  def sharedFingerprintPairs(
      documents: DataFrame,
      k: Int = 3,
      w: Int = 4,
      minShared: Int = 2,
      maxDf: Option[Int] = Some(20)): DataFrame = {
    candidatePairs(cappedIndex(index(documents, k, w), maxDf), minShared)
  }

  private def cappedIndex(idx: DataFrame, maxDf: Option[Int]): DataFrame =
    maxDf match {
      case None => idx
      case Some(cap) =>
        val byFp = org.apache.spark.sql.expressions.Window.partitionBy("fp")
        idx.withColumn("df", count(lit(1)).over(byFp))
          .filter(col("df") <= cap).select("doc_id", "fp")
    }

  private def candidatePairs(idx: DataFrame, minShared: Int): DataFrame =
    idx.alias("a")
      .join(idx.alias("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)

  /** Winnowing accuracy contract — the [[Dedup.jaccardEstimate]]
    * discipline applied to the winnowed sketch: for every candidate
    * pair, the resemblance ESTIMATED from the (df-capped) winnowed
    * fingerprint sets next to the EXACT distinct-k-gram Jaccard. The
    * estimate column is what a 100 TB pipeline acts on (it only has the
    * winnowed index); the exact column is computable only for the
    * candidate pairs (tiny, candidate-driven join — never the co-gram
    * self-join), so the comparison itself stays scale-safe. Publishing
    * est vs exact per pair is the measurement that justifies both the
    * 1/w index reduction AND the maxDf cap. */
  def resemblanceEstimate(
      documents: DataFrame,
      k: Int = 3,
      w: Int = 4,
      minShared: Int = 2,
      maxDf: Option[Int] = Some(20)): DataFrame = {
    val idx = cappedIndex(index(documents, k, w), maxDf)
    val pairs = candidatePairs(idx, minShared)
    val nf = idx.groupBy("doc_id").agg(count(lit(1)).as("nf"))
    val sh = grams(documents, k) // memoized, SAME gram definition as idx
    val ns = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // exact |∩| candidate-driven, linear in |pairs| × grams-per-doc; a
    // 32-bit fingerprint collision can make a pair share fps but no
    // gram, hence the left join + coalesce instead of an inner join
    val inter = pairs.select("doc_a", "doc_b")
      .join(sh.select(col("doc_id").as("doc_a"), col("s")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("s")), Seq("doc_b", "s"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
    val i = coalesce(col("i"), lit(0L))
    pairs
      .join(nf.select(col("doc_id").as("doc_a"), col("nf").as("nfa")), "doc_a")
      .join(nf.select(col("doc_id").as("doc_b"), col("nf").as("nfb")), "doc_b")
      .join(ns.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(ns.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        round(col("n_shared") * lit(1.0) /
          (col("nfa") + col("nfb") - col("n_shared")), 4).as("est_jac"),
        round(i * lit(1.0) / (col("na") + col("nb") - i), 4).as("exact_jac"))
  }
}
