package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization for embedding search (Jégou, Douze, Schmid,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011) —
  * the MEMORY-scale path of the ANN family: a dim-float vector
  * compresses to `m` one-byte codes (dim·4 → m bytes; 32× at the
  * harness dim 64 / m 8, ksub ≤ 256), which is the difference between
  * an embedding corpus that fits executor memory at 100 TB and one
  * that doesn't. [[Similarity.ivfSearch]] prunes WHICH vectors a query
  * scans (cells); PQ shrinks WHAT each scan touches — production ANN
  * (IVF-PQ) composes both.
  *
  * Train: per subspace j, k-means over the slice — [[KMeans.fit]]'s
  * deterministic Lloyd (lowest-vec_id init), so codebooks, codes, and
  * every ADC score are reproducible run to run. Encode: per subspace,
  * the broadcast [[graft.functions.NearestCell]] argmin — m narrow
  * zero-shuffle projections, no join. Search: asymmetric distance
  * computation (ADC) — the query builds an m×ksub lookup table
  * driver-side (tiny), and each stored code scores as the SUM of m
  * table lookups, one fused HOF fold per row; the corpus' float
  * vectors are never touched. The ADC identity `score(q, code) =
  * ||q − reconstruction(code)||²` (exact, bit-for-bit under
  * per-subspace summation) is spec-pinned; recall@k vs exact brute
  * force is the accuracy contract, priced each round in the bench ann
  * section (the q_minhash_est / ivf_recall discipline: sketches ship
  * with measured error). */
object ProductQuantization {

  /** Per-subspace codebooks: `books(j)(c)` is codeword c of subspace j
    * (ksub × dsub each, codeword index = its cell_id from the
    * deterministic fit). */
  final case class Codebooks(dim: Int, m: Int, books: Array[Array[Array[Double]]]) {
    def dsub: Int = dim / m
    def ksub: Int = books.head.length
  }

  private def subCol(j: Int, dsub: Int): Column =
    expr(s"slice(e, ${j * dsub + 1}, $dsub)")

  /** Learn `m` codebooks of `ksub` codewords each. One [[KMeans.fit]]
    * per subspace (bounded driver state: m × ksub × dsub doubles —
    * the whole codebook is KBs); requires dim % m == 0. */
  def train(embeddings: DataFrame, dim: Int, m: Int, ksub: Int,
      iters: Int = 3): Codebooks = {
    require(m >= 1 && dim % m == 0, s"dim $dim must split into m=$m subspaces")
    val dsub = dim / m
    val e = embeddings.select(col("vec_id"),
      col("embedding").cast("array<double>").as("e"))
    val books = (0 until m).map { j =>
      KMeans.fit(e.select(col("vec_id"), subCol(j, dsub).as("embedding")),
          ksub, iters)
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1).map(_._2)
    }.toArray
    Codebooks(dim, m, books)
  }

  /** Compress every vector to its m-byte code: per subspace, the
    * nearest codeword's id via the broadcast NearestCell argmin — m
    * stateless narrow projections (zero shuffle, zero join; the same
    * streaming-safe shape as [[KMeans.assign]]). Rows with any
    * unassignable subspace (null element, dim mismatch — the -1
    * sentinel) are quarantined out, the assign discipline. */
  def encode(embeddings: DataFrame, cb: Codebooks): DataFrame = {
    val e = embeddings.select(col("vec_id"),
      col("embedding").cast("array<double>").as("e"))
    val coded = (0 until cb.m).foldLeft(e) { (df, j) =>
      graft.functions.NearestCell.nearestCellCol(df,
        cb.books(j).zipWithIndex.map { case (c, i) => (i, c, 0.0) }.toSeq,
        cosine = false, subCol(j, cb.dsub), lit(0.0)) { nearest =>
        df.withColumn(s"_c$j", nearest)
      }
    }
    coded
      .select(col("vec_id"),
        array((0 until cb.m).map(j => col(s"_c$j")): _*).as("code"))
      .filter(!array_contains(col("code"), -1))
  }

  /** Every code's ADC score against `query` — the un-truncated scan
    * behind [[searchAdc]], exposed so the oracle row (q_pq_adc) can pin
    * the full encode→ADC surface per vector, not just a top-k slice.
    * The m×ksub distance table is computed driver-side and inlined (a
    * few KB — small enough that the plan-literal concern of large
    * centroid tables does not apply); scoring is one fused fold of m
    * lookups per row, no vector arithmetic at scan time. Passes the
    * `code` column through for callers that want the codes themselves. */
  def adcScores(codes: DataFrame, cb: Codebooks, query: Array[Double]): DataFrame = {
    require(query.length == cb.dim,
      s"query dim ${query.length} != trained dim ${cb.dim}")
    val table: Seq[Seq[Double]] = (0 until cb.m).map { j =>
      cb.books(j).toSeq.map { c =>
        // strict left-to-right fold — the SquaredL2 order, so the
        // spec's reconstruction identity holds bitwise
        var acc = 0.0
        var i = 0
        while (i < cb.dsub) {
          val d = query(j * cb.dsub + i) - c(i); acc += d * d; i += 1
        }
        acc
      }
    }
    val tbl = typedLit(table)
    val adist = aggregate(sequence(lit(0), lit(cb.m - 1)), lit(0.0),
      (acc, j) => acc +
        element_at(element_at(tbl, j + 1), element_at(col("code"), j + 1) + 1))
    codes.select(col("vec_id"), col("code"), adist.as("adist"))
  }

  /** ADC top-k: squared-L2 ranking of every code against `query`,
    * ascending (smaller = closer), vec_id tie-break. */
  def searchAdc(codes: DataFrame, cb: Codebooks, query: Array[Double],
      kTop: Int): DataFrame =
    adcScores(codes, cb, query)
      .select(col("vec_id"), col("adist"))
      .orderBy(col("adist"), col("vec_id"))
      .limit(kTop)

  /** ADC shortlist + exact re-rank — how PQ search actually ships
    * (Jégou et al. §V): the compressed scan ranks ALL codes cheaply,
    * the top `shortlist` candidates alone are re-scored against their
    * FULL float vectors, and the exact top-k of that shortlist is
    * returned. Quantization error then only costs recall when a true
    * neighbor falls outside the shortlist entirely — the raw-ADC vs
    * re-ranked recall gap is measured per round in the bench ann
    * section. Scale shape: the corpus scan touches m-byte codes only;
    * float vectors are fetched for `shortlist` rows (a broadcast-sized
    * id set), never the corpus. */
  def searchAdcRerank(
      codes: DataFrame,
      embeddings: DataFrame,
      cb: Codebooks,
      query: Array[Double],
      kTop: Int,
      shortlist: Int = 100): DataFrame = {
    graft.functions.GraftFunctions.register(codes.sparkSession)
    val cand = searchAdc(codes, cb, query, shortlist).select("vec_id")
    embeddings
      .join(broadcast(cand), "vec_id")
      .select(col("vec_id"),
        call_function("squared_l2",
          col("embedding").cast("array<double>"),
          typedLit(query.toSeq)).as("d2"))
      .orderBy(col("d2"), col("vec_id"))
      .limit(kTop)
  }

  /** IVF-PQ: the full production ANN composition — coarse cells prune
    * WHICH vectors a query scans ([[Similarity.ivfSearch]]'s
    * partition-pruning shape, L2 metric here to match ADC), PQ codes
    * shrink WHAT the scan touches, and the shortlist re-rank restores
    * exactness within the probed cells. The query picks its `nprobe`
    * nearest coarse centroids DRIVER-SIDE (the centroid table is
    * bounded k×dim — the same collect [[KMeans.fit]] already relies
    * on), candidate codes are the probed cells' rows only (at 100 TB
    * the cell is a partition column and this filter is partition
    * pruning), then [[searchAdc]] + exact re-rank run on that slice.
    * Recall decomposes into the two published contracts: cell recall
    * (ivf_recall_nprobe*) × shortlist recall (pq_recall10_*) — both
    * priced per round in the bench ann section.
    *
    * @param assigned (vec_id, cell_id) coarse assignment, e.g.
    *                 [[KMeans.assign]] output on the same centroids */
  def ivfPqSearch(
      codes: DataFrame,
      assigned: DataFrame,
      embeddings: DataFrame,
      coarseCentroids: DataFrame,
      cb: Codebooks,
      query: Array[Double],
      kTop: Int,
      nprobe: Int,
      shortlist: Int = 100): DataFrame = {
    val cents = coarseCentroids
      .select(col("cell_id").cast("int"), col("centroid").cast("array<double>"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    val probeCells = cents
      .flatMap { case (id, c) =>
        if (c.length != query.length) None
        else {
          var acc = 0.0; var i = 0
          while (i < c.length) { val d = query(i) - c(i); acc += d * d; i += 1 }
          Some((id, acc))
        }
      }
      .sortBy { case (id, d) => (d, id) }
      .take(nprobe).map(_._1).toSeq
    val cand = codes.join(
      assigned.filter(col("cell_id").isin(probeCells: _*)).select("vec_id"),
      "vec_id")
    searchAdcRerank(cand, embeddings, cb, query, kTop, shortlist)
  }

  /** The decompressed vector a code stands for — concatenated
    * codewords. Test/debug surface backing the ADC identity. */
  def reconstruct(code: Seq[Int], cb: Codebooks): Array[Double] =
    (0 until cb.m).flatMap(j => cb.books(j)(code(j))).toArray
}
