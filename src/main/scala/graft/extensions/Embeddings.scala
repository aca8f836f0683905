package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column operators beyond similarity search: normalization,
  * int8 quantization, and random-hyperplane (cosine) LSH bucketing.
  * All row-local narrow projections over `array<float>` — zero shuffle,
  * embarrassingly parallel at any scale. Hashing is md5-derived so every
  * operator has a bitwise DuckDB oracle (the same determinism rule as
  * [[Dedup]]). */
object Embeddings {

  private val vec = transform(col("embedding"), x => x.cast("double"))

  /** L2-normalize: e / ‖e‖; a zero vector has no direction, so it passes
    * through as zeros (coalesce over the divide-by-zero NULL).
    * Values rounded for cross-engine equality. */
  def l2Normalize(embeddings: DataFrame): DataFrame = {
    val nrm = sqrt(aggregate(vec, lit(0.0), (acc, x) => acc + x * x))
    // let-bind the norm (transform over a 1-element wrapper): referenced
    // raw inside the element lambda it would be re-aggregated per
    // element — O(dim²) per row
    embeddings.select(col("vec_id"),
      flatten(transform(array(nrm), n =>
        transform(vec, x =>
          round(coalesce(x / nullif(n, lit(0.0)), lit(0.0)), 6)))).as("unit"))
  }

  /** Symmetric int8 quantization with a per-vector max-abs scale — the
    * 4× storage cut applied before ANN indexing. Returns the scale so
    * dequantization (q * scale / 127) is lossless to quant error. */
  def quantizeInt8(embeddings: DataFrame): DataFrame = {
    val maxAbs = array_max(transform(vec, x => abs(x)))
    embeddings.select(col("vec_id"),
      round(maxAbs, 6).as("scale"),
      // let-bound like l2Normalize: the max-abs scan must not re-run per
      // quantized element
      flatten(transform(array(maxAbs), m =>
        transform(vec, x =>
          round(coalesce(x * 127.0 / nullif(m, lit(0.0)), lit(0.0)))
            .cast("int")))).as("q"))
  }

  /** Random-hyperplane LSH (cosine family): bit i = [e · h_i > 0] with
    * h_i a deterministic ±1 hyperplane derived from md5(i ":" dim). Two
    * vectors agree on a bit with probability 1 − θ/π, so bucket
    * collisions concentrate near-parallel vectors — the embedding-space
    * analogue of [[Dedup.simHash]]. One narrow projection computes all
    * `nBits` projections; the bucket key is the bit-packed long. */
  def hyperplaneLsh(embeddings: DataFrame, nBits: Int = 16): DataFrame = {
    val withE = embeddings.select(col("vec_id"), vec.as("e"))
    // sign(i, j) = +1 if the first hex nibble of md5("i:j") < '8' else -1.
    // The ±1 matrix is data-independent, so it is computed ONCE in a
    // 1-row frame and broadcast — deriving it inline re-ran
    // nBits × dim md5 calls per ROW (~10M md5s and 2.9 s at sf0.1;
    // 0.3 s with the broadcast matrix, identical buckets).
    val signs = embeddings.agg(max(size(vec)).as("d"))
      .select(transform(sequence(lit(0), lit(nBits - 1)), i =>
        transform(sequence(lit(0), col("d") - 1), j =>
          when(substring(md5(concat(i.cast("string"), lit(":"),
            j.cast("string"))), 1, 1) < "8", 1.0).otherwise(-1.0)))
        .as("signs"))
    val bits = (0 until nBits).map { i =>
      // slice to the row's own dims: ragged rows keep their old behavior
      val proj = aggregate(
        zip_with(col("e"),
          slice(element_at(col("signs"), i + 1), lit(1), size(col("e"))),
          (x, s) => x * s),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L) * (1L << i)).otherwise(lit(0L))
    }
    withE.crossJoin(broadcast(signs))
      .select(col("vec_id"), bits.reduce(_ + _).as("bucket"))
  }
}
