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
    // materialize the double vector and its index array ONCE per row —
    // expression-level reuse the 16 dot products share (CollapseProject
    // keeps the split because the aliases are referenced many times;
    // inlining them would recompute the casts 2×nBits times per row)
    val withE = embeddings.select(col("vec_id"), vec.as("e"),
      sequence(lit(0), size(vec) - 1).as("idx"))
    // sign(i, j) = +1 if the first hex nibble of md5("i:j") < '8' else -1
    val bits = (0 until nBits).map { i =>
      val proj = aggregate(
        zip_with(col("e"), col("idx"), (x, j) =>
          x * when(substring(md5(concat(lit(s"$i:"), j.cast("string"))), 1, 1) < "8",
            1.0).otherwise(-1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L) * (1L << i)).otherwise(lit(0L))
    }
    withE.select(col("vec_id"), bits.reduce(_ + _).as("bucket"))
  }
}
