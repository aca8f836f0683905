package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Span-corruption training-example generation — the T5/UL2 denoising
  * objective's data side (Raffel et al. 2020 §3.1.4; Tay et al. 2022):
  * each document's token stream is cut into fixed-length windows, a
  * deterministic hash coin masks ~25% of them, and the doc becomes an
  * (input, target) pair — the input keeps unmasked windows and replaces
  * each masked window with an ordinal sentinel `<extra_id_j>`; the
  * target lists each sentinel followed by the tokens it hides. A
  * trainer consumes the pair frame directly (typically after
  * [[Packing.packChunks]]).
  *
  * Determinism is the point: the coin is md5(doc_id ":" window_idx)
  * first hex < `maskHexBound`, so regeneration — any engine, any
  * partitioning, any epoch — produces byte-identical examples, and the
  * sentinel numbering (j = count of masked windows before this one) is
  * a pure function of the doc. No randomness, no state.
  *
  * Scale shape: one narrow projection per document — token split,
  * window flags, two array folds — zero shuffles, embarrassingly
  * parallel, whole-stage-codegen'd HOFs end to end. The sentinel
  * prefix-count is O(windows²) per doc via slice+filter, bounded by
  * (doc tokens / windowLen)² — trivially small for token-bounded docs
  * and still linearizable per-partition if a corpus ever needed it. */
object SpanCorrupt {

  /** (doc_id, n_tok, n_windows, n_masked, input_text, target_text).
    * `maskHexBound` "4" masks hex first-chars 0–3 → expected 25%
    * corruption; windows shorter than `windowLen` (the tail) mask like
    * any other. Empty docs yield empty input/target. */
  def corrupt(
      documents: DataFrame,
      windowLen: Int = 8,
      maskHexBound: String = "4"): DataFrame = {
    val L = windowLen
    require(L > 0, s"windowLen must be positive: $L")
    val arrSql =
      "filter(split(lower(coalesce(text, '')), ' '), x -> x != '')"
    val flagsSql =
      s"""CASE WHEN size(arr) = 0 THEN CAST(array() AS ARRAY<BOOLEAN>)
          ELSE transform(sequence(0, ((size(arr) + ${L - 1}) div $L) - 1),
            i -> substring(md5(CAST(concat(CAST(doc_id AS STRING), ':',
                   CAST(i AS STRING)) AS BINARY)), 1, 1) < '$maskHexBound')
          END"""
    // sentinel ordinal = masked windows BEFORE window i
    val jSql = "size(filter(slice(flags, 1, i), f -> f))"
    val spanSql = s"array_join(slice(arr, i * $L + 1, $L), ' ')"
    val inputSql =
      s"""CASE WHEN size(flags) = 0 THEN ''
          ELSE array_join(transform(sequence(0, size(flags) - 1),
            i -> CASE WHEN element_at(flags, i + 1)
                 THEN concat('<extra_id_', CAST($jSql AS STRING), '>')
                 ELSE $spanSql END), ' ')
          END"""
    val targetSql =
      s"""CASE WHEN size(flags) = 0 THEN ''
          ELSE array_join(transform(
            filter(sequence(0, size(flags) - 1),
              i -> element_at(flags, i + 1)),
            i -> concat('<extra_id_', CAST($jSql AS STRING), '> ',
              $spanSql)), ' ')
          END"""
    documents
      .select(col("doc_id"), expr(arrSql).as("arr"))
      .select(col("doc_id"), col("arr"), expr(flagsSql).as("flags"))
      .select(col("doc_id"),
        size(col("arr")).cast("long").as("n_tok"),
        size(col("flags")).cast("long").as("n_windows"),
        expr("size(filter(flags, f -> f))").cast("long").as("n_masked"),
        expr(inputSql).as("input_text"),
        expr(targetSql).as("target_text"))
  }
}
