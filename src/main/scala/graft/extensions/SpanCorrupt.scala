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
  * window flags, one prefix-sum fold, two array transforms — zero
  * shuffles, embarrassingly parallel, whole-stage-codegen'd HOFs end
  * to end. The sentinel ordinal comes from ONE aggregate fold over the
  * flags (js[i] = masked windows before window i, O(windows) fold
  * steps per doc), so both transforms read it as an O(1) element_at —
  * the per-window slice+filter prefix count this replaced re-scanned
  * the flag prefix per window (O(windows²) per doc, r18 VERDICT #4). */
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
    // sentinel ordinal = masked windows BEFORE window i, as ONE
    // prefix-sum fold (js has size(flags)+1 entries; js[i+1] in
    // element_at's 1-based indexing = masked count before window i)
    val jsSql =
      """aggregate(flags, array(0),
         (acc, f) -> array_append(acc, element_at(acc, -1) + IF(f, 1, 0)))"""
    val jSql = "element_at(js, i + 1)"
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
      .select(col("doc_id"), col("arr"), col("flags"),
        expr(jsSql).as("js"))
      .select(col("doc_id"),
        size(col("arr")).cast("long").as("n_tok"),
        size(col("flags")).cast("long").as("n_windows"),
        expr("size(filter(flags, f -> f))").cast("long").as("n_masked"),
        expr(inputSql).as("input_text"),
        expr(targetSql).as("target_text"))
  }
}
