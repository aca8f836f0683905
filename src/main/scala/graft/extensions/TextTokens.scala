package graft.extensions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE whitespace token count — the one definition every token-counted
  * operator (sampling weights, mixture budgets, batch padding, quality
  * gates) and every DuckDB oracle twin
  * (`len(list_filter(string_split(lower(coalesce(text,'')),' '),
  * x -> x <> ''))`) must agree on. Centralized because five inline
  * copies had already grown: a drifted variant here silently
  * desynchronizes an operator from its oracle — exactly the
  * cross-engine drift the oracle discipline exists to prevent.
  *
  * NOT this definition (deliberately): [[Packing.packChunks]] /
  * [[Packing.slidingChunks]] split raw text without lowering or
  * dropping empties — their token COORDINATES must match the emitted
  * chunk slices, a different contract from counting. */
object TextTokens {

  /** Count of non-empty whitespace-separated tokens of `text`, as a
    * LONG column. */
  def count: Column =
    size(filter(split(lower(coalesce(col("text"), lit(""))), " "),
      t => t =!= "")).cast("long")
}
