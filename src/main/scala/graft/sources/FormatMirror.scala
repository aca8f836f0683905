package graft.sources

import org.apache.spark.sql.DataFrame

/** Format interchange with VERIFIED fidelity — the migration/export
  * path of the engine's source/sink family: mirror a table to another
  * format (ORC for columnar interchange, JSON-lines for text-pipeline
  * handoff — both in-box Spark sources; no Avro connector ships in
  * this harness) and PROVE the round trip, rather than assuming the
  * writer/reader pair is lossless. The check is the one a real
  * migration runs before cutover: exceptAll in BOTH directions, so
  * dropped rows, duplicated rows, and any value-level mutation
  * (encoding, precision, null handling) all surface as a nonzero
  * count — a single-direction or count-only compare misses
  * duplications and value drift.
  *
  * Reads always re-apply the SOURCE schema: JSON inference would
  * widen/retype (longs to bigints is fine, but binary columns land as
  * base64 STRINGS and timestamps as strings), which reads as data
  * corruption when it is only schema loss — with the explicit schema,
  * Spark's JSON reader base64-decodes binary and parses timestamps
  * back, and the round trip is exact (FormatMirrorSpec pins it on
  * arrays, binary payloads, timestamps, decimals and negative zero).
  *
  * Scale shape: the mirror is one write; the verification is two
  * exceptAll anti-joins — shuffles on the full row hash, the same cost
  * class as the dedup family, linear in the table. */
object FormatMirror {

  /** JSON defaults that make the text round trip lossless: Spark's
    * default JSON timestampFormat writes MILLISECONDS, silently
    * truncating micros-precision values (surfaced by this operator's
    * own diff check during development — the exact class of quiet
    * mutation it exists to catch); micros in the pattern preserves
    * them on both sides. */
  private val losslessOptions: Map[String, Map[String, String]] = Map(
    "json" -> Map("timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"))

  /** Mirror `df` to `path` as `format` (overwrite), with the format's
    * lossless option pack applied. */
  def mirror(df: DataFrame, path: String, format: String): Unit =
    df.write.format(format)
      .options(losslessOptions.getOrElse(format, Map.empty))
      .mode("overwrite").save(path)

  /** Read a mirror back under the EXPLICIT source schema (see object
    * scaladoc — inference loses binary/timestamp typing on text
    * formats) and the matching lossless options. */
  def readMirror(df: DataFrame, path: String, format: String): DataFrame =
    df.sparkSession.read.schema(df.schema)
      .options(losslessOptions.getOrElse(format, Map.empty))
      .format(format).load(path)

  /** Mirror + verify: (rows in source missing from the mirror, rows in
    * the mirror missing from the source) — (0, 0) is a proven-lossless
    * round trip; anything else names the failure direction.
    * Multiplicity-aware (exceptAll, not except): a writer that
    * duplicates rows fails the second count. */
  def roundTripDiff(df: DataFrame, path: String, format: String): (Long, Long) = {
    mirror(df, path, format)
    val back = readMirror(df, path, format)
    (df.exceptAll(back).count(), back.exceptAll(df).count())
  }
}
