package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schema.VacancySchema

/** Ingest normalization pack — SURVEY.md §7.1 step 2.
  *
  * Replicates the reference's per-row Python coercions
  * (feeder_postgres.py:123-131) as vectorized, codegen'd column
  * expressions — the whole pack is a single narrow projection over the
  * scan, so at 100 TB it costs nothing beyond the read itself.
  */
object Normalize {

  /** Empty/blank string → NULL, the reference's falsy-cell rule
    * (`if not csv_row[k]: csv_row[k] = None`, feeder_postgres.py:127-129). */
  def emptyToNull(c: Column): Column =
    when(length(trim(c)) === 0, lit(null)).otherwise(c)

  /** ISO-8601 timestamp with the tz offset STRIPPED, not converted —
    * `datetime.fromisoformat(ts.split("+")[0])` (feeder_postgres.py:124-125).
    * "2021-03-01T12:00:00+0300" parses as 12:00 naive/session time. */
  def parseTsStripTz(c: Column): Column =
    to_timestamp(element_at(split(c, "\\+"), 1), "yyyy-MM-dd'T'HH:mm:ss")

  /** `"True"/"true"` string → boolean (feeder_postgres.py:131). */
  def parseBool(c: Column): Column =
    when(c.isNull, lit(null).cast(BooleanType)).otherwise(lower(c) === "true")

  /** "\n"-joined cell → ArrayType(StringType) (get_vacancies.py:169,...);
    * NULL stays NULL, never an empty array, to preserve the reference's
    * None-vs-'' distinction (SURVEY §7.4). */
  def liftArray(c: Column, sep: String = "\n"): Column =
    when(c.isNull, lit(null).cast(ArrayType(StringType))).otherwise(split(c, sep))

  /** Schema-drift conformance: project any all-strings frame onto the
    * canonical 53-column CSV shape — missing columns become NULL, extra
    * columns drop, order normalizes. The reference pins its header list
    * in code (get_vacancies.py:75-133) and would crash on drift; a
    * 100 TB backfill over years of scraped snapshots cannot afford to. */
  def conformSnapshot(csvFrame: DataFrame): DataFrame = {
    val present = csvFrame.columns.toSet
    csvFrame.select(VacancySchema.csv.map { f =>
      if (present(f.name)) col(f.name)
      else lit(null).cast(StringType).as(f.name)
    }: _*)
  }

  /** Full normalization of an all-strings snapshot frame
    * ([[VacancySchema.csv]]) into the typed [[VacancySchema.raw]] shape:
    * blank→NULL on every column, then per-type coercion.
    *
    * The PK `id` casts STRICTLY (a malformed id must fail loudly, like the
    * reference's `int(csv_row["id"])`, feeder_postgres.py:123); every other
    * numeric uses try_cast so one malformed cell in 100 TB degrades to
    * NULL instead of killing the job. */
  def normalizeSnapshot(csvFrame: DataFrame): DataFrame = {
    val cols = VacancySchema.raw.map { f =>
      val cleaned = emptyToNull(col(f.name))
      val typed = f.dataType match {
        case BooleanType => parseBool(cleaned)
        case TimestampType => parseTsStripTz(cleaned)
        case LongType if f.name == "id" => cleaned.cast(LongType)
        case LongType | IntegerType | DoubleType => cleaned.try_cast(f.dataType)
        case _ => cleaned
      }
      typed.as(f.name)
    }
    csvFrame.select(cols: _*)
  }

  /** Typed frame with the array-encoded columns lifted to real arrays —
    * the idiomatic analytical shape (SURVEY §1.1). */
  def withArrays(typed: DataFrame): DataFrame =
    VacancySchema.arrayEncodedCols.foldLeft(typed)((df, c) =>
      df.withColumn(c, liftArray(col(c))))

  /** Inverse of [[withArrays]] for CSV export (`concat_ws`, SURVEY §1.1). */
  def withJoinedArrays(arrayFrame: DataFrame): DataFrame =
    VacancySchema.arrayEncodedCols.foldLeft(arrayFrame)((df, c) =>
      df.withColumn(c, when(col(c).isNull, lit(null).cast(StringType))
        .otherwise(concat_ws("\n", col(c)))))
}
