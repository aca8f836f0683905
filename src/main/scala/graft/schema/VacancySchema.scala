package graft.schema

import org.apache.spark.sql.types._

/** The vacancy data model — SURVEY.md §1.
  *
  * Column list and order from the reference's CSV header
  * (get_vacancies.py:75-133, 53 columns); types from the Postgres DDL
  * (feeder_postgres.py:36-96), the system's authoritative type map.
  * Lifecycle columns (added_at/updated_at/removed_at DATE,
  * feeder_postgres.py:92-94) are appended by the SCD merge, not present in
  * raw snapshots.
  *
  * Schema is ALWAYS declared, never inferred (SURVEY §1.3): CSV type
  * fidelity matters — empty string → NULL is an explicit ingest rule
  * (feeder_postgres.py:127-129), and `inferSchema` would both cost an
  * extra pass over 100 TB and guess booleans/timestamps inconsistently.
  */
object VacancySchema {

  /** Raw snapshot schema: everything arrives as strings in CSV; this is
    * the post-coercion type per column. */
  val raw: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("description", StringType),
    StructField("key_skills", StringType), // "\n"-joined array (get_vacancies.py:169)
    StructField("schedule_id", StringType),
    StructField("schedule_name", StringType),
    StructField("accept_handicapped", BooleanType),
    StructField("accept_kids", BooleanType),
    StructField("experience_id", StringType),
    StructField("experience_name", StringType),
    StructField("specializations", StringType), // "\n"-joined (get_vacancies.py:154-156)
    StructField("contacts", StringType),        // "\n"-joined (get_vacancies.py:164-177)
    StructField("billing_type_id", StringType),
    StructField("billing_type_name", StringType),
    StructField("allow_messages", BooleanType),
    StructField("premium", BooleanType),
    StructField("driver_license_types", StringType), // "\n"-joined (get_vacancies.py:182)
    StructField("accept_incomplete_resumes", BooleanType),
    StructField("employer_id", LongType),
    StructField("employer_name", StringType),
    StructField("employer_vacancies_url", StringType),
    StructField("employer_trusted", BooleanType),
    StructField("employer_alternate_url", StringType),
    StructField("employer_industries", StringType), // "\n"-joined (get_vacancies.py:145)
    StructField("response_letter_required", BooleanType),
    StructField("type_id", StringType),
    StructField("type_name", StringType),
    StructField("has_test", BooleanType),
    StructField("response_url", StringType),
    StructField("test_required", BooleanType),
    StructField("salary_from", LongType),
    StructField("salary_to", LongType),
    StructField("salary_gross", BooleanType),
    StructField("salary_currency", StringType),
    StructField("archived", BooleanType),
    StructField("name", StringType),
    StructField("insider_interview", StringType),
    StructField("area_id", IntegerType),
    StructField("area_name", StringType),
    StructField("area_url", StringType),
    StructField("created_at", TimestampType),
    StructField("published_at", TimestampType),
    StructField("address_city", StringType),
    StructField("address_street", StringType),
    StructField("address_building", StringType),
    StructField("address_description", StringType),
    StructField("address_lat", DoubleType),
    StructField("address_lng", DoubleType),
    StructField("alternate_url", StringType),
    StructField("apply_alternate_url", StringType),
    StructField("code", StringType),
    StructField("department_id", StringType),
    StructField("department_name", StringType),
    StructField("employment_id", StringType),
    StructField("employment_name", StringType)))

  /** CSV-side schema: all 53 columns as strings, exactly as they arrive
    * (csv.DictWriter writes strings, get_vacancies.py:224-226). */
  val csv: StructType = StructType(raw.map(f => f.copy(dataType = StringType)))

  /** State-table schema: raw + SCD lifecycle (feeder_postgres.py:92-94). */
  val state: StructType = StructType(raw ++ Seq(
    StructField("added_at", DateType),
    StructField("updated_at", DateType),
    StructField("removed_at", DateType)))

  /** Columns that encode "\n"-joined arrays in the flat model
    * (get_vacancies.py:145,169,176,177,182). */
  val arrayEncodedCols: Seq[String] = Seq(
    "key_skills", "specializations", "contacts",
    "driver_license_types", "employer_industries")

  val booleanCols: Seq[String] = raw.filter(_.dataType == BooleanType).map(_.name)
  val timestampCols: Seq[String] = raw.filter(_.dataType == TimestampType).map(_.name)

  /** The published analytical dataset adds two space-joined NLP token
    * columns (ipynb:715-716 [cell 12]). */
  val analytical: StructType = StructType(raw ++ Seq(
    StructField("prof_classes_found", StringType),
    StructField("terms_found", StringType)))
}
