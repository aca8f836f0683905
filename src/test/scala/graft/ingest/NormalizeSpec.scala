package graft.ingest

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.schema.VacancySchema

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("emptyToNull: blank and whitespace-only become NULL, content survives") {
    val out = Seq("", "  ", "x", " x ").toDF("c")
      .select(Normalize.emptyToNull($"c")).as[String].collect()
    assert(out.toSeq == Seq(null, null, "x", " x "))
  }

  test("parseTsStripTz strips the offset instead of converting (ref :124-125)") {
    val out = Seq("2021-03-01T12:00:00+0300", "2021-03-01T12:00:00")
      .toDF("c").select(date_format(Normalize.parseTsStripTz($"c"), "yyyy-MM-dd HH:mm:ss"))
      .as[String].collect()
    // +0300 is DROPPED: both parse to 12:00, not 09:00
    assert(out.toSeq == Seq("2021-03-01 12:00:00", "2021-03-01 12:00:00"))
  }

  test("parseBool: case-insensitive 'true', null-preserving") {
    val out = Seq("True", "true", "False", "nope", null).toDF("c")
      .select(Normalize.parseBool($"c")).collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0))
    assert(out.toSeq == Seq(true, true, false, false, null))
  }

  test("liftArray: newline-joined lifts to array, null stays null (not [])") {
    val out = Seq("a\nb", "solo", null).toDF("c")
      .select(Normalize.liftArray($"c")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getSeq[String](0))
    assert(out(0) == Seq("a", "b"))
    assert(out(1) == Seq("solo"))
    assert(out(2) == null)
  }

  test("conformSnapshot: drifted frames project onto the canonical shape") {
    val drifted = Seq(("7", "dev", "surprise")).toDF("id", "name", "unknown_col")
    val conformed = Normalize.conformSnapshot(drifted)
    assert(conformed.columns.toSeq == VacancySchema.csv.map(_.name))
    val typed = Normalize.normalizeSnapshot(conformed)
    val r = typed.head()
    assert(r.getAs[Long]("id") == 7L)
    assert(r.getAs[String]("name") == "dev")
    assert(r.isNullAt(typed.schema.fieldIndex("salary_from")))
  }

  test("normalizeSnapshot: full 53-col string frame → typed frame") {
    val values = VacancySchema.csv.map { f =>
      f.name match {
        case "id" => "42"
        case "archived" => "False"
        case "premium" => "True"
        case "salary_from" => ""
        case "salary_to" => "100000"
        case "area_id" => "1"
        case "address_lat" => "56.83"
        case "created_at" => "2021-03-01T12:00:00+0300"
        case "published_at" => ""
        case "key_skills" => "python\nsql"
        case _ => s"v_${f.name}"
      }
    }
    val df = spark.createDataFrame(
      java.util.List.of(Row.fromSeq(values)), VacancySchema.csv)
    val typed = Normalize.normalizeSnapshot(df)
    assert(typed.schema.map(f => (f.name, f.dataType)) ==
      VacancySchema.raw.map(f => (f.name, f.dataType)))
    val r = typed.head()
    assert(r.getAs[Long]("id") == 42L)
    assert(!r.getAs[Boolean]("archived"))
    assert(r.getAs[Boolean]("premium"))
    assert(r.isNullAt(typed.schema.fieldIndex("salary_from")))
    // malformed non-key numeric degrades to NULL via try_cast
    assert(r.isNullAt(typed.schema.fieldIndex("employer_id")))
    assert(r.getAs[Long]("salary_to") == 100000L)
    assert(r.getAs[Double]("address_lat") == 56.83)
    assert(r.isNullAt(typed.schema.fieldIndex("published_at")))

    val arr = Normalize.withArrays(typed)
    assert(arr.select("key_skills").head().getSeq[String](0) == Seq("python", "sql"))
    val roundtrip = Normalize.withJoinedArrays(arr)
    assert(roundtrip.select("key_skills").as[String].head() == "python\nsql")
  }
}
