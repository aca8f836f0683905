package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.analytics.TermFrequency
import graft.ingest.Normalize
import graft.merge.ScdMerge
import graft.schema.VacancySchema

/** SURVEY §5.4: end-to-end fixture run — synthetic weekly vacancy CSV
  * snapshots through ingest → SCD merge → flagship analytics against
  * hand-computed goldens, mirroring the reference pipeline
  * (scraper CSV → feeder merge → notebook analytics). */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  /** Build an all-strings snapshot row in CSV column order. */
  private def csvRow(
      id: String, name: String, archived: String,
      skills: String, published: String): Row =
    Row.fromSeq(VacancySchema.csv.map(_.name match {
      case "id" => id
      case "name" => name
      case "archived" => archived
      case "key_skills" => skills
      case "published_at" => published
      case "created_at" => published
      case "salary_from" => "100000"
      case "area_name" => "Екатеринбург"
      case b if VacancySchema.booleanCols.contains(b) => "False"
      case _ => ""
    }))

  private def snapshot(rows: Row*): DataFrame =
    Normalize.normalizeSnapshot(spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), VacancySchema.csv))

  private val tracked = VacancySchema.raw.map(_.name).filterNot(_ == "id")

  test("registry invariant: every query carries an oracle (no silent rows-only rows)") {
    // round-2 lesson: a query without an oracle (or with an output the
    // driver's checker cannot hash) degrades to a weak row unnoticed.
    // Pin the contract: the two maps carry exactly the same keys.
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet,
      s"queries without oracle: ${SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet}; " +
        s"oracles without query: ${SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet}")
  }

  test("weekly snapshots → normalize → merge → term analytics") {
    // week 1: two live vacancies, one archived (must be skipped as deleted)
    val w1 = snapshot(
      csvRow("1", "python dev", "False", "python\nsql", "2021-01-01T09:00:00+0500"),
      csvRow("2", "java dev", "False", "java\nsql", "2021-01-01T10:00:00+0500"),
      csvRow("3", "ghost", "True", "cobol", "2021-01-01T11:00:00+0500"))
    // week 2: vacancy 1 updated (new skill set), vacancy 2 gone, 4 appears
    val w2 = snapshot(
      csvRow("1", "python dev", "False", "python\nspark", "2021-01-01T09:00:00+0500"),
      csvRow("4", "go dev", "False", "go", "2021-01-08T12:00:00+0500"))

    val s1 = ScdMerge.applySnapshot(
      ScdMerge.emptyState(ScdMerge.dropArchived(w1)),
      ScdMerge.dropArchived(w1), "2021-01-01", "id", tracked)
    assert(s1.count() == 2) // archived row 3 never entered

    ScdMerge.assertNotLate(s1, ScdMerge.dropArchived(w2), "2021-01-08", "id")
    val s2 = ScdMerge.applySnapshot(
      s1, ScdMerge.dropArchived(w2), "2021-01-08", "id", tracked)

    val life = s2.select($"id",
        date_format($"added_at", "yyyy-MM-dd"),
        date_format($"updated_at", "yyyy-MM-dd"),
        date_format($"removed_at", "yyyy-MM-dd"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getString(3)))).toMap
    assert(life(1L) == (("2021-01-01", "2021-01-08", null))) // updated
    assert(life(2L) == (("2021-01-01", "2021-01-01", "2021-01-08"))) // removed
    assert(life(4L) == (("2021-01-08", "2021-01-08", null))) // added

    // timestamps kept tz-stripped: 09:00, not 04:00 UTC
    val ts = s2.filter($"id" === 1)
      .select(date_format($"published_at", "HH:mm")).as[String].head()
    assert(ts == "09:00")

    // merge stats match the transition classification
    val stats = ScdMerge.classify(s1, ScdMerge.dropArchived(w2), "2021-01-08", "id", tracked)
      .groupBy("change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats == Map("updated" -> 1L, "removed" -> 1L, "added" -> 1L))

    // flagship analytics over the CURRENT state (live rows), on the
    // newline-array skills column: explode → count → topK
    val live = s2.filter($"removed_at".isNull)
      .withColumn("skills", concat_ws(" ", Normalize.liftArray($"key_skills")))
    val counts = TermFrequency.counts(
      TermFrequency.tokenize(live, "skills", " ", Seq()), Seq())
    val m = counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("python" -> 1L, "spark" -> 1L, "go" -> 1L))
  }

  test("analytical dataset columns flow through the synonym pipeline") {
    graft.functions.GraftFunctions.register(spark)
    val analytical = Seq(
      (2020, "программист", "py sql"),
      (2020, "программист", "python"),
      (2020, "тестировщик", "py")).toDF("year", "prof_classes_found", "terms_found")
    val dict = typedlit(Map("py" -> "python", "python" -> "python", "sql" -> "sql"))
    val canon = TermFrequency.tokenize(
        analytical.filter(array_contains(split($"prof_classes_found", " "), "программист")),
        "terms_found", " ", Seq("year"))
      .select($"year", call_function("synonym_lookup", $"token", dict).as("token"))
      .filter($"token".isNotNull)
    val counts = TermFrequency.counts(canon, Seq("year")).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(counts == Map("python" -> 2L, "sql" -> 1L))
  }
}
