package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.merge.ScdMerge
import graft.metrics.Freshness
import graft.schema.VacancySchema

class IngestJobSpec extends SparkSpec {
  import spark.implicits._

  private def writeCsv(root: String, date: String, rows: Seq[(String, String, String)]): Unit = {
    val dir = new java.io.File(s"$root/$date"); dir.mkdirs()
    val w = new java.io.PrintWriter(s"$root/$date/result.csv")
    w.println(VacancySchema.csv.map(_.name).mkString(","))
    rows.foreach { case (id, name, archived) =>
      w.println(VacancySchema.csv.map(_.name match {
        case "id" => id
        case "name" => name
        case "archived" => archived
        case "created_at" | "published_at" => "2021-01-01T00:00:00"
        case b if VacancySchema.booleanCols.contains(b) => "False"
        case _ => ""
      }).mkString(","))
    }
    w.close()
  }

  private def readSnapshot(dir: String): DataFrame =
    spark.read.schema(VacancySchema.csv).option("header", "true").csv(dir)

  private val tracked = VacancySchema.raw.map(_.name).filterNot(_ == "id")

  test("discovery filters non-dated dirs and sorts ascending") {
    val root = Files.createTempDirectory("ingest").toFile.getAbsolutePath
    Seq("2021-01-08", "2021-01-01", "notadate", "2021-1-1").foreach(d =>
      new java.io.File(s"$root/$d").mkdirs())
    assert(IngestJob.discoverSnapshotDirs(root) == Seq("2021-01-01", "2021-01-08"))
  }

  test("runOnce: incremental skip below HWM, future-dated skip, ordered merge") {
    val root = Files.createTempDirectory("ingest2").toFile.getAbsolutePath
    writeCsv(root, "2021-01-01", Seq(("1", "a", "False"), ("2", "b", "False")))
    writeCsv(root, "2021-01-08", Seq(("1", "a2", "False")))
    writeCsv(root, "2021-01-15", Seq(("1", "a2", "False"))) // future vs today

    val empty = ScdMerge.emptyState(
      Normalize.normalizeSnapshot(readSnapshot(s"$root/2021-01-01").limit(0)))

    val (s1, d1) = IngestJob.runOnce(spark, root, empty, "id", tracked,
      today = "2021-01-08", readSnapshot)
    assert(d1 == Seq("2021-01-01", "2021-01-08"))
    val life = s1.select($"id",
        date_format($"updated_at", "yyyy-MM-dd"),
        date_format($"removed_at", "yyyy-MM-dd"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(life(1L) == (("2021-01-08", null)))       // updated by w2
    assert(life(2L) == (("2021-01-01", "2021-01-08"))) // tombstoned by w2

    // second poll: nothing below HWM reprocessed, the future dir now due
    val (s2, d2) = IngestJob.runOnce(spark, root, s1, "id", tracked,
      today = "2021-01-15", readSnapshot)
    assert(d2 == Seq("2021-01-15"))
    // reference quirk: an all-unchanged snapshot does not advance the HWM
    // (no lifecycle date moved), so the dir re-feeds next poll — and the
    // merge is idempotent, so the state is unchanged.
    assert(IngestJob.highWaterMark(s2) == "2021-01-08")
    val (s3, d3) = IngestJob.runOnce(spark, root, s2, "id", tracked,
      today = "2021-01-15", readSnapshot)
    assert(d3 == Seq("2021-01-15"))
    assert(s3.orderBy("id").collect().toSeq == s2.orderBy("id").collect().toSeq)

    // freshness gauges over the final state
    val g = Freshness.compute(s2, asOf = "2021-01-20")
    assert(g.rowCount == 2 && g.liveCount == 1 && g.removedCount == 1)
    assert(g.maxLifecycleDate.contains("2021-01-08"))
    assert(g.daysSinceUpdate.contains(12L))
    assert(Freshness.prometheusText(g).contains("graft_rows_live 1"))
  }
}
