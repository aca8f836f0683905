package graft.metrics

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** The export-loop closure of the reference's metrics exporter: the
  * exposition format, the atomic textfile-collector publish, and the
  * always-on republish loop picking up state changes tick to tick. */
class FreshnessExportSpec extends SparkSpec {
  import spark.implicits._

  private def state(rows: Seq[(Long, String, String, String)]) =
    rows.toDF("id", "added_at", "updated_at", "removed_at")
      .selectExpr("id", "CAST(added_at AS DATE) AS added_at",
        "CAST(updated_at AS DATE) AS updated_at",
        "CAST(removed_at AS DATE) AS removed_at")

  test("exposition format: TYPE lines, prefix, gauge values") {
    val g = Freshness.compute(state(Seq(
      (1L, "2024-01-01", "2024-01-05", null),
      (2L, "2024-01-02", null, "2024-01-03"))), asOf = "2024-01-10")
    val text = Freshness.prometheusText(g, prefix = "vac")
    assert(text.contains("# TYPE vac_rows_total gauge\nvac_rows_total 2"))
    assert(text.contains("vac_rows_live 1"))
    assert(text.contains("vac_rows_removed 1"))
    assert(text.contains("vac_days_since_update 5"), text)
  }

  test("publishProm is atomic: the target always holds one complete exposition, no temp debris") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prom")
    val target = dir.resolve("graft.prom")
    Freshness.publishProm(target, "a 1\n")
    assert(new String(java.nio.file.Files.readAllBytes(target)) == "a 1\n")
    Freshness.publishProm(target, "a 2\n") // overwrite via rename
    assert(new String(java.nio.file.Files.readAllBytes(target)) == "a 2\n")
    val leftovers = java.nio.file.Files.list(dir).toArray.map(_.toString)
      .filter(_.contains(".tmp"))
    assert(leftovers.isEmpty, s"temp files must not accumulate: ${leftovers.toSeq}")
  }

  test("promSink republishes on every tick, reading the CURRENT state") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-prom-loop")
    val target = dir.resolve("graft.prom")
    // mutable state stands in for the merge job's table between ticks
    var current = state(Seq((1L, "2024-01-01", null, null)))
    val ticks = MemoryStream[Long]
    val q = Freshness.promSink(ticks.toDF(), current, () => "2024-01-10",
      target).start()
    try {
      ticks.addData(1L)
      q.processAllAvailable()
      val first = new String(java.nio.file.Files.readAllBytes(target))
      assert(first.contains("graft_rows_total 1"), first)
      current = state(Seq( // the merge admits two more rows
        (1L, "2024-01-01", null, null),
        (2L, "2024-01-02", null, null),
        (3L, "2024-01-03", null, "2024-01-04")))
      ticks.addData(2L)
      q.processAllAvailable()
      val second = new String(java.nio.file.Files.readAllBytes(target))
      assert(second.contains("graft_rows_total 3"), second)
      assert(second.contains("graft_rows_live 2"), second)
      assert(q.lastProgress.stateOperators.isEmpty,
        "the export loop must keep zero streaming state")
    } finally q.stop()
  }
}
