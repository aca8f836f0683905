package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Freshness/liveness gauges — the reference's Prometheus exporter
  * semantics (metrics_exporter.py:68-151) as aggregate queries. Export is
  * driver-side by construction (gauges are scalars); computing them is
  * distributed. */
object Freshness {

  case class Gauges(
      rowCount: Long,
      liveCount: Long,
      removedCount: Long,
      maxLifecycleDate: Option[String],
      daysSinceUpdate: Option[Long])

  /** All gauges in ONE pass over the state (the reference runs one SQL
    * query per gauge, metrics_exporter.py:72-96 — here a single aggregate
    * job computes them all). */
  def compute(state: DataFrame, asOf: String): Gauges = {
    val row = state.agg(
      count(lit(1)).as("n"),
      count(when(col("removed_at").isNull, 1)).as("live"),
      count(col("removed_at")).as("removed"),
      greatest(max("added_at"), max("updated_at"), max("removed_at")).as("hwm"))
      .withColumn("days", datediff(to_date(lit(asOf)), col("hwm")))
      .head()
    Gauges(
      rowCount = row.getLong(0),
      liveCount = row.getLong(1),
      removedCount = row.getLong(2),
      maxLifecycleDate = Option(row.getDate(3)).map(_.toString),
      daysSinceUpdate = if (row.isNullAt(4)) None else Some(row.getInt(4).toLong))
  }

  /** Prometheus text exposition (metrics_exporter.py:113-141 format). */
  def prometheusText(g: Gauges, prefix: String = "graft"): String = {
    val sb = new StringBuilder
    def gauge(name: String, v: Any): Unit =
      sb.append(s"# TYPE ${prefix}_$name gauge\n${prefix}_$name $v\n")
    gauge("rows_total", g.rowCount)
    gauge("rows_live", g.liveCount)
    gauge("rows_removed", g.removedCount)
    g.daysSinceUpdate.foreach(gauge("days_since_update", _))
    sb.toString
  }

  /** Atomic exposition publish — the node_exporter TEXTFILE COLLECTOR
    * contract, the standard no-HTTP form of the reference's exporter
    * (metrics_exporter.py serves gauges over HTTP; the harness has no
    * HTTP surface, and the textfile collector reads `.prom` files the
    * job publishes instead): write to a temp file in the SAME
    * directory, then rename over the target — rename within a
    * directory is atomic on POSIX, so a scraper never reads a torn
    * half-written exposition. */
  def publishProm(path: java.nio.file.Path, text: String): Unit = {
    val dir = Option(path.getParent).getOrElse(java.nio.file.Paths.get("."))
    java.nio.file.Files.createDirectories(dir)
    val tmp = java.nio.file.Files.createTempFile(dir, ".prom-", ".tmp")
    java.nio.file.Files.write(tmp,
      text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, path,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** The reference's export LOOP (`while True: compute; serve; sleep`,
    * metrics_exporter.py:99-151), Spark-first: any ticking stream (a
    * `rate` source at the export cadence in production; a MemoryStream
    * of ticks in tests) drives a foreachBatch that recomputes the
    * gauges from the CURRENT state — `state` is by-name, so a
    * table-backed frame re-reads the merge job's latest files each
    * tick — and republishes the exposition atomically. Per-tick cost is
    * the one-pass [[compute]] aggregate; no streaming state. */
  def promSink(
      ticks: DataFrame,
      state: => DataFrame,
      asOf: () => String,
      path: java.nio.file.Path,
      prefix: String = "graft")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    ticks.writeStream
      .outputMode("append")
      .foreachBatch {
        (_: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          publishProm(path, prometheusText(compute(state, asOf()), prefix))
      }
}
