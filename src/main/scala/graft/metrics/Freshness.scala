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
}
