package graft.queries

import org.apache.spark.sql.functions._

/** Round-14 additions: the COUNT aggregate pushdown of the paged
  * source — the fourth and final DSv2 pushdown surface (after
  * filters, limit, statistics). */
object Round14Queries {

  /** [[graft.sources.PagedSource]] aggregate pushdown — a filtered
    * group-free count/min/max over the paged feed is answered entirely
    * from `found()` metadata probes: the physical plan is a one-row
    * PagedCountScan, zero pages fetched (PagedAggSpec pins the
    * odometer). The oracle recomputes all three from the fixture's
    * row function over the same half-open ts window, so a planner
    * that double-counted a bisection boundary, summed `found(root)`
    * instead of the reachable leaves, or mis-bisected a boundary
    * second breaks the compare. */
  private val pagedCount = Q("q_paged_count",
    (s, _) => s.read.format("graft.sources.PagedSource")
      .option("n", "5000").option("base", "1600000000")
      .option("span", "864000")
      .option("perPage", "100").option("maxPages", "5")
      .option("minRange", "60")
      .load()
      .filter(col("ts_sec") >= 1600216000L && col("ts_sec") < 1600432000L)
      .groupBy().agg(count(lit(1)).as("n"),
        min(col("ts_sec")).as("ts_min"), max(col("ts_sec")).as("ts_max")),
    Some("""SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(min(ts_sec) AS BIGINT) AS ts_min,
                   CAST(max(ts_sec) AS BIGINT) AS ts_max
            FROM (SELECT 1600000000 + (t.id * 2654435761) % 864000 AS ts_sec
                  FROM range(0, 5000) t(id))
            WHERE ts_sec >= 1600216000 AND ts_sec < 1600432000"""))

  val all: Seq[Q] = Seq(pagedCount)
}
