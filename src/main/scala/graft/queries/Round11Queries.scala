package graft.queries

import org.apache.spark.sql.functions._

/** Round-11 additions: the S8 paged-source scan (the last §2.1 row) —
  * see [[graft.sources.PagedSource]]. */
object Round11Queries {

  /** [[graft.sources.PagedSource]] — the recursive date-bisect paged
    * scan, end to end: the fixture feed's 5000 rows overflow the
    * 100×5 page cap across the whole 10-day span, so the planner
    * bisects to ≤500-row windows and fans the pages out as input
    * partitions. The oracle reproduces the fixture's row function
    * (id, base + (id·2654435761) mod span, 'vac-'||id) independently —
    * a planner that dropped, duplicated, or boundary-shifted any
    * window breaks the hash. */
  private val pagedSource = Q("q_paged_source",
    (s, _) => s.read.format("graft.sources.PagedSource")
      .option("n", "5000").option("base", "1600000000")
      .option("span", "864000")
      .option("perPage", "100").option("maxPages", "5")
      .option("minRange", "60")
      .load()
      .orderBy("id"),
    Some("""SELECT CAST(t.id AS BIGINT) AS id,
                   CAST(1600000000 + (t.id * 2654435761) % 864000 AS BIGINT)
                     AS ts_sec,
                   'vac-' || t.id AS title
            FROM range(0, 5000) t(id) ORDER BY id"""))

  val all: Seq[Q] = Seq(pagedSource)
}
