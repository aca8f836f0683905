package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the COUNT aggregate pushdown of [[PagedSource]] — the
  * metadata-only contract: a group-free count over the feed is served
  * entirely from `found()` probes (ZERO `fetch()` calls, odometer
  * [[HashSpreadApi.fetchCalls]]), equals COUNT over the actual scan
  * (skip semantics included — NOT `found(root)`), and declines to push
  * whenever a residual predicate or a distinct makes probe arithmetic
  * unsound. */
class PagedAggSpec extends SparkSpec {

  private val base = 1600000000L
  private val span = 864000L

  private def readPaged(n: Long, burst: Boolean = false): DataFrame =
    spark.read.format("graft.sources.PagedSource")
      .option("n", n.toString).option("base", base.toString)
      .option("span", span.toString)
      .option("perPage", "100").option("maxPages", "5")
      .option("minRange", "60")
      .option("burst", burst.toString)
      .load()

  private def fetches[A](body: => A): (A, Long) = {
    val before = HashSpreadApi.fetchCalls.get()
    val out = body
    (out, HashSpreadApi.fetchCalls.get() - before)
  }

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("count(*) is answered from found() probes — zero pages fetched") {
    val df = readPaged(5000).groupBy().agg(count(lit(1)).as("n"))
    assert(planOf(df).contains("PagedCountScan"),
      s"expected the pushed count scan in:\n${planOf(df)}")
    val (rows, nFetch) = fetches(df.collect())
    assert(rows.map(_.getLong(0)).toSeq == Seq(5000L))
    assert(nFetch == 0L, s"pushed COUNT must not fetch pages, saw $nFetch")
  }

  test("Dataset.count() pushes too and respects ts_sec filter pushdown") {
    val loSec = base + span / 4
    val hiSec = base + span / 2
    val df = readPaged(5000)
      .filter(col("ts_sec") >= loSec && col("ts_sec") < hiSec)
    val expected = (0L until 5000L).count { id =>
      val t = base + (id * HashSpreadApi.Mult) % span
      t >= loSec && t < hiSec
    }
    val (n, nFetch) = fetches(df.count())
    assert(n == expected)
    assert(nFetch == 0L,
      s"filtered pushed COUNT must stay metadata-only, saw $nFetch fetches")
  }

  test("pushed count honors SCAN semantics on a burst feed — not found(root)") {
    // odd ids collapse onto one unsplittable-dense second: the row scan
    // skips them (reference data-loss edge), so the pushed count must
    // report 2500, though found(root) over the window says 5000
    val df = readPaged(5000, burst = true)
    val a = HashSpreadApi(5000, base, span, perPage = 100, maxPages = 5,
      burst = true)
    assert(a.found(base, base + span) == 5000L, "sanity: the feed holds 5000")
    val (n, nFetch) = fetches(df.count())
    assert(n == 2500L, s"count must equal the scan's reachable rows, got $n")
    assert(nFetch == 0L)
  }

  test("a residual predicate blocks the pushdown — falls back to the row scan") {
    val df = readPaged(5000).filter(col("title") === "vac-7")
      .groupBy().agg(count(lit(1)).as("n"))
    assert(!planOf(df).contains("PagedCountScan"),
      "title filter is residual: the aggregate must NOT push")
    val (rows, nFetch) = fetches(df.collect())
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L))
    assert(nFetch > 0L, "the fallback row scan does fetch pages")
  }

  test("count(DISTINCT col) does not push; plain count(col) does") {
    val distinctDf = readPaged(5000)
      .groupBy().agg(countDistinct(col("title")).as("n"))
    assert(!planOf(distinctDf).contains("PagedCountScan"))
    assert(distinctDf.collect().map(_.getLong(0)).toSeq == Seq(5000L))

    val plainDf = readPaged(5000).groupBy().agg(count(col("id")).as("n"))
    assert(planOf(plainDf).contains("PagedCountScan"),
      s"count(id) on a non-nullable feed column must push:\n${planOf(plainDf)}")
    val (rows, nFetch) = fetches(plainDf.collect())
    assert(rows.map(_.getLong(0)).toSeq == Seq(5000L))
    assert(nFetch == 0L)
  }

  test("min/max(ts_sec) push — boundary bisection, zero pages fetched") {
    val df = readPaged(5000).groupBy().agg(
      count(lit(1)).as("n"),
      min(col("ts_sec")).as("lo"),
      max(col("ts_sec")).as("hi"))
    assert(planOf(df).contains("PagedCountScan"),
      s"mixed count/min/max must push:\n${planOf(df)}")
    val all = (0L until 5000L).map(id => base + (id * HashSpreadApi.Mult) % span)
    val (rows, nFetch) = fetches(df.collect())
    val r = rows.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
      (5000L, all.min, all.max))
    assert(nFetch == 0L, s"pushed min/max must stay metadata-only, saw $nFetch")
  }

  test("min/max on an empty reachable window are NULL; count is 0") {
    val df = readPaged(5000)
      .filter(col("ts_sec") >= base - 1000L && col("ts_sec") < base)
      .groupBy().agg(count(lit(1)).as("n"),
        min(col("ts_sec")).as("lo"), max(col("ts_sec")).as("hi"))
    assert(planOf(df).contains("PagedCountScan"))
    val (rows, nFetch) = fetches(df.collect())
    val r = rows.head
    assert(r.getLong(0) == 0L && r.isNullAt(1) && r.isNullAt(2))
    assert(nFetch == 0L)
  }

  test("min/max skip unreachable bursts — scan semantics, not feed semantics") {
    // burst: odd ids on base+span/2, skipped by the scan; the even-id
    // extremes are what a real scan-then-aggregate returns
    val df = readPaged(5000, burst = true).groupBy().agg(
      min(col("ts_sec")).as("lo"), max(col("ts_sec")).as("hi"))
    val even = (0L until 5000L).filter(_ % 2 == 0)
      .map(id => base + (id * HashSpreadApi.Mult) % span)
    val (rows, nFetch) = fetches(df.collect())
    val r = rows.head
    assert((r.getLong(0), r.getLong(1)) == (even.min, even.max))
    assert(nFetch == 0L)
  }

  test("min(id) does not push — probes only order ts_sec") {
    val df = readPaged(5000).groupBy().agg(min(col("id")).as("lo"))
    assert(!planOf(df).contains("PagedCountScan"))
    assert(df.collect().head.getLong(0) == 0L)
  }

  test("a limit above the pushed aggregate does not corrupt the count") {
    val df = readPaged(5000).groupBy().agg(count(lit(1)).as("n")).limit(1)
    val (rows, _) = fetches(df.collect())
    assert(rows.map(_.getLong(0)).toSeq == Seq(5000L),
      "limit(1) above the one-row aggregate must not cap the count value")
  }

  test("grouped counts do not push — the probe algebra is group-free") {
    val df = readPaged(5000).groupBy(col("ts_sec") % 2)
      .agg(count(lit(1)).as("n"))
    assert(!planOf(df).contains("PagedCountScan"))
    assert(df.collect().map(_.getLong(1)).sum == 5000L)
  }
}
