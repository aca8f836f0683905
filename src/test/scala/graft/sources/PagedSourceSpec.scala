package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the S8 paged-source semantics (reference get_vacancies.py:24-64):
  * overflow-triggered recursive bisection, page-cap fidelity, half-open
  * duplicate-freeness, column pruning, and the reference's sub-minRange
  * skip (data loss on an unsplittable burst — kept, not papered over). */
class PagedSourceSpec extends SparkSpec {

  private val base = 1600000000L
  private val span = 864000L // 10 days
  private def api(n: Long, burst: Boolean = false) =
    HashSpreadApi(n, base, span, perPage = 100, maxPages = 5, burst = burst)

  private def readPaged(n: Long, burst: Boolean = false) =
    spark.read.format("graft.sources.PagedSource")
      .option("n", n.toString).option("base", base.toString)
      .option("span", span.toString)
      .option("perPage", "100").option("maxPages", "5")
      .option("minRange", "60")
      .option("burst", burst.toString)
      .load()

  test("bisection engages and the scan equals the flat row set, duplicate-free") {
    val a = api(5000)
    val windows = PagedSource.planWindows(a, base, base + span, 60)
    assert(windows.size > 1, "5000 rows over a 500-row cap must bisect")
    // every leaf window fits the page cap and the leaves tile the span
    assert(windows.forall { case (_, _, n) => n <= 500 })
    assert(windows.head._1 == base && windows.last._2 == base + span)
    assert(windows.sliding(2).forall {
      case Seq((_, t1, _), (f2, _, _)) => t1 == f2
      case _ => true
    }, "leaves must tile the span gaplessly")

    val out = readPaged(5000).collect()
    assert(out.length == 5000, "half-open windows: no dups, no drops")
    assert(out.map(_.getLong(0)).sorted.toSeq == (0L until 5000L))
    // row function fidelity (the oracle's arithmetic)
    assert(out.forall { r =>
      r.getLong(1) == base + (r.getLong(0) * HashSpreadApi.Mult) % span &&
        r.getString(2) == s"vac-${r.getLong(0)}"
    })
  }

  test("a pageable feed plans without splitting; partitions = pages") {
    val a = api(450) // under the 500 cap: one window
    val windows = PagedSource.planWindows(a, base, base + span, 60)
    assert(windows == Seq((base, base + span, 450L)))
    val parts = readPaged(450).rdd.getNumPartitions
    assert(parts == 5, s"ceil(450/100) = 5 page partitions, got $parts")
  }

  test("sub-minRange burst window is skipped — the reference's data-loss edge") {
    // odd ids all land on ONE second: that window overflows at every
    // depth until its width drops under minRange, then is skipped
    val out = readPaged(5000, burst = true).collect()
    val ids = out.map(_.getLong(0)).toSet
    assert(ids.forall(_ % 2 == 0), "burst (odd) ids must be gone")
    // even ids spread uniformly: all survive
    assert(out.length == 2500, s"expected the 2500 even ids, got ${out.length}")
  }

  test("minRange=1 on an unsplittable burst terminates (r11 ADVICE StackOverflow repro)") {
    // Width-1 integer windows have no midpoint: before the width-≤1
    // guard, minRange=1 + a single-second burst denser than the cap
    // recursed forever (mid == from reproduces the parent window).
    // Exact ADVICE repro: HashSpreadApi(n=3000, burst=true) with a
    // 5-row cap and minRange=1 — must now plan, not overflow the stack.
    val a = HashSpreadApi(3000, base, span, perPage = 5, maxPages = 1,
      burst = true)
    val (leaves, skips) =
      PagedSource.planWindowsWithSkips(a, base, base + span, 1L)
    assert(leaves.forall { case (_, _, n) => n <= 5 })
    // the burst second is unsplittable-dense → it must be IN the skips
    val burstSec = base + span / 2
    assert(skips.exists { case (f, t) => f <= burstSec && burstSec < t },
      "the width-1 overflowing burst window must land in the skip report")
    // tiling + exact-deficit invariants hold in the degenerate regime too
    val intervals =
      (leaves.map { case (f, t, _) => (f, t) } ++ skips).sortBy(_._1)
    assert(intervals.head._1 == base && intervals.last._2 == base + span)
    assert(intervals.sliding(2).forall {
      case Seq((_, t1), (f2, _)) => t1 == f2
      case _ => true
    })
    val deficit = skips.map { case (f, t) => a.found(f, t) }.sum
    assert(leaves.map(_._3).sum + deficit == a.found(base, base + span))
  }

  test("micro-batch polling: stream ≡ batch, HWM offsets advance, batches are duplicate-free") {
    // pollStep = span/8: the frontier walks the feed in 8 polls; each
    // micro-batch runs the SAME bisection planner over [HWM, frontier)
    val q = spark.readStream.format("graft.sources.PagedSource")
      .option("n", "5000").option("base", base.toString)
      .option("span", span.toString)
      .option("perPage", "100").option("maxPages", "5")
      .option("minRange", "60")
      .option("pollStep", (span / 8).toString)
      .load()
      .writeStream.format("memory").queryName("paged_stream")
      .start()
    try {
      // the frontier advances one pollStep per trigger: drain until the
      // sink stops growing (bounded by 8 polls + slack)
      var last = -1L
      var stable = 0
      var guard = 0
      while (stable < 2 && guard < 40) {
        q.processAllAvailable()
        val c = spark.table("paged_stream").count()
        if (c == last) stable += 1 else { stable = 0; last = c }
        guard += 1
      }
      val got = spark.table("paged_stream")
      assert(got.count() == 5000, "stream must deliver the full feed exactly once")
      assert(got.select("id").distinct().count() == 5000,
        "half-open batch windows: no id may repeat across micro-batches")
      assert(q.recentProgress.count(_.numInputRows > 0) > 1,
        "the feed must arrive across MULTIPLE polls, not one batch")
    } finally q.stop()
  }

  test("ts_sec range predicates push into the planner: fewer windows probed, same rows") {
    // a quarter-span slice: the planner's root window narrows BEFORE
    // any found() probe, so the plan holds only the slice's partitions
    val qLo = base + span / 4
    val qHi = base + span / 2
    val full = readPaged(5000)
    val sliced = readPaged(5000)
      .filter(col("ts_sec") >= qLo && col("ts_sec") < qHi)

    val fullParts = full.rdd.getNumPartitions
    val slicedParts = sliced.rdd.getNumPartitions
    assert(slicedParts < fullParts,
      s"range pushdown must shrink the plan: $slicedParts !< $fullParts")

    // acceptance is exact: same rows as post-filtering the full scan
    val expect = full.collect()
      .filter(r => r.getLong(1) >= qLo && r.getLong(1) < qHi)
      .map(_.getLong(0)).sorted.toSeq
    val got = sliced.collect().map(_.getLong(0)).sorted.toSeq
    assert(got == expect && got.nonEmpty)

    // the filter is CONSUMED by the source (no post-scan re-filter of
    // ts_sec): the scan's pushed set carries both range bounds
    val scans = sliced.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)

    // a contradictory range plans an empty scan, not an error
    assert(readPaged(5000)
      .filter(col("ts_sec") >= qHi && col("ts_sec") < qLo).count() == 0)

    // non-ts_sec predicates stay residual and still evaluate correctly
    assert(readPaged(5000).filter(col("id") === 7L).count() == 1)
  }

  test("Long-extreme bounds stay residual: no +1 overflow in the half-open rewrites") {
    // r12 ADVICE: GreaterThan(ts_sec, Long.MaxValue) used to compute
    // lo = MaxValue + 1 = MinValue — the always-false filter was
    // CONSUMED while the window stayed un-narrowed, returning ALL rows;
    // LessThanOrEqual(ts_sec, MaxValue) emptied an always-true scan.
    // Extremes are now left residual, so Spark evaluates them.
    assert(readPaged(100).filter(col("ts_sec") > Long.MaxValue).count() == 0)
    assert(readPaged(100).filter(col("ts_sec") <= Long.MaxValue).count() == 100)
    assert(readPaged(100).filter(col("ts_sec") === Long.MaxValue).count() == 0)
    // the non-extreme paths keep consuming as before
    assert(readPaged(100).filter(col("ts_sec") > base + span).count() == 0)
  }

  test("limit pushdown caps the planned pages; stats let the feed broadcast") {
    // head(120) against the 5000-row feed: the planner stops once the
    // bisected windows' found counts cover the limit, instead of
    // fanning out all ~50 pages
    val limited = readPaged(5000).limit(120)
    val fullParts = readPaged(5000).rdd.getNumPartitions
    val limParts = limited.rdd.getNumPartitions
    assert(limParts < fullParts,
      s"limit must shrink the plan: $limParts !< $fullParts")
    assert(limited.count() == 120, "partial pushdown: Spark's limit still trims")
    // the limit composes with a pushed range: both reach the planner
    val both = readPaged(5000)
      .filter(col("ts_sec") >= base + span / 4 && col("ts_sec") < base + span / 2)
      .limit(30)
    assert(both.rdd.getNumPartitions <= limParts && both.count() == 30)

    // estimateStatistics reports found-count rows, so a join against a
    // NARROW slice of the feed broadcasts the slice (the optimizer
    // integration; without stats DSv2 assumes conf defaultSizeInBytes
    // = huge and would shuffle both sides)
    val slice = readPaged(5000)
      .filter(col("ts_sec") >= base && col("ts_sec") < base + span / 64)
    val dim = spark.range(0, 5000).select(col("id"), (col("id") % 7).as("grp"))
    val joined = dim.join(slice, "id")
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"a stats-reported small slice must broadcast, not sort-merge:\n$p")
    val stats = slice.queryExecution.optimizedPlan.stats
    assert(stats.rowCount.exists(rc => rc.toLong > 0 && rc.toLong < 5000),
      s"found-count row stats must reach the optimizer: $stats")
  }

  test("limit-aware planning probes only the covering prefix of the window tree") {
    // count found() probes through a delegating feed
    var probes = 0
    val counting = new PagedApi {
      private val inner = api(5000)
      def perPage = inner.perPage
      def maxPages = inner.maxPages
      def found(f: Long, t: Long): Long = { probes += 1; inner.found(f, t) }
      def fetch(f: Long, t: Long, p: Int) = inner.fetch(f, t, p)
    }
    val full = PagedSource.planWindows(counting, base, base + span, 60)
    val fullProbes = probes
    probes = 0
    val limited =
      PagedSource.planWindowsLimited(counting, base, base + span, 60, 120)
    val limitedProbes = probes

    assert(limited.map(_._3).sum >= 120, "kept leaves must cover the limit")
    assert(limited.map(_._1).toSet.subsetOf(
      full.map(_._1).toSet), "limited leaves are a prefix of the full plan")
    assert(limitedProbes < fullProbes / 2,
      s"head(120) must not bisect the whole feed: $limitedProbes !<< $fullProbes")
    // degenerate inputs: needed <= 0 plans nothing, needed > feed keeps all
    assert(PagedSource.planWindowsLimited(counting, base, base + span, 60, 0)
      .isEmpty)
    assert(PagedSource
      .planWindowsLimited(counting, base, base + span, 60, 1000000)
      .map(_._3).sum == 5000)
  }

  test("column pruning reaches the scan's readSchema") {
    val pruned = readPaged(5000).select("id")
    val scans = pruned.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSeq == Seq("id"))
    assert(pruned.distinct().count() == 5000)
  }
}
