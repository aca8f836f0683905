package graft.sources

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import org.scalacheck.Test.Parameters

/** The pushed aggregate's probe algebra as properties, for ANY fixture
  * feed shape — exercising the REAL reader (PagedCountReaderFactory is
  * plain JVM code: no Spark job per case, so the case count can be
  * generous):
  *
  *  1. pushed COUNT equals the exact count of REACHABLE rows (rows
  *     whose second lands in a kept bisection leaf) — scan skip
  *     semantics, never the feed's flat count;
  *  2. pushed MIN/MAX(ts_sec) equal the exact extremes of the same
  *     reachable set, and are NULL exactly when the reachable set is
  *     empty (while COUNT is 0). (There is no limit leg by design:
  *     aggregates push before limits and pushLimit declines once an
  *     aggregation is pushed, so a pushed agg and a pushed limit can
  *     never coexist — PagedAggSpec pins the decline.)
  */
object PagedAggProperties extends Properties("PagedAgg") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(60)

  private val cases = for {
    n <- Gen.choose(0L, 3000L)
    span <- Gen.choose(200L, 200000L)
    perPage <- Gen.choose(5, 60)
    maxPages <- Gen.choose(1, 6)
    minRange <- Gen.choose(1L, 500L)
    burst <- Gen.oneOf(true, false)
  } yield (n, span, perPage, maxPages, minRange, burst)

  private val base = 1600000000L

  /** One read through the real one-row reader. */
  private def readAggs(
      api: HashSpreadApi, minRange: Long): (Long, Option[Long], Option[Long]) = {
    val factory = new PagedCountReaderFactory(api, minRange,
      Seq(PagedAgg.CountRows, PagedAgg.MinTs, PagedAgg.MaxTs))
    val reader = factory.createReader(
      PagedCountPartition(base, base + api.spanSec))
    assert(reader.next())
    val row = reader.get()
    val out = (row.getLong(0),
      if (row.isNullAt(1)) None else Some(row.getLong(1)),
      if (row.isNullAt(2)) None else Some(row.getLong(2)))
    assert(!reader.next())
    reader.close()
    out
  }

  property("COUNT/MIN/MAX equal the reachable set's exact stats") =
    Prop.forAllNoShrink(cases) {
      case (n, span, perPage, maxPages, minRange, burst) =>
        val api = HashSpreadApi(n, base, span, perPage, maxPages, burst)
        val leaves = PagedSource
          .planWindows(api, base, base + span, minRange)
          .filter(_._3 > 0)
        // the reachable set, enumerated the slow way from the fixture's
        // row function: every id whose second lands in a kept leaf
        val reachable = (0L until n)
          .map(id =>
            if (burst && id % 2 == 1) base + span / 2
            else base + (id * HashSpreadApi.Mult) % span)
          .filter(t => leaves.exists { case (f, to, _) => t >= f && t < to })
        val (cnt, lo, hi) = readAggs(api, minRange)
        val wantCnt = reachable.size.toLong
        val countOk = cnt == wantCnt
        val minOk = lo == (if (reachable.isEmpty) None else Some(reachable.min))
        val maxOk = hi == (if (reachable.isEmpty) None else Some(reachable.max))
        (countOk :| s"count $cnt != $wantCnt") &&
          (minOk :| s"min $lo != ${reachable.headOption.map(_ => reachable.min)}") &&
          (maxOk :| s"max $hi != ${reachable.headOption.map(_ => reachable.max)}")
    }
}
