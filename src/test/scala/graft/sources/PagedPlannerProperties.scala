package graft.sources

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Test.Parameters

/** The bisection planner's invariants as properties, for ANY fixture
  * feed shape (pure planner math — no Spark job per case, so the case
  * count can be generous):
  *
  *  1. every kept leaf fits the page cap (found ≤ perPage·maxPages) —
  *     the feed will actually page it;
  *  2. leaves ∪ skips tile the requested span EXACTLY (disjoint,
  *     ordered, gapless) — nothing is dropped silently;
  *  3. every skipped window is either narrower than minRange, or a
  *     width-≤1 window whose count still overflows the page cap — the
  *     two data-loss modes: the reference's documented one (a slice too
  *     dense to page at the narrowest splittable width), plus the
  *     integer-seconds unsplittable burst (a width-1 window has no
  *     integer midpoint; bisecting it would never terminate — the r11
  *     ADVICE StackOverflow, now a skip);
  *  4. Σ found over leaves + Σ found over skips = the flat count —
  *     the skip report IS the exact row deficit;
  *  5. the recursion terminates on every generated case INCLUDING
  *     minRange = 1 with burst feeds (width halves each level down to
  *     the width-1 floor, so depth ≤ log2(span) + 1).
  */
object PagedPlannerProperties extends Properties("PagedPlanner") {

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

  property("leaves fit the cap; leaves ∪ skips tile the span; skips are the exact deficit") =
    Prop.forAllNoShrink(cases) { case (n, span, perPage, maxPages, minRange, burst) =>
      val base = 1600000000L
      val api = HashSpreadApi(n, base, span, perPage, maxPages, burst)
      val cap = perPage.toLong * maxPages
      val (leaves, skips) =
        PagedSource.planWindowsWithSkips(api, base, base + span, minRange)

      val fits = leaves.forall { case (f, t, found) =>
        found <= cap && found == api.found(f, t) && f < t
      }
      val skipsNarrow = skips.forall { case (f, t) =>
        t - f < minRange || (t - f <= 1 && api.found(f, t) > cap)
      }
      // tiling: the union of leaf and skip intervals, sorted, must be
      // exactly [base, base+span) with no gap and no overlap
      val intervals =
        (leaves.map { case (f, t, _) => (f, t) } ++ skips).sortBy(_._1)
      val tiles = intervals.nonEmpty &&
        intervals.head._1 == base &&
        intervals.last._2 == base + span &&
        intervals.sliding(2).forall {
          case Seq((_, t1), (f2, _)) => t1 == f2
          case _ => true
        }
      val leafRows = leaves.map(_._3).sum
      val skipRows = skips.map { case (f, t) => api.found(f, t) }.sum
      val accounted = leafRows + skipRows == api.found(base, base + span)

      fits && skipsNarrow && tiles && accounted
    }

  private val limitedCases = for {
    (n, span, perPage, maxPages, minRange, burst) <- cases
    needed <- Gen.choose(0L, 4000L)
  } yield (n, span, perPage, maxPages, minRange, burst, needed)

  property("limited planning: an ordered sub-sequence of the full leaves that covers the limit") =
    Prop.forAllNoShrink(limitedCases) {
      case (n, span, perPage, maxPages, minRange, burst, needed) =>
        val base = 1600000000L
        val api = HashSpreadApi(n, base, span, perPage, maxPages, burst)
        val full = PagedSource.planWindows(api, base, base + span, minRange)
        val limited =
          PagedSource.planWindowsLimited(api, base, base + span, minRange, needed)

        // every limited leaf is a full-plan leaf, in the same order
        // (the limited planner only ever DROPS windows, never reshapes)
        val fullSet = full.toSet
        val subseq = limited.forall(fullSet.contains) &&
          limited.map(l => full.indexOf(l)) == limited.map(l => full.indexOf(l)).sorted
        // coverage: kept counts reach min(needed, all reachable rows)
        val reachable = full.map(_._3).sum
        val covered = limited.map(_._3).sum >= math.min(needed, reachable)
        // never grossly over-plans: dropping the last kept leaf would
        // leave the limit uncovered (minimality of the kept prefix)
        val minimal = limited.isEmpty ||
          limited.init.map(_._3).sum < needed

        subseq && covered && minimal
    }

  /** Counting wrapper — the probe meter for the budget property. */
  private final class CountingApi(inner: PagedApi) extends PagedApi {
    var probes = 0
    def perPage: Int = inner.perPage
    def maxPages: Int = inner.maxPages
    def found(f: Long, t: Long): Long = { probes += 1; inner.found(f, t) }
    def fetch(f: Long, t: Long, p: Int): Iterator[(Long, Long, String)] =
      inner.fetch(f, t, p)
  }

  property("probe budget: found() calls are O(output) — ≤ 2·(leaves + skips), ≥ kept leaves") =
    Prop.forAllNoShrink(cases) { case (n, span, perPage, maxPages, minRange, burst) =>
      // r12 VERDICT #7: the planner's metadata-call bill, pinned. The
      // recursion probes exactly the bisection-tree nodes wide enough
      // to consider (sub-minRange windows return unprobed); with
      // L = kept + skipped leaves, internal nodes number ≤ L−1, so
      // probes ≤ 2L−1 — the budget scales with the PLAN SIZE, never
      // with rows, and filter pushdown shrinks L before any probe runs.
      val base = 1600000000L
      val api = new CountingApi(
        HashSpreadApi(n, base, span, perPage, maxPages, burst))
      val (leaves, skips) =
        PagedSource.planWindowsWithSkips(api, base, base + span, minRange)
      val budget = api.probes <= 2 * (leaves.size + skips.size)
      val floor = api.probes >= leaves.size // every kept leaf was probed
      budget && floor
    }
}
