package graft.extensions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** The r15 curation family's INTEGER algebra as pure properties — the
  * arithmetic both the Spark plans and the DuckDB oracles replay, so a
  * future "simplification" of any formula breaks here before it can
  * desynchronize an engine from its oracle:
  *
  *  1. tier cut — bucket = (3·r) div n over 0-based ranks yields
  *     exactly three contiguous tiers whose sizes are non-increasing,
  *     differ by at most one, and sum to n (head gets remainder first:
  *     the CCNet convention of erring toward keeping);
  *  2. round-robin placement — shard = position mod S gives doc
  *     counts that differ by at most one across shards, and positions
  *     within every shard are strictly increasing (curriculum order is
  *     preserved per worker);
  *  3. chunk spans — with end = cumsum(n_tok), chunk_first =
  *     (end−n_tok) div b and chunk_last = max(chunk_first,
  *     (max(end,1)−1) div b: spans are well-ordered, every nonzero doc
  *     covers exactly the chunks its token interval touches, adjacent
  *     docs in a shard never leave a chunk gap, and a 0-token doc
  *     occupies exactly its boundary chunk.
  */
object CurationProperties extends Properties("Curation") {

  // ── 1. tier cut ───────────────────────────────────────────────────
  property("tierSizes") = Prop.forAll(Gen.choose(1, 2000)) { n =>
    val buckets = (0 until n).map(r => (3L * r) / n)
    val sizes = buckets.groupBy(identity).view.mapValues(_.size).toMap
    val h = sizes.getOrElse(0L, 0)
    val m = sizes.getOrElse(1L, 0)
    val t = sizes.getOrElse(2L, 0)
    val contiguous = buckets == buckets.sorted
    (h + m + t == n) :| s"partition: $h+$m+$t != $n" &&
      (h >= m && m >= t) :| s"non-increasing: $h,$m,$t" &&
      (h - t <= 1) :| s"spread: $h,$m,$t" &&
      contiguous :| "tiers are contiguous in rank order" &&
      (n < 3 || (h > 0 && m > 0 && t > 0)) :| "all three tiers occupied"
  }

  // ── 2. round-robin placement ──────────────────────────────────────
  private val placements = for {
    n <- Gen.choose(1, 500)
    s <- Gen.choose(1, 64)
  } yield (n, s)

  property("roundRobinBalance") = Prop.forAll(placements) { case (n, s) =>
    val byShard = (0 until n).groupBy(_ % s)
    val sizes = (0 until s).map(i => byShard.getOrElse(i, Nil).size)
    val ordered = byShard.values.forall(ps => ps == ps.sorted)
    (sizes.max - sizes.min <= 1) :| s"sizes $sizes" &&
      ordered :| "positions increase within every shard"
  }

  // ── 3. chunk spans ────────────────────────────────────────────────
  private val shards = for {
    b <- Gen.choose(1, 64)
    lens <- Gen.listOf(Gen.choose(0, 150)).map(_.take(60))
  } yield (b, lens.map(_.toLong))

  property("chunkSpans") = Prop.forAll(shards) { case (b, lens) =>
    val ends = lens.scanLeft(0L)(_ + _).tail
    val spans = lens.zip(ends).map { case (nTok, end) =>
      val first = (end - nTok) / b
      val last = math.max(first, (math.max(end, 1L) - 1L) / b)
      (nTok, end, first, last)
    }
    val wellOrdered = spans.forall { case (_, _, f, l) => f <= l }
    // a nonzero doc covers exactly the chunks its interval touches
    val exactCover = spans.forall { case (nTok, end, f, l) =>
      nTok == 0L || (f == (end - nTok) / b && l == (end - 1) / b)
    }
    // no gaps: consecutive docs' spans meet or overlap at the boundary
    val noGaps = spans.sliding(2).forall {
      case Seq((_, _, _, l1), (n2, _, f2, _)) => f2 - l1 <= 1 || n2 == 0L
      case _ => true
    }
    // a 0-token doc collapses to a single chunk index: its start
    // boundary's chunk ((end−1) div b ≤ end div b, so the max picks f)
    val zeroDocs = spans.forall { case (nTok, _, f, l) =>
      nTok != 0L || f == l
    }
    wellOrdered :| "first <= last" &&
      exactCover :| "nonzero docs cover their token interval exactly" &&
      noGaps :| "adjacent docs never leave a chunk gap" &&
      zeroDocs :| "0-token docs occupy exactly one boundary chunk"
  }
}
