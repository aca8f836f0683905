package graft.extensions

import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.BloomProbe

/** Bloom-prefiltered cross-corpus membership — the decontamination /
  * "is this already in the reference set?" probe at 100 TB shape.
  *
  * A plain semi-join shuffles EVERY row of the big side on the key; when
  * 99% of rows cannot match (the common case — a benchmark or reference
  * corpus is tiny next to a crawl), that shuffle is almost entirely
  * wasted I/O. Instead: build a Bloom filter over the reference keys
  * once (a treeAggregate producing a few MB of bitset), broadcast it,
  * and drop non-members AT THE SCAN with a codegen-friendly native
  * expression before the exact semi-join removes the false positives.
  * Only the ~fpp fraction of non-matching rows (plus true matches) ever
  * reach the exchange. Same shape as Spark's own AQE runtime bloom
  * filter (InjectRuntimeFilter), made explicit and persistable: a
  * production pipeline builds the filter when the reference set changes
  * and reuses the bytes across every batch.
  *
  * EAGER by design: constructing the returned DataFrame runs the `ref`
  * scan + treeAggregate NOW (a driver-blocking job), because the filter
  * bitset must exist before the big-side plan can embed a probe of it.
  * Callers on a hot path should build once and reuse — the broadcast
  * survives for the session.
  *
  * Sizing: a 1% fpp filter costs ~1.2 bytes/item — 10⁷ reference keys
  * ≈ 12 MB, fine as a broadcast (MembershipSpec proves the 10⁷ probe);
  * ~10⁸ keys ≈ 120 MB is the practical single-driver ceiling. Beyond
  * that, partition the reference set and apply per-partition filters, or
  * fall back to the exact semi-join, which is what the post-filter join
  * already is. The filter rides a BROADCAST VARIABLE (scalar handle in
  * the plan, bitset shipped once per executor) — never a plan-embedded
  * byte literal, which Catalyst would copy on every transform and
  * re-serialize with every stage (see [[graft.functions.BloomProbe]]).
  */
object Membership {

  private val probeId = new AtomicLong(0)

  /** Built filters, memoized per (session, canonicalized ref plan,
    * keyCol, expectedItems, fpp) — the same pattern as
    * `Dedup.frameMemo`: a filter is ~1.2 bytes/item (up to ~120 MB at
    * the 10⁸-key ceiling), so re-broadcasting one per CALL would
    * accumulate that much driver+executor storage for the session
    * lifetime on any repeated (e.g. per-batch) use. Entries are
    * destroyed on application end; [[evictFilters]] frees them
    * sooner. */
  private val filterMemo =
    TrieMap.empty[(SparkSession, Any), Broadcast[BloomFilter]]
  private val evictionHooked = TrieMap.empty[SparkSession, Boolean]

  /** Broadcasts swapped out by a `refresh`, awaiting destruction: an
    * unpersist'ed broadcast keeps its driver copy until app end, so a
    * long-lived session refreshing on a tight cadence would accumulate
    * one ~MB bitset per refresh on the driver heap. Keyed like the memo
    * (per filter, not per session) so one key's refresh can never cut
    * short ANOTHER key's grace cycle. Each retiree carries its
    * retirement timestamp and is destroyed only once a WALL-CLOCK grace
    * ([[RetireGraceMsConf]], default 5 min) has elapsed — a grace
    * counted in refresh CALLS would let two quick same-key refreshes
    * (two callers at startup, a tight maintenance loop) destroy a
    * broadcast created moments earlier while an in-flight or retained
    * query plan still references it, the exact race unpersist-only code
    * avoids. Retirees younger than the grace stay parked (worst-case
    * heap: refresh-rate × grace window, bounded for any sane cadence)
    * until a later same-key refresh ages them out or app end destroys
    * them unconditionally. */
  private val retired =
    TrieMap.empty[(SparkSession, Any), List[(Broadcast[BloomFilter], Long)]]

  /** Session conf key for the retired-broadcast destruction grace in
    * milliseconds. Default 300000 (5 min) — long enough for any
    * in-flight query that captured the old broadcast to finish. */
  val RetireGraceMsConf = "spark.graft.bloom.retireGraceMs"
  private val DefaultRetireGraceMs = 300000L

  private def memoizedFilter(spark: SparkSession, key: Any)(
      build: => Broadcast[BloomFilter]): Broadcast[BloomFilter] = {
    evictionHooked.getOrElseUpdate(spark, {
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
          evictFilters(spark)
      })
      true
    })
    filterMemo.getOrElseUpdate((spark, key), build)
  }

  /** Drop one memoized filter (rebuild-and-swap for `refresh`).
    * `unpersist`, NOT `destroy`, for the filter being swapped: a
    * concurrent query in the same session may still be executing
    * against the old broadcast, and destroy() invalidates in-use data
    * mid-flight. unpersist(blocking = false) removes the executor
    * copies (in-flight tasks re-fetch from the driver) so the swap is
    * race-free; the broadcast then parks in this key's [[retired]] list
    * with its retirement timestamp. Retirees whose wall-clock grace
    * ([[RetireGraceMsConf]]) has elapsed are destroyed here; younger
    * ones stay parked for a later refresh or the app-end destroy —
    * destruction is gated on TIME, never on refresh count, so
    * back-to-back refreshes cannot invalidate a broadcast an in-flight
    * query still references. */
  private def dropFilter(spark: SparkSession, key: Any): Unit = {
    val graceMs = spark.conf.getOption(RetireGraceMsConf)
      .map(_.toLong).getOrElse(DefaultRetireGraceMs)
    val now = System.currentTimeMillis()
    val (aged, young) = retired.remove((spark, key)).getOrElse(Nil)
      .partition { case (_, t) => now - t >= graceMs }
    aged.foreach(_._1.destroy())
    val swapped = filterMemo.remove((spark, key)).map { b =>
      b.unpersist(blocking = false)
      (b, now)
    }
    val keep = young ++ swapped
    if (keep.nonEmpty) retired.put((spark, key), keep)
  }

  /** Destroy this session's memoized filter broadcasts. Full teardown —
    * unlike the `refresh` swap this destroys driver copies too, so don't
    * race it against in-flight queries still probing a filter. */
  def evictFilters(spark: SparkSession): Unit = {
    filterMemo.keys.filter(_._1 eq spark).foreach { k =>
      filterMemo.remove(k).foreach(_.destroy())
    }
    retired.keys.filter(_._1 eq spark).foreach { k =>
      retired.remove(k).foreach(_.foreach(_._1.destroy()))
    }
    evictionHooked.remove(spark)
  }

  /** Build (or fetch the session-memoized) broadcast Bloom over `ref`'s
    * 64-bit `hashCol` values — the filter half of [[bloomSemiJoin]],
    * exposed for siblings whose probe is NOT followed by an exact join
    * ([[LineDedup.dedupLinesBloom]]'s keep-zero scrub, where a false
    * positive is a tolerated extra drop rather than something a
    * semi-join re-checks). Same memo, staleness contract and app-end
    * eviction as [[bloomSemiJoin]]'s filters; callers guard the
    * zero-row NPE themselves (an empty reference usually short-circuits
    * the whole probe). */
  private[graft] def hashSetFilter(
      ref: DataFrame, hashCol: String, expectedItems: Long,
      fpp: Double): Broadcast[BloomFilter] = {
    val spark = ref.sparkSession
    val memoKey = ("hashset", ref.queryExecution.analyzed.canonicalized,
      hashCol, expectedItems, fpp)
    memoizedFilter(spark, memoKey) {
      spark.sparkContext.broadcast(
        ref.stat.bloomFilter(hashCol, expectedItems, fpp))
    }
  }

  /** Filter `df` by a broadcast Bloom probe of `hash` (a 64-bit key
    * expression): keeps rows whose membership answer equals
    * `keepMembers`. The throwaway function-registry seam of
    * [[bloomSemiJoin]] (DataFrame analysis is eager, so the temp
    * registration lives only for the filter call). With
    * `keepMembers = false` the false-positive direction is EXTRA DROPS
    * — the caller owns that contract. */
  private[graft] def filterByProbe(
      df: DataFrame, bfBc: Broadcast[BloomFilter], hash: Column,
      keepMembers: Boolean): DataFrame = {
    val fname = s"graft_bloom_probe_${probeId.incrementAndGet()}"
    val registry = df.sparkSession.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      fname, args => BloomProbe(args.head, bfBc), "built-in")
    try {
      val p = call_function(fname, hash)
      df.filter(if (keepMembers) p else !p)
    } finally registry.dropFunction(FunctionIdentifier(fname))
  }

  /** Rows of `big` whose `keyCol` appears in `ref`'s `keyCol` —
    * exactly the left-semi join result; the Bloom filter only prunes
    * the shuffle.
    *
    * STALENESS CONTRACT of the memoized filter: the broadcast is keyed
    * on `ref`'s CANONICALIZED PLAN, not its data. If the reference is a
    * mutable source (JDBC table, re-written parquet path) whose contents
    * change under a plan-equal read, the cached filter no longer covers
    * newly added keys — and since the filter prunes BEFORE the exact
    * semi-join, missing keys mean silently dropped rows. For mutable
    * references pass `refresh = true` (rebuild-and-swap: the stale
    * broadcast is destroyed, the memo stays leak-free) or call
    * [[evictFilters]] on the maintenance cadence. Immutable snapshot
    * frames — the intended use — are unaffected. */
  def bloomSemiJoin(
      big: DataFrame,
      ref: DataFrame,
      keyCol: String,
      expectedItems: Long,
      fpp: Double = 0.01,
      refresh: Boolean = false): DataFrame = {
    val exactSemi =
      big.join(ref.select(col(keyCol)).distinct(), Seq(keyCol), "left_semi")
    // stat.bloomFilter NPEs on zero reference rows (the aggregate's merge
    // buffer never initializes); an empty reference also makes the
    // prefilter pointless — the semi-join alone answers (with no rows)
    if (ref.isEmpty) return exactSemi
    val spark = big.sparkSession
    val memoKey =
      (ref.queryExecution.analyzed.canonicalized, keyCol, expectedItems, fpp)
    if (refresh) dropFilter(spark, memoKey)
    val bfBc = memoizedFilter(spark, memoKey) {
      spark.sparkContext.broadcast(
        ref.select(xxhash64(col(keyCol)).as("k"))
          .stat.bloomFilter("k", expectedItems, fpp))
    }
    // A function-registry builder is the one public seam that lets a
    // captured broadcast become an Expression — see [[filterByProbe]].
    filterByProbe(big, bfBc, xxhash64(col(keyCol)), keepMembers = true)
      .join(ref.select(col(keyCol)).distinct(), Seq(keyCol), "left_semi")
  }
}
