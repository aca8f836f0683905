package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.extensions.{Dedup, Packing, Sampling}

/** Bit-stability under task RETRY — the failure mode that corrupts
  * results silently at cluster scale: a 1000-executor job retries
  * thousands of tasks per run (preemption, spot loss, fetch failures),
  * and Spark assumes every task is a pure function of its input split.
  * An operator that samples with wall-clock entropy, ranks by partition
  * arrival order, or hashes object identity would return DIFFERENT rows
  * on the retried attempt — no error, just wrong data. This repo's
  * determinism discipline (md5 keys for sampling and the epoch shuffle,
  * range-partition + frozen placement for global ranks, seeded
  * MinHash) exists for exactly this; here it is pinned under a REAL
  * injected failure: attempt 0 of one task throws, Spark retries
  * (master local[4, 2]), and the result must equal the clean run
  * bitwise. Each test asserts the retry actually happened, so a
  * config change that silently disabled retries cannot turn these
  * green vacuously. */
object RetryDeterminismSpec {
  /** One-shot triggers, keyed by injection token (JVM-wide statics so
    * task closures reach them without capturing the suite). */
  val fired = new ConcurrentHashMap[String, java.lang.Boolean]()
  /** Tokens that saw an attemptNumber > 0 task — proof a retry ran. */
  val retried = new ConcurrentHashMap[String, java.lang.Boolean]()
}

class RetryDeterminismSpec extends SparkSpec {
  import spark.implicits._
  import RetryDeterminismSpec.{fired, retried}

  private def docs: DataFrame =
    (0L until 400L).map(i =>
        (i, s"alpha bravo w$i x${i % 7} y${i % 13} z${i % 3} charlie",
          s"src${i % 3}"))
      .toDF("doc_id", "text", "source")
      .repartition(4)

  /** The injection: attempt 0 of the first task that claims `token`
    * throws once; every later attempt passes rows through untouched and
    * records that a retry executed. */
  private def flaky(df: DataFrame, token: String): DataFrame =
    df.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.attemptNumber() > 0)
        RetryDeterminismSpec.retried.put(token, java.lang.Boolean.TRUE)
      if (tc != null && tc.attemptNumber() == 0 &&
          RetryDeterminismSpec.fired
            .putIfAbsent(token, java.lang.Boolean.TRUE) == null)
        throw new RuntimeException(s"injected transient failure [$token]")
      it
    }(Encoders.row(df.schema))

  private def assertRetried(token: String): Unit = {
    assert(fired.containsKey(token), s"injection [$token] never armed")
    assert(retried.containsKey(token),
      s"no attempt > 0 ran for [$token] — retries are off, test is vacuous")
  }

  private def canon(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  test("epoch shuffle: the retried permutation is the same permutation") {
    val clean = canon(Packing.epochShuffle(docs, seed = 7L))
    val withRetry = canon(Packing.epochShuffle(flaky(docs, "epoch"), seed = 7L))
    assertRetried("epoch")
    assert(withRetry == clean)
  }

  test("global row number: frozen placement + prefix offsets survive a retry") {
    val clean = canon(
      Packing.globalRowNumber(docs, Seq(col("doc_id").desc), "rn"))
    val withRetry = canon(
      Packing.globalRowNumber(flaky(docs, "grn"), Seq(col("doc_id").desc), "rn"))
    assertRetried("grn")
    assert(withRetry == clean)
  }

  test("priority sample: md5 priorities pick the identical k under a retry") {
    val clean = canon(Sampling.prioritySample(docs, k = 25))
    val withRetry = canon(Sampling.prioritySample(flaky(docs, "prio"), k = 25))
    assertRetried("prio")
    assert(withRetry == clean)
  }

  test("minhash signatures: seeded hashing is attempt-invariant") {
    val clean = canon(
      Dedup.signatures(Dedup.shingles(docs, share = false), share = false))
    val withRetry = canon(
      Dedup.signatures(Dedup.shingles(flaky(docs, "mh"), share = false),
        share = false))
    assertRetried("mh")
    assert(withRetry == clean)
  }

  test("curriculum: LM, tiers, shuffle and positions survive a retry bitwise") {
    // the r15 pipeline end to end: reference-LM train + scoring joins,
    // per-language rank thirds, seeded within-stage shuffle, global
    // position — all under one injected attempt-0 failure, which fires
    // inside the LM localCheckpoint (the first consumption of the
    // flaky frame). shareFrames off so the flaky run really builds.
    val cdocs = (0L until 200L).map(i =>
        (i, s"alpha bravo w$i x${i % 7} charlie delta", s"l${i % 3}"))
      .toDF("doc_id", "text", "lang").repartition(4)
    spark.conf.set("spark.graft.dedup.shareFrames", "false")
    try {
      val clean = canon(
        graft.extensions.DataSelection.curriculum(cdocs, seed = 7L))
      val withRetry = canon(
        graft.extensions.DataSelection.curriculum(flaky(cdocs, "curr"), seed = 7L))
      assertRetried("curr")
      assert(withRetry == clean)
    } finally spark.conf.unset("spark.graft.dedup.shareFrames")
  }

  test("reduce-side retry: a post-shuffle task re-fetches and reproduces") {
    def agg(d: DataFrame): DataFrame = d
      .groupBy((col("doc_id") % 11).as("k"))
      .agg(count(lit(1)).as("n"), sum(length(col("text"))).as("chars"))
    val clean = canon(agg(docs))
    // inject ABOVE the aggregate: the failing task is in the stage that
    // READS the shuffle, so its retry exercises fetch + re-aggregation
    val withRetry = canon(flaky(agg(docs), "reduce"))
    assertRetried("reduce")
    assert(withRetry == clean)
  }
}
