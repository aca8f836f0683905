package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.extensions.{Dedup, TextAnalysis}

/** End-to-end live-corpus composition: one arriving stream passes a
  * quality gate and feeds BOTH always-on monitors — near-dup candidates
  * against the persisted LSH index (StreamingDedup) and per-source
  * distribution drift against the persisted vocab profile
  * (DriftMonitor). Each component is spec'd alone; this pins that they
  * COMPOSE: the same gated micro-batch flows through both sinks and
  * every per-batch output equals its batch-mode twin computed on the
  * same gated slice. */
class StreamingPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("gate → dedup candidates → drift: per-batch outputs equal batch twins") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text", "source")
    val index = Dedup.bandBuckets(
      Dedup.shingles(corpus.select("doc_id", "text"), share = false),
      share = false).localCheckpoint()
    val profile = TextAnalysis.vocabProfile(corpus).localCheckpoint()

    // the arriving batch: a near-dup of a corpus doc, a 2-token junk row
    // the gate must drop, and a drifted (disjoint-vocab) healthy doc
    val nearDup = corpus.orderBy("doc_id").limit(1)
      .select(col("text")).as[String].head()
    val batch = Seq(
      (1000001L, nearDup, "a"),
      (1000002L, "the the", "a"), // junk: gated out (< 4 tokens)
      (1000003L, "zz yy xx ww vv uu tt ss", "b"))

    val input = MemoryStream[(Long, String, String)]
    val gated = input.toDF().toDF("doc_id", "text", "source")
      .filter(size(split(col("text"), " ")) >= 4)

    val dedupOut = mutable.Map.empty[Long, Set[(Long, Long)]]
    val driftOut = mutable.Map.empty[Long, Map[String, (Long, Double)]]
    def driftMap(df: DataFrame) = df.collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3))).toMap
    val q1 = StreamingDedup.sink(index, gated.select("doc_id", "text"),
      (pairs, id) => dedupOut.synchronized {
        dedupOut(id) = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }).start()
    val q2 = DriftMonitor.sink(gated, profile,
      (drift, id) => driftOut.synchronized { driftOut(id) = driftMap(drift) })
      .start()
    try {
      input.addData(batch)
      q1.processAllAvailable()
      q2.processAllAvailable()
    } finally { q1.stop(); q2.stop() }

    val gatedBatch = batch.toDF("doc_id", "text", "source")
      .filter(size(split(col("text"), " ")) >= 4)

    // dedup side ≡ batch lshProbe on the gated slice, and it fires
    val expectedPairs = Dedup.lshProbe(index, gatedBatch.select("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dedupOut(0L) == expectedPairs)
    assert(expectedPairs.exists(_._2 == 1000001L),
      "the near-dup of a corpus doc must surface as a candidate")
    assert(!dedupOut(0L).exists(_._2 == 1000002L), "gated junk reaches no sink")

    // drift side ≡ batch driftVsProfile on the gated slice
    val expectedDrift = driftMap(TextAnalysis.driftVsProfile(gatedBatch, profile))
    assert(driftOut(0L) == expectedDrift)
    assert(driftOut(0L)("b")._2 == 0.3466,
      "disjoint-vocab source scores the analytic ln(2)/2")
    // the gate is observable: ungated, source a's vocab totals differ
    val ungated = driftMap(TextAnalysis.driftVsProfile(
      batch.toDF("doc_id", "text", "source"), profile))
    assert(ungated("a")._1 != driftOut(0L)("a")._1,
      "junk row's in-vocab tokens would have shifted source a's totals")
  }
}
