package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.extensions.Dedup

/** MemoryStream proof of the incremental soft-dedup story
  * (r17 verdict #5): replaying a corpus in micro-batches through
  * [[StreamingSoftDedup]] — probing a growing band index, folding each
  * batch's candidate graph into the membership+remap state — reproduces
  * the batch [[Dedup.softDedupMass]]/[[Dedup.softDedupWeights]]
  * EXACTLY, including the batch split that forces two already-admitted
  * components to MERGE through a later bridging document. Labels match
  * bit-for-bit (not just up to relabeling) because both sides
  * canonicalize to the component's min doc_id. */
class StreamingSoftDedupSpec extends SparkSpec {
  import spark.implicits._

  // deterministic bridge fixture (md5 is fixed, so this holds forever):
  // E = T1 ++ T2 shares LSH band 1 with T1 and band 0 with T2 under the
  // default (numHashes=8, rowsPerBand=4) md5 family, while T1 and T2
  // share no band — verified by replicating the exact hash chain
  private val T1 = "w37 w16 w174 w90 w184 w70"
  private val T2 = "w145 w64 w186 w7 w182 w153"
  private val BRIDGE = T1 + " " + T2

  private def emptyIndex: DataFrame =
    spark.range(0).select(col("id").as("doc_id"),
      lit(0).cast("int").as("band"), lit("").as("bkey"))

  private def massSet(df: DataFrame): Set[(String, Long, Double, Double)] =
    df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSet

  private def weightSet(df: DataFrame): Set[(Long, Long, Long, Double)] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet

  /** Drive `batches` through the sink against a growing in-memory index
    * and return the state after each micro-batch. */
  private def replay(
      batches: Seq[Seq[(Long, String, String)]],
      initial: StreamingSoftDedup.State,
      startIndex: DataFrame): Seq[StreamingSoftDedup.State] = {
    implicit val sqlCtx = spark.sqlContext
    var index = startIndex.localCheckpoint()
    val states = mutable.ArrayBuffer.empty[StreamingSoftDedup.State]
    val input = MemoryStream[(Long, String, String)]
    val q = StreamingSoftDedup.sink(
      index,
      input.toDF().toDF("doc_id", "source", "text"),
      initial,
      appendIndex = bands =>
        index = index.unionByName(bands).localCheckpoint(),
      onBatch = (st, _) => states.synchronized { states += st })
      .start()
    try {
      batches.foreach { b =>
        input.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    states.toSeq
  }

  test("replayed harness corpus matches batch softDedupMass and softDedupWeights") {
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "source", "text")
    val rows = docs.as[(Long, String, String)].collect().sortBy(_._1)
    // three batches split by doc_id stripe — near-dup pairs land both
    // within and across batches on the harness corpus
    val batches = Seq(
      rows.filter(_._1 % 3 == 0).toSeq,
      rows.filter(_._1 % 3 == 1).toSeq,
      rows.filter(_._1 % 3 == 2).toSeq)
    val states = replay(batches,
      StreamingSoftDedup.emptyState(spark), emptyIndex)

    assert(massSet(StreamingSoftDedup.mass(states.last)) ==
      massSet(Dedup.softDedupMass(docs)))
    assert(weightSet(StreamingSoftDedup.weights(states.last)) ==
      weightSet(Dedup.softDedupWeights(docs)))
    // the corpus genuinely has near-dup mass to conserve
    assert(StreamingSoftDedup.weights(states.last)
      .filter(col("cluster_size") > 1).count() > 0)
  }

  test("replay guard: a re-delivered batchId folds once; restart skips the pre-crash batch") {
    var index = emptyIndex.localCheckpoint()
    def appendIdx(bands: DataFrame): Unit =
      index = index.unionByName(bands).localCheckpoint()
    val fold = new StreamingSoftDedup.Fold(
      () => index, StreamingSoftDedup.emptyState(spark), appendIdx,
      (_, _) => (), 8, 4, false, -1L)
    val b0 = Seq((1L, "s", T1), (2L, "s", T1))
      .toDF("doc_id", "source", "text")
    val b1 = Seq((3L, "s", T2)).toDF("doc_id", "source", "text")
    fold(b0, 0L)
    val massOnce = massSet(StreamingSoftDedup.mass(fold.state))
    val idxOnce = index.count()
    // recovery replay: Structured Streaming re-delivers batch 0
    fold(b0, 0L)
    assert(fold.state.membership.count() == 2,
      "a replayed batch must not duplicate membership rows")
    assert(massSet(StreamingSoftDedup.mass(fold.state)) == massOnce)
    assert(index.count() == idxOnce,
      "a replayed batch must not append its band rows twice")
    fold(b1, 1L)
    assert(fold.lastAppliedBatchId == 1L)
    val massAll = massSet(StreamingSoftDedup.mass(fold.state))
    // restart: the persisted cursor makes the pre-crash batch a no-op
    val dir = java.nio.file.Files
      .createTempDirectory("ssd-cursor").toFile.getAbsolutePath
    StreamingSoftDedup.saveLastBatchId(spark, dir, fold.lastAppliedBatchId)
    val fold2 = new StreamingSoftDedup.Fold(
      () => index, fold.state, appendIdx, (_, _) => (), 8, 4, false,
      StreamingSoftDedup.loadLastBatchId(spark, dir))
    fold2(b1, 1L) // replay of the already-folded batch after restart
    assert(massSet(StreamingSoftDedup.mass(fold2.state)) == massAll)
    assert(fold2.state.membership.count() == 3)
  }

  test("a later batch merges two admitted components; remap stays depth-1") {
    // batch 0 admits two UNCONNECTED docs; batch 1's bridge doc shares
    // a band with each, so its admission must merge their components —
    // the one transition a naive per-batch labeling cannot represent
    val batches = Seq(
      Seq((10L, "sA", T1), (20L, "sB", T2)),
      Seq((30L, "sC", BRIDGE)))
    val states = replay(batches,
      StreamingSoftDedup.emptyState(spark), emptyIndex)

    // after batch 0: two singleton components, no remap rows
    assert(weightSet(StreamingSoftDedup.weights(states.head)) ==
      Set((10L, 10L, 1L, 1.0), (20L, 20L, 1L, 1.0)))
    assert(states.head.remap.isEmpty)

    // after the bridge: ONE component canonicalized at min id 10; the
    // losing canonical 20 carries the remap row
    assert(weightSet(StreamingSoftDedup.weights(states.last)) ==
      Set((10L, 10L, 3L, 0.333333), (20L, 10L, 3L, 0.333333),
        (30L, 10L, 3L, 0.333333)))
    assert(states.last.remap.as[(Long, Long)].collect().toSet ==
      Set((20L, 10L)))

    // parity with the batch pipeline on the merged corpus
    val full = (batches.flatten).toDF("doc_id", "source", "text")
    assert(massSet(StreamingSoftDedup.mass(states.last)) ==
      massSet(Dedup.softDedupMass(full)))

    // depth-1 forest: no canonical target is itself remapped
    val canons = states.last.remap.select("canon").as[Long].collect().toSet
    val olds = states.last.remap.select("old_comp").as[Long].collect().toSet
    assert(canons.intersect(olds).isEmpty)
  }

  test("smaller-id newcomer takes over as canonical; path compression re-targets old rows") {
    // copies of one text arriving with DECREASING ids: each admission
    // re-canonicalizes the cluster, and the previous remap row must be
    // re-pointed in the same batch (depth-1 invariant under chains)
    val batches = Seq(
      Seq((10L, "s1", T1)),
      Seq((5L, "s1", T1)),
      Seq((3L, "s2", T1)))
    val states = replay(batches,
      StreamingSoftDedup.emptyState(spark), emptyIndex)

    assert(states(1).remap.as[(Long, Long)].collect().toSet ==
      Set((10L, 5L)))
    // the (10 -> 5) row was COMPRESSED to (10 -> 3), not chained
    assert(states(2).remap.as[(Long, Long)].collect().toSet ==
      Set((10L, 3L), (5L, 3L)))
    assert(weightSet(StreamingSoftDedup.weights(states(2))) ==
      Set((10L, 3L, 3L, 0.333333), (5L, 3L, 3L, 0.333333),
        (3L, 3L, 3L, 0.333333)))
    // per-source mass: s1 holds 2 of the 3-cluster, s2 one third
    assert(massSet(StreamingSoftDedup.mass(states(2))) ==
      Set(("s1", 2L, 0.6667, 0.3333), ("s2", 1L, 0.3333, 0.3333)))
  }

  test("restart from persisted state: save -> load -> continue equals uninterrupted") {
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "source", "text")
    val rows = docs.as[(Long, String, String)].collect().sortBy(_._1)
    val batches = Seq(
      rows.filter(_._1 % 3 == 0).toSeq,
      rows.filter(_._1 % 3 == 1).toSeq,
      rows.filter(_._1 % 3 == 2).toSeq)
    // first two batches, then the loop "dies": state checkpointed to
    // parquet, index persisted the way StreamingDedup's growth loop
    // already does
    val twoIn = replay(batches.take(2),
      StreamingSoftDedup.emptyState(spark), emptyIndex)
    val dir = java.nio.file.Files
      .createTempDirectory("softdedup-state").toString
    StreamingSoftDedup.save(twoIn.last, dir)
    val indexAfter2 = emptyIndex.unionByName(
      Dedup.bandBucketsRowLocal(
        batches.take(2).flatten.toDF("doc_id", "source", "text")
          .select("doc_id", "text")))
      .localCheckpoint()

    // restart: state reloaded from disk, batch 2 folds in
    val resumed = replay(Seq(batches(2)),
      StreamingSoftDedup.load(spark, dir), indexAfter2)
    assert(massSet(StreamingSoftDedup.mass(resumed.last)) ==
      massSet(Dedup.softDedupMass(docs)))
    assert(weightSet(StreamingSoftDedup.weights(resumed.last)) ==
      weightSet(Dedup.softDedupWeights(docs)))
  }

  test("fromCorpus bootstrap: admissions continue a batch-deduped corpus") {
    // corpus processed in batch mode, then the stream takes over — the
    // refresh-cadence handoff the scaladoc promises
    val corpus = Seq((10L, "sA", T1), (20L, "sB", T2))
      .toDF("doc_id", "source", "text")
    val index = Dedup.bandBuckets(Dedup.shingles(corpus, share = false),
      share = false)
    val states = replay(Seq(Seq((30L, "sC", BRIDGE))),
      StreamingSoftDedup.fromCorpus(corpus), index)

    val full = Seq((10L, "sA", T1), (20L, "sB", T2), (30L, "sC", BRIDGE))
      .toDF("doc_id", "source", "text")
    assert(massSet(StreamingSoftDedup.mass(states.last)) ==
      massSet(Dedup.softDedupMass(full)))
    assert(weightSet(StreamingSoftDedup.weights(states.last)) ==
      weightSet(Dedup.softDedupWeights(full)))
  }
}
