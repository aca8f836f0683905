package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.extensions.Dedup

/** MemoryStream proof of the live-corpus near-dup story: each
  * micro-batch's candidates from [[StreamingDedup]] equal the batch
  * [[Dedup.lshProbe]] run on the same documents against the same index —
  * the stream/batch parity contract promised in Dedup's scaladoc. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("micro-batch candidates match the batch lshProbe, batch by batch") {
    implicit val sqlCtx = spark.sqlContext
    // corpus = harness documents; index built once, the way a real
    // pipeline persists it
    val corpus = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val index = Dedup.bandBuckets(Dedup.shingles(corpus, share = false))
      .localCheckpoint()

    // two arriving batches: near-dups of corpus docs (doc_id offset so
    // ids never collide) plus one unrelated doc that must match nothing
    val near = corpus.orderBy("doc_id").limit(3)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val batch1 = near.take(2) :+ ((9999999L, "zz yy xx ww vv uu tt ss"))
    val batch2 = near.drop(2)

    val input = MemoryStream[(Long, String)]
    val newDocs = input.toDF().toDF("doc_id", "text")

    val perBatch = mutable.Map.empty[Long, Set[(Long, Long)]]
    val q = StreamingDedup.sink(index, newDocs,
      (pairs, id) => perBatch.synchronized { perBatch(id) = pairSet(pairs) })
      .start()
    try {
      input.addData(batch1.toIndexedSeq)
      q.processAllAvailable()
      input.addData(batch2.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    def expected(rows: Seq[(Long, String)]): Set[(Long, Long)] =
      pairSet(Dedup.lshProbe(index, rows.toDF("doc_id", "text")))

    val exp1 = expected(batch1.toIndexedSeq)
    val exp2 = expected(batch2.toIndexedSeq)
    // a copy of a corpus doc shares its full shingle set -> identical
    // signature -> must surface; the unrelated doc must not
    assert(exp1.nonEmpty)
    assert(!exp1.exists(_._2 == 9999999L))
    val nonEmpty = perBatch.filter(_._2.nonEmpty)
    assert(nonEmpty.values.toSet == Set(exp1, exp2).filter(_.nonEmpty))
  }

  test("bucketed on-disk index: the per-batch probe join plans NO index-side exchange") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper

    // SparkPlan.collect stops at AQE/query-stage boundaries; walk through
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
      case q: QueryStageExec => p +: flatten(q.plan)
      case _ => p +: p.children.flatMap(flatten)
    }

    // the scaladoc's scale claim, pinned: with the index persisted
    // bucketed by (band, bkey), each micro-batch's stream-static join
    // reads the index straight from its buckets — the only exchange in
    // the plan is the batch-sized stream side
    val corpus = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    graft.plans.Layout.writeBucketed(
      Dedup.bandBuckets(Dedup.shingles(corpus, share = false), share = false),
      "sd_idx_bkt", Seq("band", "bkey"), 4)
    val near = corpus.orderBy("doc_id").limit(1)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      .as[(Long, String)].collect()

    val input = MemoryStream[(Long, String)]
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1) // the 100 TB index never broadcasts
    val got = mutable.ArrayBuffer.empty[(Long, Long)]
    val q = StreamingDedup.sink(spark.table("sd_idx_bkt"),
      input.toDF().toDF("doc_id", "text"),
      (pairs, _) => { val p = pairSet(pairs); got.synchronized { got ++= p } })
      .start()
    try {
      input.addData(near.toIndexedSeq)
      q.processAllAvailable()
      val exec = q.asInstanceOf[StreamingQueryWrapper].streamingQuery
        .lastExecution.executedPlan
      val joins = flatten(exec).collect { case j: SortMergeJoinExec => j }
      assert(joins.nonEmpty, s"probe join must be a sort-merge join:\n$exec")
      val sides = Seq(joins.head.left, joins.head.right).map(flatten)
      val idxSide = sides.find(_.exists {
        case f: FileSourceScanExec => f.bucketedScan
        case _ => false
      })
      assert(idxSide.isDefined, s"no bucketed scan on either join side:\n$exec")
      assert(!idxSide.get.exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"index side must read its buckets exchange-free:\n$exec")
      val streamSide = sides.find(s => !(s eq idxSide.get)).get
      assert(streamSide.count(_.isInstanceOf[ShuffleExchangeExec]) == 1,
        s"the one exchange is the batch-sized stream side:\n$exec")
      assert(got.toSet.nonEmpty, "the probe against the bucketed index fired")
    } finally {
      q.stop()
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS sd_idx_bkt")
    }
  }

  test("growing index: an admitted batch's bands are visible to the next batch, no restart") {
    implicit val sqlCtx = spark.sqlContext
    // the scaladoc's index-growth claim, end-to-end: the admission loop
    // appends each accepted batch's band rows into the bucketed table,
    // and because a stream-static join re-lists the static side's files
    // every micro-batch, a later batch's probe sees earlier stream
    // documents with no restart and no state migration
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    graft.plans.Layout.writeBucketed(
      Dedup.bandBuckets(Dedup.shingles(corpus, share = false), share = false),
      "sd_grow_idx", Seq("band", "bkey"), 4)

    val input = MemoryStream[(Long, String)]
    val perBatch = mutable.Map.empty[Long, Set[(Long, Long)]]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          // the reader refreshes ITS session's cached relation before
          // probing: appendBucketed refreshes the writer's session, but
          // foreachBatch runs under a session clone, so a by-name index
          // reader in another session re-lists explicitly (the
          // index-freshness contract in StreamingDedup's scaladoc)
          spark.catalog.refreshTable("sd_grow_idx")
          val pairs = StreamingDedup
            .candidates(spark.table("sd_grow_idx"), batch).distinct()
          perBatch.synchronized { perBatch(id) = pairSet(pairs) }
          // admission: the accepted batch joins the index
          graft.plans.Layout.appendBucketed(
            Dedup.bandBucketsRowLocal(batch),
            "sd_grow_idx", Seq("band", "bkey"), 4)
      }
      .start()
    try {
      // batch 0: a brand-new doc — matches nothing, gets admitted
      input.addData((100L, "one two three four five six"))
      q.processAllAvailable()
      // batch 1: a copy of the batch-0 doc — must surface AGAINST THE
      // APPENDED ROWS (the original corpus never contained doc 100)
      input.addData((200L, "one two three four five six"))
      q.processAllAvailable()
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS sd_grow_idx")
    }
    assert(perBatch(0L).isEmpty, "a novel doc matches nothing")
    assert(perBatch(1L) == Set((100L, 200L)),
      "the batch-1 probe must hit the doc admitted in batch 0")
  }

  test("streaming plan keeps no state: stateless banding + stream-static join") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val index = Dedup.bandBuckets(Dedup.shingles(corpus, share = false))
    val input = MemoryStream[(Long, String)]
    val out = mutable.ArrayBuffer.empty[(Long, Long)]
    val q = StreamingDedup.sink(index, input.toDF().toDF("doc_id", "text"),
      (pairs, _) => { val p = pairSet(pairs); out.synchronized { out ++= p } })
      .start()
    try {
      input.addData((2L, "alpha beta gamma delta epsilon zeta"))
      q.processAllAvailable()
      // no stateful operator anywhere in the executed streaming plan
      assert(q.lastProgress.stateOperators.isEmpty)
      assert(out.toSet == Set((1L, 2L)))
    } finally q.stop()
  }
}
