package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.merge.ScdMerge

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("StatefulMerge tracks lifecycle per key across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StatefulMerge.KeyObs]
    val out = StatefulMerge(input.toDS())
    val q = out.writeStream.format("memory").queryName("lifecycle")
      .outputMode("append").start()
    try {
      input.addData(
        StatefulMerge.KeyObs(1L, "2021-01-01", 100L),
        StatefulMerge.KeyObs(2L, "2021-01-01", 200L))
      q.processAllAvailable()
      input.addData(
        StatefulMerge.KeyObs(1L, "2021-01-08", 100L), // unchanged
        StatefulMerge.KeyObs(2L, "2021-01-08", 201L)) // changed
      q.processAllAvailable()
      val rows = spark.table("lifecycle")
        .as[StatefulMerge.KeyLifecycle].collect()
        .groupBy(_.id).map { case (k, v) => k -> v.sortBy(_.updatedAt).last }
      assert(rows(1L) == StatefulMerge.KeyLifecycle(1L, "2021-01-01", "2021-01-01", changed = false))
      assert(rows(2L) == StatefulMerge.KeyLifecycle(2L, "2021-01-01", "2021-01-08", changed = true))
    } finally q.stop()
  }

  test("file-source snapshot stream merges dated dirs through foreachBatch") {
    val root = Files.createTempDirectory("snapstream").toFile.getAbsolutePath
    val stateDir = Files.createTempDirectory("snapstate").toFile.getAbsolutePath

    def writeSnapshot(date: String, rows: Seq[(Long, String)]): Unit = {
      val dir = new java.io.File(s"$root/$date")
      dir.mkdirs()
      val f = new java.io.PrintWriter(s"$root/$date/result.csv")
      f.println("id,name")
      rows.foreach { case (id, n) => f.println(s"$id,$n") }
      f.close()
    }

    writeSnapshot("2021-01-01", Seq(1L -> "a", 2L -> "b"))
    writeSnapshot("2021-01-08", Seq(1L -> "a2"))

    var state: DataFrame = ScdMerge.emptyState(
      Seq.empty[(Long, String)].toDF("id", "name"))

    val stream = SnapshotStream.readSnapshots(
      spark, root, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType))))

    val q = SnapshotStream.mergeSink(
      stream.writeStream, "id", Seq("name"),
      () => state, m => { state = m.cache(); m.count() }
    ).start()
    try q.processAllAvailable() finally q.stop()

    val m = state.select(col("id"), col("name"),
        date_format(col("added_at"), "yyyy-MM-dd"),
        date_format(col("updated_at"), "yyyy-MM-dd"),
        date_format(col("removed_at"), "yyyy-MM-dd"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getString(3), r.getString(4)))).toMap
    assert(m(1L) == (("a2", "2021-01-01", "2021-01-08", null)))
    assert(m(2L) == (("b", "2021-01-01", "2021-01-01", "2021-01-08")))
  }

  test("transformWithState variant matches mapGroupsWithState outputs") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[StatefulMerge.KeyObs]
      val q = StatefulMergeTws(input.toDS()).writeStream.format("memory")
        .queryName("tws_lifecycle").outputMode("append").start()
      try {
        input.addData(
          StatefulMerge.KeyObs(1L, "2021-01-01", 100L),
          StatefulMerge.KeyObs(2L, "2021-01-01", 200L))
        q.processAllAvailable()
        input.addData(
          StatefulMerge.KeyObs(1L, "2021-01-08", 100L), // unchanged
          StatefulMerge.KeyObs(2L, "2021-01-08", 201L)) // changed
        q.processAllAvailable()
        val rows = spark.table("tws_lifecycle")
          .as[StatefulMerge.KeyLifecycle].collect()
          .groupBy(_.id).map { case (k, v) => k -> v.sortBy(_.updatedAt).last }
        // identical to the mapGroupsWithState expectations above:
        // shared foldKey, different state API
        assert(rows(1L) == StatefulMerge.KeyLifecycle(1L, "2021-01-01", "2021-01-01", changed = false))
        assert(rows(2L) == StatefulMerge.KeyLifecycle(2L, "2021-01-01", "2021-01-08", changed = true))
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("StatefulMerge runs on the RocksDB state store (40M-key path)") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[StatefulMerge.KeyObs]
      val q = StatefulMerge(input.toDS()).writeStream.format("memory")
        .queryName("rocks_lifecycle").outputMode("append").start()
      try {
        input.addData(StatefulMerge.KeyObs(9L, "2021-01-01", 1L))
        q.processAllAvailable()
        input.addData(StatefulMerge.KeyObs(9L, "2021-01-08", 2L))
        q.processAllAvailable()
        val last = spark.table("rocks_lifecycle")
          .as[StatefulMerge.KeyLifecycle].collect().maxBy(_.updatedAt)
        assert(last == StatefulMerge.KeyLifecycle(9L, "2021-01-01", "2021-01-08", changed = true))
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  // Both TTL tests disable no-data micro-batches: with processing-time
  // state (TTL / ProcessingTimeTimeout) the engine's shouldRunAnotherBatch
  // otherwise schedules empty batches back-to-back to evaluate expiry and
  // the query never quiesces for processAllAvailable. Expiry semantics
  // don't need those batches here — TTL is checked when the state is READ
  // and timeouts fire in whatever batch runs next — so the tests drive
  // expiry with ordinary data batches after a real-clock sleep.

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("Tws state TTL: an idle key leaves the store and re-enters fresh") {
    withConfs(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.noDataMicroBatches.enabled" -> "false") {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[StatefulMerge.KeyObs]
      val q = StatefulMergeTws(input.toDS(),
          ttl = Some(java.time.Duration.ofMillis(200)))
        .writeStream.format("memory").queryName("tws_ttl")
        .outputMode("append").start()
      try {
        input.addData(StatefulMerge.KeyObs(1L, "2021-01-01", 100L))
        q.processAllAvailable()
        Thread.sleep(800) // > TTL: key 1's state expires
        // same payload hash: live state would answer changed=false with
        // the ORIGINAL addedAt; expired state must re-initialize
        input.addData(StatefulMerge.KeyObs(1L, "2021-02-01", 100L))
        q.processAllAvailable()
        val last = spark.table("tws_ttl")
          .as[StatefulMerge.KeyLifecycle].collect().maxBy(_.updatedAt)
        assert(last == StatefulMerge.KeyLifecycle(
          1L, "2021-02-01", "2021-02-01", changed = true))
      } finally q.stop()
    }
  }

  test("Tws timers: idle key emits a tombstone, state clears, key re-enters fresh") {
    withConfs(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.noDataMicroBatches.enabled" -> "false") {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[StatefulMerge.KeyObs]
      val q = StatefulMergeTws.withTombstones(input.toDS(),
          idle = java.time.Duration.ofMillis(200))
        .writeStream.format("memory").queryName("tws_tomb")
        .outputMode("append").start()
      try {
        input.addData(StatefulMerge.KeyObs(5L, "2021-01-01", 100L))
        q.processAllAvailable()
        Thread.sleep(800) // > idle window: key 5's timer is due
        // an unrelated key drives the batch in which the timer fires
        input.addData(StatefulMerge.KeyObs(6L, "2021-02-01", 200L))
        q.processAllAvailable()
        input.addData(StatefulMerge.KeyObs(5L, "2021-03-01", 100L))
        q.processAllAvailable()
        val rows = spark.table("tws_tomb")
          .as[StatefulMergeTws.KeyEvent].collect()
        // the tombstone carries the key's last-known lifecycle
        val tomb = rows.filter(r => r.id == 5L && r.tombstone)
        assert(tomb.toSeq == Seq(StatefulMergeTws.KeyEvent(
          5L, "2021-01-01", "2021-01-01", changed = false, tombstone = true)))
        // after the tombstone the key re-enters as a fresh insert (same
        // payload hash: surviving state would have said changed=false)
        val after = rows.filter(r => r.id == 5L && r.updatedAt == "2021-03-01")
        assert(after.toSeq == Seq(StatefulMergeTws.KeyEvent(
          5L, "2021-03-01", "2021-03-01", changed = true, tombstone = false)))
      } finally q.stop()
    }
  }

  test("OrderedProcessor: a late cross-batch observation re-folds correctly") {
    withConfs(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[StatefulMerge.KeyObs]
      val q = StatefulMergeTws.orderRepaired(input.toDS())
        .writeStream.format("memory").queryName("tws_ordered")
        .outputMode("append").start()
      try {
        // the NEWER snapshot arrives first...
        input.addData(StatefulMerge.KeyObs(1L, "2021-01-08", 200L))
        q.processAllAvailable()
        // ...then a LATE batch delivers the older one with a different
        // payload. A value-state fold would compare the old payload
        // against the newer state: changed=true with updatedAt dragged
        // BACK to 01-01 and the stale payload overwriting the newer one.
        input.addData(StatefulMerge.KeyObs(1L, "2021-01-01", 100L))
        q.processAllAvailable()
        val rows = spark.table("tws_ordered")
          .as[StatefulMerge.KeyLifecycle].collect()
        // re-folding the sorted history gives the true lifecycle:
        // added 01-01, last real change 01-08
        assert(rows.last == StatefulMerge.KeyLifecycle(
          1L, "2021-01-01", "2021-01-08", changed = true))
      } finally q.stop()
    }
  }

  test("GroupStateTimeout TTL: timed-out key is removed, reappears fresh") {
    withConfs("spark.sql.streaming.noDataMicroBatches.enabled" -> "false") {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[StatefulMerge.KeyObs]
      val q = StatefulMerge.applyWithTtl(input.toDS(), ttlMs = 200)
        .writeStream.format("memory").queryName("mgws_ttl")
        .outputMode("append").start()
      try {
        input.addData(StatefulMerge.KeyObs(7L, "2021-01-01", 100L))
        q.processAllAvailable()
        Thread.sleep(800) // > TTL
        // an unrelated key drives the batch in which key 7 times out
        // (hasTimedOut → state.remove()); timeouts fire when a batch runs
        input.addData(StatefulMerge.KeyObs(8L, "2021-02-01", 200L))
        q.processAllAvailable()
        input.addData(StatefulMerge.KeyObs(7L, "2021-03-01", 100L))
        q.processAllAvailable()
        val last7 = spark.table("mgws_ttl")
          .as[StatefulMerge.KeyLifecycle].collect()
          .filter(_.id == 7L).maxBy(_.updatedAt)
        // same payload hash as before the timeout: surviving state would
        // say changed=false with addedAt 2021-01-01
        assert(last7 == StatefulMerge.KeyLifecycle(
          7L, "2021-03-01", "2021-03-01", changed = true))
      } finally q.stop()
    }
  }

  test("checkpointed file-source restart does not re-feed processed snapshots") {
    val root = Files.createTempDirectory("snapckpt").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("ckptdir").toFile.getAbsolutePath

    def writeSnapshot(date: String, rows: Seq[(Long, String)]): Unit = {
      new java.io.File(s"$root/$date").mkdirs()
      val f = new java.io.PrintWriter(s"$root/$date/result.csv")
      f.println("id,name")
      rows.foreach { case (id, n) => f.println(s"$id,$n") }
      f.close()
    }

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType)))

    var feedCount = 0
    var state: DataFrame = ScdMerge.emptyState(Seq.empty[(Long, String)].toDF("id", "name"))
    def sink() = SnapshotStream.mergeSink(
      SnapshotStream.readSnapshots(spark, root, schema)
        .writeStream.option("checkpointLocation", ckpt),
      "id", Seq("name"),
      () => state, m => { feedCount += 1; state = m.cache(); m.count() })

    writeSnapshot("2021-02-01", Seq(1L -> "a"))
    val q1 = sink().start()
    try q1.processAllAvailable() finally q1.stop()
    assert(feedCount == 1)

    // restart from the same checkpoint with a new snapshot present:
    // only the NEW dated dir is fed (exactly-once file tracking replaces
    // the reference's high-water-mark bookkeeping)
    writeSnapshot("2021-02-08", Seq(2L -> "b"))
    val q2 = sink().start()
    try q2.processAllAvailable() finally q2.stop()
    assert(feedCount == 2)

    val m = state.select($"id", date_format($"added_at", "yyyy-MM-dd"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(1L -> "2021-02-01", 2L -> "2021-02-08"))
  }

  test("weeklyCounts groups a watermarked stream into 7-day windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val stream = input.toDF().toDF("ts", "v")
    val counts = SnapshotStream.weeklyCounts(stream, "ts")
    val q = counts.writeStream.format("memory").queryName("weekly")
      .outputMode("append").start()
    try {
      input.addData(
        (java.sql.Timestamp.valueOf("2021-01-01 10:00:00"), 1L),
        (java.sql.Timestamp.valueOf("2021-01-02 10:00:00"), 2L),
        (java.sql.Timestamp.valueOf("2021-01-09 10:00:00"), 3L))
      q.processAllAvailable()
      // push watermark far forward to close the first windows
      input.addData((java.sql.Timestamp.valueOf("2021-03-01 10:00:00"), 4L))
      q.processAllAvailable()
      val rows = spark.table("weekly")
        .select(date_format(col("wstart"), "yyyy-MM-dd"), col("n"))
        .as[(String, Long)].collect().toMap
      assert(rows("2020-12-31") == 2L)
      assert(rows("2021-01-07") == 1L)
    } finally q.stop()
  }
}
