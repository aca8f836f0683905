package graft

/** Dev lever: the WordPiece batched-trainer amortization (r19 VERDICT
  * #3) — serial [[graft.extensions.WordPiece.learn]] vs
  * [[graft.extensions.WordPiece.learnBatched]] at the same merge count
  * over the harness corpus, printing wall time AND the Spark job count
  * (the driver-round-trip bill batching exists to cut: serial pays one
  * ranked-pairs aggregation + collect PER MERGE; batched pays one per
  * ~batchSize merges).
  *
  * Usage: runMain graft.TimeWpBatch [sfDir] [numMerges] [batchSize] [reps] */
object TimeWpBatch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val numMerges = if (args.length > 1) args(1).toInt else 48
    val batchSize = if (args.length > 2) args(2).toInt else 16
    val reps = if (args.length > 3) args(3).toInt else 3
    val spark = GraftSession.tool(defaultCpus = 8, logLevel = "ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = Tables.table(spark, sfDir, "documents")

    def jobsDuring(body: => Unit): Long = {
      val counter = new java.util.concurrent.atomic.AtomicLong(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          counter.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(l)
      // drain queued listener events before reading the counter (the
      // public seam; the internal listenerBus is sc-private)
      try { body; Thread.sleep(200) }
      finally spark.sparkContext.removeSparkListener(l)
      counter.get()
    }

    // time INSIDE the jobsDuring body: its listener-drain sleep would
    // otherwise add a constant +0.2 s to every printed sec
    (1 to reps).foreach { i =>
      var tr: Seq[graft.extensions.WordPiece.Merge] = Seq.empty
      var sec = 0.0
      val jobs = jobsDuring {
        val t0 = System.nanoTime()
        tr = graft.extensions.WordPiece.learn(docs, numMerges)
        sec = (System.nanoTime() - t0) / 1e9
      }
      println(f"LEVER wp_serial rep=$i merges=${tr.size} jobs=$jobs " +
        f"sec=$sec%.2f")
    }
    (1 to reps).foreach { i =>
      var tr: Seq[graft.extensions.WordPiece.Merge] = Seq.empty
      var sec = 0.0
      val jobs = jobsDuring {
        val t0 = System.nanoTime()
        tr = graft.extensions.WordPiece.learnBatched(docs, numMerges, batchSize)
        sec = (System.nanoTime() - t0) / 1e9
      }
      println(f"LEVER wp_batched$batchSize rep=$i merges=${tr.size} jobs=$jobs " +
        f"sec=$sec%.2f")
    }
    spark.stop()
  }
}
