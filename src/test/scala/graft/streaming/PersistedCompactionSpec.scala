package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.extensions.Postings

/** The OPERATIONAL form of [[StreamingPostings.sinkCompacting]]:
  * StreamingCompactionSpec proves the policy semantics over in-memory
  * (localCheckpoint) frames; this spec runs the same sink against the
  * storage layout a production deployment would use —
  *
  *  - the base index is a plain parquet directory, replaced by
  *    write-to-tmp + directory swap at each fold (the
  *    [[graft.sources.SnapshotSource]] publish discipline);
  *  - the delta log is a parquet directory PARTITIONED BY batch_id
  *    (`log/batch_id=N/`), so the overwrite-by-id persist the
  *    exactly-once contract needs is a per-partition overwrite, and
  *    truncation after a fold is deleting the folded partitions;
  *  - the sink's by-name `base`/`log` arguments re-READ the
  *    directories each batch, so post-compaction batches see the
  *    swapped base exactly as a restarted job would.
  *
  * Pinned: the policy fires mid-stream against the persisted state,
  * the final persisted view equals the flat batch rebuild bitwise, and
  * the log directory physically holds only the unfolded batches. */
class PersistedCompactionSpec extends SparkSpec {
  import spark.implicits._

  private val maxDf = 2
  private val batches = Seq(
    Seq((1L, "a b c"), (2L, "a b c"), (10L, "p q r")),
    Seq((3L, "a b c"), (11L, "p q r"), (12L, "x y z")),
    Seq((4L, "m n o"), (13L, "x y z")),
    Seq((5L, "m n o"), (14L, "p q r"), (15L, "j k l")))

  private def docs(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private def canon(df: DataFrame) = df.collect()
    .map(r => (r.getString(0), r.getLong(1),
      if (r.isNullAt(2)) -1L else r.getLong(2),
      if (r.isNullAt(3)) -1L else r.getLong(3),
      if (r.isNullAt(4)) null else r.getString(4)))
    .sortBy(_._1).toSeq

  private def deleteTree(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(Files.delete(_))
      finally s.close()
    }

  test("policy compaction against a persisted parquet base + batch-partitioned delta log") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-lsm-persist").toString
    val baseDir = s"$root/base"
    val logDir = s"$root/log"

    val empty = Postings.build(docs(Seq.empty), maxDf = maxDf)
    empty.write.mode("overwrite").parquet(baseDir)

    def baseDf: DataFrame = spark.read.parquet(baseDir)
    def logBatchDirs: Seq[Long] = {
      val d = new java.io.File(logDir)
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
        .map(_.getName.stripPrefix("batch_id=").toLong).toSeq.sorted
    }
    def logDf: DataFrame =
      if (logBatchDirs.isEmpty)
        empty.withColumn("batch_id", lit(0L)).limit(0)
      else spark.read.parquet(logDir)
        .withColumn("batch_id", col("batch_id").cast("long"))

    var compactions = Vector.empty[Long]
    val mem = MemoryStream[(Long, String)]
    val q = StreamingPostings.sinkCompacting(
        base = baseDf, log = logDf,
        arriving = mem.toDF().toDF("doc_id", "text"),
        onDelta = (delta, id) =>
          // overwrite-by-id = overwrite this batch's partition dir
          delta.drop("batch_id").write.mode("overwrite")
            .parquet(s"$logDir/batch_id=$id"),
        onCompact = (newBase, keepFrom) => {
          // write-to-tmp, swap, truncate the folded partitions — the
          // SnapshotSource publish shape; materialize BEFORE touching
          // the live dir (newBase's plan reads it)
          val tmp = Paths.get(s"$root/base_tmp")
          deleteTree(tmp)
          newBase.write.mode("overwrite").parquet(tmp.toString)
          deleteTree(Paths.get(baseDir))
          Files.move(tmp, Paths.get(baseDir))
          logBatchDirs.filter(_ < keepFrom).foreach(id =>
            deleteTree(Paths.get(s"$logDir/batch_id=$id")))
          compactions :+= keepFrom
        },
        policy = CompactionPolicy(maxLogBatches = 2, maxLogToBaseRatio = 0),
        maxDf = maxDf)
      .start()
    try batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    finally q.stop()

    // the policy ran against persisted state: batches 1, 2, 3 each
    // tipped the 2-segment bound and folded the strictly-earlier one
    assert(compactions == Vector(1L, 2L, 3L))
    // the log directory physically holds only the unfolded batch
    assert(logBatchDirs == Seq(3L))

    // the persisted view ≡ the flat batch rebuild, read back from disk
    val rebuilt = Postings.build(docs(batches.flatten), maxDf = maxDf)
    assert(canon(StreamingPostings.view(baseDf, logDf)) == canon(rebuilt))

    // and a cold restart (fresh reads of both directories — what the
    // by-name arguments would hand a new sink instance) resolves the
    // same index: the persisted state IS the recovery state
    assert(canon(StreamingPostings.view(
      spark.read.parquet(baseDir),
      spark.read.parquet(logDir)
        .withColumn("batch_id", col("batch_id").cast("long"))))
      == canon(rebuilt))

    deleteTree(Paths.get(root))
  }
}
