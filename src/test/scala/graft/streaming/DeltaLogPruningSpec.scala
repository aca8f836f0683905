package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.extensions.Postings
import graft.plans.Layout

/** Partition pruning on the persisted delta log — the read-side cost
  * model PersistedCompactionSpec's layout promises: the log lives as
  * `log/batch_id=N/` parquet partitions, and the sink's per-batch
  * predicate `batch_id < b` (StreamingPostings.sinkCompacting) must
  * reach the file listing as a PARTITION filter, so a batch touches
  * only prior segments and compaction-truncation (deleting folded
  * partition dirs) shrinks every later scan physically — not just
  * logically. At 100 TB the delta log is the hot path (read once per
  * micro-batch); a scan that lists all segments and filters rows
  * after the fact would turn the LSM's O(unfolded) read bill into
  * O(history).
  *
  * Evidence is [[Layout.scannedFiles]] — the plan's own pruned file
  * listing — never `inputFiles` (which reports the whole relation and
  * would pass vacuously). */
class DeltaLogPruningSpec extends SparkSpec {
  import spark.implicits._

  private val maxDf = 2

  private def deleteTree(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(Files.delete(_))
      finally s.close()
    }

  /** A persisted log with one partition dir per batch, written exactly
    * as the sink's overwrite-by-id persist does. */
  private def writeLog(logDir: String, nBatches: Int): Unit =
    (0 until nBatches).foreach { b =>
      val docs = Seq((b * 10L, s"w$b x$b y$b"), (b * 10L + 1, s"w$b p q"))
        .toDF("doc_id", "text")
      Postings.build(docs, maxDf = maxDf)
        .write.mode("overwrite").parquet(s"$logDir/batch_id=$b")
    }

  private def logDf(logDir: String): DataFrame =
    spark.read.parquet(logDir)
      .withColumn("batch_id", col("batch_id").cast("long"))

  private def partOf(file: String): Long =
    "batch_id=(\\d+)".r.findFirstMatchIn(file).get.group(1).toLong

  test("the sink's batch_id < b predicate prunes log partitions at the file listing") {
    val root = Files.createTempDirectory("graft-log-prune").toString
    val logDir = s"$root/log"
    writeLog(logDir, 5)

    val all = Layout.scannedFiles(logDf(logDir))
    assert(all.map(partOf).distinct.sorted == Seq(0L, 1L, 2L, 3L, 4L),
      "control: the unfiltered log scan lists every segment")

    // the exact shape sinkCompacting plans each batch — note the
    // predicate sits ABOVE the int→long partition-column cast, so this
    // also pins that the cast does not defeat pruning
    val filtered = Layout.scannedFiles(
      logDf(logDir).filter(col("batch_id") < 2L))
    assert(filtered.nonEmpty)
    assert(filtered.map(partOf).distinct.sorted == Seq(0L, 1L),
      s"batch_id < 2 must list only segments 0,1; saw " +
        s"${filtered.map(partOf).distinct.sorted}")

    deleteTree(Paths.get(root))
  }

  test("pruning survives the view() plan — filter reaches the scan through union and window") {
    val root = Files.createTempDirectory("graft-log-prune-view").toString
    val logDir = s"$root/log"
    val baseDir = s"$root/base"
    writeLog(logDir, 5)
    Postings.build(Seq((100L, "base doc words")).toDF("doc_id", "text"),
      maxDf = maxDf).write.mode("overwrite").parquet(baseDir)

    val v = StreamingPostings.view(
      spark.read.parquet(baseDir),
      logDf(logDir).filter(col("batch_id") < 3L))
    val logFiles = Layout.scannedFiles(v).filter(_.contains("batch_id="))
    assert(logFiles.nonEmpty)
    assert(logFiles.map(partOf).distinct.sorted == Seq(0L, 1L, 2L),
      "the resolved-view plan must still scan only the < 3 segments")

    deleteTree(Paths.get(root))
  }

  test("truncation after a fold physically shrinks the listing") {
    val root = Files.createTempDirectory("graft-log-trunc").toString
    val logDir = s"$root/log"
    writeLog(logDir, 4)

    // the fold's truncation step: folded segments' partition dirs die
    Seq(0L, 1L, 2L).foreach(b => deleteTree(Paths.get(s"$logDir/batch_id=$b")))

    val after = Layout.scannedFiles(logDf(logDir))
    assert(after.map(partOf).distinct == Seq(3L),
      "post-truncation scans must list only the surviving segment")

    deleteTree(Paths.get(root))
  }
}
