package graft.sources

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** S9 executable twin (reference get_hist_vacancies.py:191-216): the
  * id-bucket resumable scan's three properties — atomic per-bucket
  * publish, crash leaves no visible partial, restart skips finished
  * buckets — demonstrated through [[BucketCommit]] under real Spark
  * tasks (foreachPartition), closing the one §2 row that was
  * documented-equivalent only. */
class ResumableBucketSpec extends SparkSpec {

  private val nBuckets = 10
  private val rowsPerBucket = 1000

  /** ids 0..9999 in 10 id-range buckets — the reference's 10k-bucket
    * walk shrunk to spec size. `parts = 1` makes the crash run
    * deterministic (one task walks buckets in order, so exactly the
    * sub-poison buckets commit); the resume run fans back out. */
  private def bucketed(parts: Int) = spark.range(nBuckets.toLong * rowsPerBucket)
    .select(col("id"), (col("id") / rowsPerBucket).cast("int").as("bucket"))
    .repartition(parts, col("bucket"))

  private def runJob(dir: String, parts: Int, poisonFrom: Option[Int]): Unit = {
    // capture only serializable locals — an instance-method reference
    // would drag the (non-serializable) spec into the task closure
    val (d, poison) = (dir, poisonFrom)
    BucketCommit.remaining(bucketed(parts), "bucket", dir)
      .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
        // walk this task's buckets in id order — the reference's loop
        it.toSeq.groupBy(_.getInt(1)).toSeq.sortBy(_._1)
          .foreach { case (b, rows) =>
            if (poison.exists(b >= _))
              throw new RuntimeException(s"injected crash at bucket $b")
            BucketCommit.commitBucket(d, b.toString)(
              ResumableBucketSpec.writeBucket(rows.map(_.getLong(0))))
          }
      }
  }

  private def readBack(dir: String): Map[String, Seq[Long]] =
    BucketCommit.committed(dir).map { b =>
      b -> Files.readAllLines(
        java.nio.file.Paths.get(dir, s"bucket=$b")).asScala
        .map(_.toLong).toSeq
    }.toMap

  test("crash leaves no visible partial; restart skips committed buckets and completes exactly-once") {
    val dir = Files.createTempDirectory("graft-s9").toString

    // RUN 1 (single task, ordered walk): crashes at bucket 5 — the job
    // fails with exactly buckets 0-4 committed
    val e = intercept[Exception] { runJob(dir, parts = 1, poisonFrom = Some(5)) }
    assert(e.getMessage.contains("injected crash") ||
      Option(e.getCause).exists(_.getMessage.contains("injected crash")),
      s"job must die of the INJECTED crash, not e.g. serialization: $e")
    val afterCrash = BucketCommit.committed(dir)
    assert(afterCrash == (0 until 5).map(_.toString).toSet,
      s"ordered walk commits exactly the pre-crash buckets, got $afterCrash")
    // every VISIBLE bucket is complete — atomic publish means a crash
    // can orphan a _tmp file but never expose a partial bucket
    afterCrash.foreach { b =>
      val ids = readBack(dir)(b)
      val lo = b.toInt.toLong * rowsPerBucket
      assert(ids == (lo until lo + rowsPerBucket), s"bucket $b incomplete")
    }
    val mtimes = afterCrash.map { b =>
      b -> Files.getLastModifiedTime(
        java.nio.file.Paths.get(dir, s"bucket=$b")).toMillis
    }.toMap

    // RESUME: the filter plans only the unfinished buckets' rows
    val planned = BucketCommit.remaining(bucketed(4), "bucket", dir)
    assert(planned.count() == (nBuckets - afterCrash.size).toLong * rowsPerBucket)

    // RUN 2 (no poison, parallel tasks) completes the walk
    runJob(dir, parts = 4, poisonFrom = None)
    val all = readBack(dir)
    assert(all.keySet == (0 until nBuckets).map(_.toString).toSet)
    assert(all.values.map(_.size).sum == nBuckets * rowsPerBucket)
    assert(all.values.flatten.toSeq.sorted ==
      (0L until nBuckets.toLong * rowsPerBucket))
    // run-1's committed buckets were SKIPPED, not rewritten
    mtimes.foreach { case (b, t) =>
      assert(Files.getLastModifiedTime(
        java.nio.file.Paths.get(dir, s"bucket=$b")).toMillis == t,
        s"bucket $b must not be touched by the resume run")
    }
  }

  test("duplicate attempts publish exactly once (speculative twin / zombie task)") {
    val dir = Files.createTempDirectory("graft-s9-dup").toString
    // two racing attempts for the SAME bucket, each with its own temp
    import java.util.concurrent.{CountDownLatch, Executors}
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    val wins = (0 until 2).map { _ =>
      pool.submit[Boolean](() => {
        gate.await()
        BucketCommit.commitBucket(dir, "7")(
          ResumableBucketSpec.writeBucket(Seq(1L, 2L, 3L)))
      })
    }
    gate.countDown()
    val results = wins.map(_.get())
    pool.shutdown()
    assert(results.count(identity) == 1, "exactly one attempt may publish")
    // the loser's temp is cleaned up; only the committed file remains
    assert(readBack(dir) == Map("7" -> Seq(1L, 2L, 3L)))
    val tmp = java.nio.file.Paths.get(dir, "_tmp")
    val leftover = Files.list(tmp)
    try assert(leftover.iterator().asScala.isEmpty,
      "losing attempt must delete its temp file")
    finally leftover.close()
    // a LATE zombie (bucket already visible) is a no-op skip
    assert(!BucketCommit.commitBucket(dir, "7")(
      ResumableBucketSpec.writeBucket(Seq(9L))))
    assert(readBack(dir) == Map("7" -> Seq(1L, 2L, 3L)))
  }
}

object ResumableBucketSpec {
  /** One bucket's payload: its sorted ids, one per line (deterministic,
    * content-checkable). Lives on the companion so task closures don't
    * capture the spec instance. */
  def writeBucket(rows: Seq[Long])(tmp: Path): Unit =
    Files.write(tmp, rows.sorted.map(_.toString).asJava)
}
