package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** S9 — ID-BUCKET RESUMABLE OUTPUT (reference
  * get_hist_vacancies.py:15-16,191-216): the reference walks the id
  * space in fixed buckets, writes each bucket to a temp file, atomically
  * renames it into place, and on restart skips buckets whose final file
  * exists. This object is that contract as a Spark task-side commit
  * primitive, making the long-documented "Spark's output-commit
  * protocol subsumes S9" claim EXECUTABLE (ResumableBucketSpec):
  *
  *  - '''exactly-once per bucket''': [[commitBucket]] writes to a
  *    unique temp path and publishes via an atomic-EXCLUSIVE link, so
  *    of any number of concurrent/duplicate attempts (speculative
  *    twin, zombie task, re-run after crash) exactly one publish wins;
  *    losers see EEXIST and clean up their temp — the same
  *    one-winner-per-output discipline as Spark's own
  *    FileOutputCommitter v1 task commit (temp attempt dir → rename)
  *    and [[SnapshotSource]]'s publish-by-manifest;
  *  - '''crash-safe''': a failed attempt leaves only a `_tmp` orphan,
  *    never a visible partial — the reference's temp-file property;
  *  - '''resumable''': [[remaining]] filters a bucketed frame to the
  *    buckets with no committed output, so a restarted job re-plans
  *    only unfinished work (the reference's skip-finished-buckets
  *    loop), while Spark checkpointing/speculation handles WITHIN-run
  *    retries natively.
  *
  * Local-FS rename is atomic on one node — exactly the reference's
  * regime. On a cluster the same shape is HDFS rename (atomic) or a
  * cloud-store committer; the bucket granularity is what makes resume
  * cheap: progress is a directory listing, not a log replay. */
object BucketCommit {

  private def tmpDir(dir: String): Path = Paths.get(dir, "_tmp")
  private def finalPath(dir: String, bucket: String): Path =
    Paths.get(dir, s"bucket=$bucket")

  /** Buckets with committed (visible) output under `dir`. One listing —
    * the whole resume state. */
  def committed(dir: String): Set[String] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) Set.empty
    else {
      val s = Files.list(d)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.startsWith("bucket="))
        .map(_.stripPrefix("bucket="))
        .toSet
      finally s.close()
    }
    // (committed = published; _tmp orphans are invisible by construction)
  }

  /** Write-then-publish one bucket: `write` fills a private temp file;
    * an ATOMIC-EXCLUSIVE link makes it visible. Returns true iff THIS
    * attempt published. Already-committed buckets (and publish races
    * lost to a twin attempt) return false after deleting the temp —
    * duplicate work, never duplicate output.
    *
    * The publish is `Files.createLink`, not rename: POSIX `rename()`
    * (what ATOMIC_MOVE compiles to) silently REPLACES an existing
    * target, so two racing attempts would both report success —
    * `link()` is the syscall that is both atomic and exclusive
    * (EEXIST for the loser), giving true one-winner semantics without
    * a lock. Filesystems without hard links fall back to a
    * check-then-ATOMIC_MOVE (warned loudly): still never exposes a
    * partial file, but one-winner is best-effort there, not
    * syscall-guaranteed. */
  def commitBucket(dir: String, bucket: String)(write: Path => Unit): Boolean = {
    val target = finalPath(dir, bucket)
    if (Files.exists(target)) return false // resume skip: no work at all
    Files.createDirectories(tmpDir(dir))
    val tmp = tmpDir(dir).resolve(
      s"$bucket.${java.util.UUID.randomUUID().toString.take(8)}")
    write(tmp)
    try {
      try Files.createLink(target, tmp)
      catch {
        case _: UnsupportedOperationException =>
          // No hard links on this FS. ATOMIC_MOVE (POSIX rename) silently
          // REPLACES an existing target, so a racing twin could make both
          // attempts report true — re-check first and surface that this
          // path's one-winner guarantee is best-effort, not syscall-grade.
          if (Files.exists(target)) throw new java.nio.file.FileAlreadyExistsException(target.toString)
          System.err.println(
            s"[BucketCommit] WARN: no hard-link support under $dir — " +
              "falling back to ATOMIC_MOVE; one-winner semantics are " +
              "degraded to check-then-move on this filesystem")
          Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      }
      Files.deleteIfExists(tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp) // a twin attempt won the publish
        false
    }
  }

  /** The resume filter: restrict a bucketed frame to buckets with no
    * committed output. The committed set is one driver-side listing
    * broadcast into an `isin` NOT-filter (bucket counts are bounded by
    * design — the reference's 4000; at 100 TB this is still thousands,
    * not rows), so the filter pushes into the scan and finished
    * buckets' partitions are never planned. */
  def remaining(bucketed: DataFrame, bucketCol: String, dir: String): DataFrame = {
    val done = committed(dir).toSeq
    if (done.isEmpty) bucketed
    else bucketed.filter(!col(bucketCol).cast("string").isin(done: _*))
  }
}
