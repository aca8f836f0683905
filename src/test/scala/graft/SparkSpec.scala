package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM under Test/fork). */
object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      // local[threads, maxFailures]: maxFailures=2 turns task RETRY on
      // (plain local[4] aborts the job on the first task failure), so
      // suites can inject a transient attempt-0 failure and pin that
      // the retried task reproduces the run bitwise
      // (RetryDeterminismSpec). Deterministically-failing tests still
      // fail their jobs — just after one extra attempt.
      .master("local[4, 2]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", 4)
      // see GraftSession: Spark 4.1's zip-merging union crashes when
      // AQE changes a child's runtime partition count (r17, sf10)
      .config("spark.sql.unionOutputPartitioning", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // see GraftSession.protectedConfs (r20): the sorted-bucket-scan
      // claim is a repo-wide session invariant, so test plans match
      // the tool sessions' shape (specs that need it OFF save/restore)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSpec.session
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
