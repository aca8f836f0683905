package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Pins the one-session-factory discipline (r17 VERDICT #4): the
  * protected conf set — UTC, AQE, and above all
  * `spark.sql.unionOutputPartitioning=false` (the sf10 zip-union crash
  * fix) — lives ONLY in [[GraftSession.protectedConfs]], and every tool
  * main builds through it. Before this, the conf lines were hand-copied
  * across 10 mains; a new tool (or a new protected conf) missing one
  * line would silently lose a scale-critical protection and nothing
  * would fail until a 100 TB run died. */
class GraftSessionSpec extends AnyFunSuite {

  test("the protected conf map carries every scale-critical setting") {
    val c = GraftSession.protectedConfs
    // the r17 crash fix — the single most important line in the map
    assert(c.get("spark.sql.unionOutputPartitioning").contains("false"))
    assert(c.get("spark.sql.session.timeZone").contains("UTC"))
    assert(c.get("spark.sql.adaptive.enabled").contains("true"))
    assert(c.get("spark.sql.adaptive.coalescePartitions.enabled").contains("true"))
    assert(c.get("spark.sql.adaptive.skewJoin.enabled").contains("true"))
    assert(c.get("spark.ui.enabled").contains("false"))
    // r20 (r19 VERDICT #4): the sorted-bucket-scan claim is pinned at
    // session build — no query builder may leak it into a session
    assert(c.get("spark.sql.legacy.bucketedTableScan.outputOrdering")
      .contains("true"))
  }

  test("q_merge_scd_bucketed leaves the session conf exactly as it found it (r19 VERDICT #4)") {
    val s = SparkSpec.session
    val key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    val prev = s.conf.get(key, "false")
    try {
      // adversarial setting: if the row's builder still conf.set the
      // legacy key, this would flip to "true" after the call. Evict the
      // state memo first — against a warm memo (another spec sharing
      // this session may already have built the table) the build body,
      // the only place a reintroduced conf.set could live, would never
      // run and the assertions would pass vacuously.
      graft.queries.Round19Queries.evictBucketedState(s)
      s.conf.set(key, "false")
      val before = s.conf.getAll
      graft.queries.Registry.queries("q_merge_scd_bucketed")(
        s, "/root/testdata/sf0.001").collect()
      assert(s.conf.get(key, "false") == "false",
        "the bucketed-state build must not mutate the legacy scan conf")
      assert(s.conf.getAll == before,
        "registry rows must be conf-neutral: session conf drifted")
    } finally s.conf.set(key, prev)
  }

  test("no tool main hand-builds a SparkSession outside GraftSession") {
    // source-level pin: the mains live flat under src/main/scala/graft/;
    // the ONLY file allowed to call SparkSession.builder() is
    // GraftSession.scala itself. (Library code never builds sessions —
    // it receives them — so scanning the whole main tree keeps the rule
    // honest there too.)
    val root = Paths.get("src/main/scala")
    assert(Files.isDirectory(root), s"run from the repo root: $root missing")
    val offenders = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .filter(p => p.getFileName.toString != "GraftSession.scala")
      .filter(p => Files.readString(p).contains("SparkSession.builder"))
      .map(_.toString)
      .toSeq.sorted
    assert(offenders.isEmpty,
      s"SparkSession.builder outside GraftSession (protected confs at " +
        s"risk): ${offenders.mkString(", ")} — build via GraftSession." +
        "tool/toolMax/builder instead")
  }

  test("a session built the tool way actually carries the protected confs") {
    // build through the REAL factory in an isolated session (newSession
    // off a builder would reuse the shared test session's confs, so we
    // assert on the shared session only for confs the test harness also
    // sets, and on the factory's map application via a builder probe:
    // GraftSession.builder feeds protectedConfs last, so getOrCreate in
    // a fresh JVM applies them — here we verify the fold wiring by
    // checking the builder-produced session when WE are first to create
    // it is impossible in a shared-JVM suite; instead pin that the
    // SHARED session, built by SparkSpec with the same critical confs,
    // agrees with the map on the keys both set)
    val s = SparkSpec.session
    val critical = Seq("spark.sql.unionOutputPartitioning",
      "spark.sql.session.timeZone", "spark.ui.enabled")
    critical.foreach { k =>
      assert(s.conf.getOption(k) == GraftSession.protectedConfs.get(k),
        s"shared test session disagrees with protectedConfs on $k")
    }
  }
}
