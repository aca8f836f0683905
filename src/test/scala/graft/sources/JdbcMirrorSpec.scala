package graft.sources

import graft.SparkSpec

/** JDBC round trip against embedded Derby (in-process, no network):
  * Spark write → partitioned Spark read. Pins the partitionColumn
  * behavior that fixes the reference's single-connection read. */
class JdbcMirrorSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("write + partitioned read round-trips rows and splits the scan") {
    val df = (1L to 100L).map(i => (i, s"name_$i", i % 7)).toDF("id", "name", "grp")
    JdbcMirror.write(df, url, "people")

    val back = JdbcMirror.read(spark, url, "people", "id",
      lower = 1L, upper = 101L, numPartitions = 4)

    // the read is genuinely split: 4 concurrent range queries
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 100)
    assert(back.select("id", "name", "grp").orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
    // no rows lost or duplicated at range boundaries
    assert(back.select("id").distinct().count() == 100)
  }

  test("filters and projections push down to the database") {
    val q = JdbcMirror.read(spark, url, "people", "id", 1L, 101L, 4)
      .filter($"grp" === 3).select("id")
    // JDBCScan shows the pushed predicate and pruned column list
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters"), scan)
    assert(q.count() == (1L to 100L).count(_ % 7 == 3))
  }
}
