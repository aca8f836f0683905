package graft.plans

import java.sql.Date

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftExtensions
import graft.merge.ScdMerge

/** `MERGE INTO state USING snapshot` through the real spark.sql path,
  * rewritten by [[MergeIntoRewrite]] (injected via GraftExtensions) into
  * the one-join merge plan. The SCD statement must reproduce
  * ScdMerge.applySnapshot bit-for-bit. */
class MergeIntoRewriteSpec extends AnyFunSuite {

  // the shared test session carries no extensions; Builder.create() makes
  // a sibling session (same SparkContext) with the graft rules installed
  private lazy val spark: SparkSession = {
    graft.SparkSpec.session // ensure the context exists
    SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .create()
  }

  private val D = "2024-01-08"

  private def fixtures(): Unit = {
    import spark.implicits._
    // state covers: unchanged (1), changed (2), removed (3),
    // already-removed (4), reappearing-removed (5)
    Seq(
      (1L, "same", Date.valueOf("2024-01-01"), Date.valueOf("2024-01-01"), null.asInstanceOf[Date]),
      (2L, "old", Date.valueOf("2024-01-01"), Date.valueOf("2024-01-01"), null.asInstanceOf[Date]),
      (3L, "gone", Date.valueOf("2024-01-01"), Date.valueOf("2024-01-01"), null.asInstanceOf[Date]),
      (4L, "dead", Date.valueOf("2023-12-01"), Date.valueOf("2023-12-01"), Date.valueOf("2023-12-15")),
      (5L, "back", Date.valueOf("2023-12-01"), Date.valueOf("2023-12-01"), Date.valueOf("2023-12-20")))
      .toDF("id", "val", "added_at", "updated_at", "removed_at")
      .createOrReplaceTempView("state")
    // snapshot: 1 unchanged, 2 changed, 5 reappears changed, 6 new
    Seq((1L, "same"), (2L, "new"), (5L, "revived"), (6L, "fresh"))
      .toDF("id", "val").createOrReplaceTempView("snap")
  }

  test("SCD merge statement reproduces ScdMerge.applySnapshot") {
    fixtures()
    val viaSql = spark.sql(
      s"""MERGE INTO state t
          USING snap n
          ON t.id = n.id
          WHEN MATCHED THEN UPDATE SET
            val = n.val,
            added_at = least(t.added_at, DATE'$D'),
            updated_at = CASE WHEN NOT (t.val <=> n.val)
                              THEN DATE'$D' ELSE t.updated_at END
          WHEN NOT MATCHED THEN INSERT (id, val, added_at, updated_at, removed_at)
            VALUES (n.id, n.val, DATE'$D', DATE'$D', NULL)
          WHEN NOT MATCHED BY SOURCE AND t.added_at < DATE'$D'
              AND (t.removed_at IS NULL OR DATE'$D' < t.removed_at)
            THEN UPDATE SET removed_at = DATE'$D'""")

    val viaApi = ScdMerge.applySnapshot(
      spark.table("state"), spark.table("snap"), D, "id", Seq("val"))

    assert(viaSql.columns.toSeq == viaApi.columns.toSeq)
    assert(viaSql.orderBy("id").collect().toSeq ==
      viaApi.orderBy("id").collect().toSeq)
    // the quirk parity that matters: reappearing id 5 refreshes data but
    // KEEPS its removed_at (reference behavior, ScdMerge scaladoc)
    val r5 = viaSql.filter("id = 5").head()
    assert(r5.getAs[String]("val") == "revived")
    assert(r5.getAs[Date]("removed_at") == Date.valueOf("2023-12-20"))
  }

  test("plan is one full-outer join — no row-level-operation machinery") {
    fixtures()
    val df = spark.sql(
      s"""MERGE INTO state t USING snap n ON t.id = n.id
          WHEN MATCHED THEN UPDATE SET val = n.val
          WHEN NOT MATCHED THEN INSERT (id, val, added_at, updated_at, removed_at)
            VALUES (n.id, n.val, DATE'$D', DATE'$D', NULL)""")
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j.joinType
    }
    assert(joins == Seq(org.apache.spark.sql.catalyst.plans.FullOuter))
  }

  test("randomized SCD parity: 20 seeded state/snapshot scenarios") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { trial =>
      // random overlap structure: keys 1..12, each present in state,
      // snapshot, or both; random values force changed/unchanged mixes
      val stateRows = (1L to 12L).filter(_ => rnd.nextBoolean()).map { k =>
        val removed = if (rnd.nextInt(4) == 0) Date.valueOf("2023-12-15") else null
        (k, s"v${rnd.nextInt(3)}", Date.valueOf("2023-12-01"),
          Date.valueOf("2023-12-01"), removed)
      }
      val snapRows = (1L to 12L).filter(_ => rnd.nextBoolean())
        .map(k => (k, s"v${rnd.nextInt(3)}"))
      if (stateRows.nonEmpty && snapRows.nonEmpty) {
        stateRows.toDF("id", "val", "added_at", "updated_at", "removed_at")
          .createOrReplaceTempView("state")
        snapRows.toDF("id", "val").createOrReplaceTempView("snap")
        val viaSql = spark.sql(
          s"""MERGE INTO state t USING snap n ON t.id = n.id
              WHEN MATCHED THEN UPDATE SET
                val = n.val,
                added_at = least(t.added_at, DATE'$D'),
                updated_at = CASE WHEN NOT (t.val <=> n.val)
                                  THEN DATE'$D' ELSE t.updated_at END
              WHEN NOT MATCHED THEN INSERT (id, val, added_at, updated_at, removed_at)
                VALUES (n.id, n.val, DATE'$D', DATE'$D', NULL)
              WHEN NOT MATCHED BY SOURCE AND t.added_at < DATE'$D'
                  AND (t.removed_at IS NULL OR DATE'$D' < t.removed_at)
                THEN UPDATE SET removed_at = DATE'$D'""")
          .orderBy("id").collect().toSeq
        val viaApi = ScdMerge.applySnapshot(
            spark.table("state"), spark.table("snap"), D, "id", Seq("val"))
          .orderBy("id").collect().toSeq
        assert(viaSql == viaApi, s"trial $trial: state=$stateRows snap=$snapRows")
      }
    }
  }

  test("DELETE and conditional cascades: first match wins, deletes drop") {
    import spark.implicits._
    Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v")
      .createOrReplaceTempView("t_del")
    Seq((1L, 99L), (2L, 5L), (4L, 40L)).toDF("id", "v")
      .createOrReplaceTempView("s_del")
    val out = spark.sql(
      """MERGE INTO t_del t USING s_del s ON t.id = s.id
         WHEN MATCHED AND s.v < 10 THEN DELETE
         WHEN MATCHED THEN UPDATE SET v = s.v
         WHEN NOT MATCHED AND s.v > 50 THEN INSERT (id, v) VALUES (s.id, s.v)""")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // 1 updated to 99; 2 deleted (first matching action); 3 untouched
    // (no NOT MATCHED BY SOURCE clause); 4 not inserted (40 <= 50)
    assert(out.toSeq == Seq((1L, 99L), (3L, 30L)))
  }

  test("cardinality: two source rows matching one target row raise") {
    import spark.implicits._
    Seq((1L, 10L)).toDF("id", "v").createOrReplaceTempView("t_card")
    Seq((1L, 11L), (1L, 12L), (2L, 20L)).toDF("id", "v")
      .createOrReplaceTempView("s_card")
    val e = intercept[Exception] {
      spark.sql(
        """MERGE INTO t_card t USING s_card s ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET v = s.v
           WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("GRAFT_MERGE_CARDINALITY_VIOLATION")))
  }

  test("cardinality: duplicate UNMATCHED source keys legally insert twice") {
    import spark.implicits._
    Seq((9L, 90L)).toDF("id", "v").createOrReplaceTempView("t_card2")
    Seq((1L, 11L), (1L, 12L)).toDF("id", "v").createOrReplaceTempView("s_card2")
    val out = spark.sql(
      """MERGE INTO t_card2 t USING s_card2 s ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET v = s.v
         WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""")
      .orderBy("id", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 11L), (1L, 12L), (9L, 90L)))
  }

  test("cardinality: duplicate target keys hit by ONE source row are legal") {
    import spark.implicits._
    Seq((1L, 10L), (1L, 20L)).toDF("id", "v").createOrReplaceTempView("t_card3")
    Seq((1L, 99L)).toDF("id", "v").createOrReplaceTempView("s_card3")
    val out = spark.sql(
      """MERGE INTO t_card3 t USING s_card3 s ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET v = s.v""")
      .orderBy("id", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
    // each of the two target rows is updated exactly once — allowed
    assert(out.toSeq == Seq((1L, 99L), (1L, 99L)))
  }

  test("cardinality: guard can be disabled by conf (documented escape hatch)") {
    import spark.implicits._
    Seq((1L, 10L)).toDF("id", "v").createOrReplaceTempView("t_card4")
    Seq((1L, 11L), (1L, 12L)).toDF("id", "v").createOrReplaceTempView("s_card4")
    spark.conf.set("spark.graft.merge.cardinalityCheck", "false")
    try {
      val out = spark.sql(
        """MERGE INTO t_card4 t USING s_card4 s ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET v = s.v""").collect()
      assert(out.length == 2) // unguarded: one row per match
    } finally spark.conf.unset("spark.graft.merge.cardinalityCheck")
  }
}
