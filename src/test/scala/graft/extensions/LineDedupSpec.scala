package graft.extensions

import graft.{SparkSpec, Tables}

/** [[LineDedup]] — FineWeb/RefinedWeb boilerplate-line removal: hand
  * fixture (shared lines dropped everywhere, partial tails, empty and
  * fully-boilerplate docs, within-doc repeats kept), census/report
  * consistency, case normalization, and a plan sanity pin. */
class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  // lineLen=3 lines: d1 [abc|xyz|pq], d2 [abc|def], d3 [], d4 [kkk|kkk],
  // d5 [xyz|xyz|abc]. df>1: "a b c" (d1,d2,d5), "x y z" (d1,d5).
  private lazy val docs = Seq(
    (1L, "a b c x y z p q", "s1"),
    (2L, "a b c d e f", "s1"),
    (3L, "", "s2"),
    (4L, "k k k k k k", "s2"),
    (5L, "x y z x y z a b c", "s2")).toDF("doc_id", "text", "source")

  test("shared lines drop from EVERY doc; tails, empties, within-doc repeats") {
    val out = LineDedup.dedupLines(docs, lineLen = 3, maxDf = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out == Map(
      1L -> ((3L, 1L, "p q")), // partial tail survives as its own line
      2L -> ((2L, 1L, "d e f")),
      3L -> ((0L, 0L, "")), // empty doc keeps its row
      4L -> ((2L, 2L, "k k k k k k")), // within-doc repeat: df=1, kept
      5L -> ((3L, 0L, "")))) // fully-boilerplate doc: kept empty, not dropped
  }

  test("kept lines reassemble in document order, not discovery order") {
    val docs2 = Seq((7L, "z z z m m m a a a", "s")).toDF("doc_id", "text", "source")
    val out = LineDedup.dedupLines(docs2, lineLen = 3, maxDf = 1)
      .collect().head
    assert(out.getString(3) == "z z z m m m a a a")
  }

  test("census: total order (n_docs DESC, n_occ DESC, line) over df>1 lines") {
    val rows = LineDedup.boilerplateLines(docs, lineLen = 3, maxDf = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(("a b c", 3L, 3L), ("x y z", 2L, 3L)))
  }

  test("report: dropped mass per source reconciles with the per-doc view") {
    val rep = LineDedup.report(docs, lineLen = 3, maxDf = 1)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(rep == Map(
      "s1" -> ((2L, 5L, 3L, 0.6)),
      "s2" -> ((3L, 5L, 3L, 0.6))))
    // conservation: census occurrence mass == per-doc dropped mass
    val perDoc = LineDedup.dedupLines(docs, lineLen = 3, maxDf = 1)
      .selectExpr("sum(n_lines - n_kept)").as[Long].head()
    val census = LineDedup.lineDf(docs, lineLen = 3)
      .filter($"n_docs" > 1).selectExpr("sum(n_occ)").as[Long].head()
    assert(perDoc == census)
  }

  test("tokenization lowercases: 'A B C' and 'a b c' are the same line") {
    val d = Seq((1L, "A B C", "s"), (2L, "a b c", "s"))
      .toDF("doc_id", "text", "source")
    val out = LineDedup.dedupLines(d, lineLen = 3, maxDf = 1)
      .collect().map(_.getLong(2)).toSeq
    assert(out == Seq(0L, 0L))
  }

  test("encoded (xxhash64-keyed) path is result-identical to the string path") {
    val full = Tables.table(spark, "/root/testdata/sf0.001", "documents")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(canon(LineDedup.dedupLinesEncoded(full)) ==
      canon(LineDedup.dedupLines(full)))
    assert(canon(LineDedup.dedupLinesEncoded(docs, lineLen = 3, maxDf = 1)) ==
      canon(LineDedup.dedupLines(docs, lineLen = 3, maxDf = 1)))
  }

  test("plan sanity: no cartesian product anywhere in the executed plan") {
    val df = LineDedup.dedupLines(docs, lineLen = 3, maxDf = 1)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
