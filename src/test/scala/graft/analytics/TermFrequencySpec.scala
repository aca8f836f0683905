package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-checkable goldens for the flagship family (FIXTURES.md §A.3:
  * nulls, empty cells, multi-token cells, ties). */
class TermFrequencySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (2020, "python sql"),
    (2020, "python"),
    (2020, null),
    (2020, ""),
    (2021, "go go python"),
    (2021, "sql")).toDF("year", "text")

  test("tokenize drops null/empty cells and empty tokens") {
    val toks = TermFrequency.tokenize(docs, "text", " ", Seq("year"))
    assert(toks.count() == 7)
    assert(toks.filter($"token" === "").count() == 0)
  }

  test("counts matches hand-computed frequencies") {
    val c = TermFrequency.counts(
      TermFrequency.tokenize(docs, "text", " ", Seq("year")), Seq("year"))
    val m = c.collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m == Map(
      (2020, "python") -> 2L, (2020, "sql") -> 1L,
      (2021, "go") -> 2L, (2021, "python") -> 1L, (2021, "sql") -> 1L))
  }

  test("pct sums to 100 within each group") {
    val c = TermFrequency.counts(
      TermFrequency.tokenize(docs, "text", " ", Seq("year")), Seq("year"))
    val sums = TermFrequency.withPct(c, Seq("year"))
      .groupBy("year").agg(round(sum("pct"), 2).as("s"))
      .select("s").as[Double].collect()
    assert(sums.forall(_ == 100.0))
  }

  test("topK breaks count ties by token, deterministically") {
    val c = TermFrequency.counts(
      TermFrequency.tokenize(docs, "text", " ", Seq("year")), Seq("year"))
    val top1 = TermFrequency.topK(c, Seq("year"), 1)
      .select("year", "token").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(top1 == Map(2020 -> "python", 2021 -> "go"))
    // 2021 tie between python and sql at rank 2 → python wins lexicographically
    val top2 = TermFrequency.topK(c, Seq("year"), 2)
      .filter($"year" === 2021 && $"rn" === 2)
      .select("token").as[String].head()
    assert(top2 == "python")
  }

  test("pivotCounts aligns terms across years with nulls for gaps") {
    val c = TermFrequency.counts(
      TermFrequency.tokenize(docs, "text", " ", Seq("year")), Seq("year"))
    val p = TermFrequency.pivotCounts(c, "year", Seq("2020", "2021"))
    val go = p.filter($"token" === "go").head()
    assert(go.isNullAt(1) && go.getLong(2) == 2L)
  }
}
