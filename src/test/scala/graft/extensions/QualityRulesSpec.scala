package graft.extensions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Each Gopher rule caught by a document failing EXACTLY it — the
  * independence the per-rule report exists for — plus the report's
  * arithmetic tie to the flags frame. */
class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  // each doc fails exactly one rule (word-count doc aside, which also
  // degrades ratios, so it is checked on its own flag only)
  private val good =
    "the quick brown fox jumps over a lazy dog near the old mill pond"
  private val fixture = Seq(
    (1L, good),                                      // passes all five
    (2L, "the a"),                                   // too short
    (3L, ("extraordinarily " * 12) + "the a against"), // mean len high
    (4L, "quick brown fox jumps over lazy dog near old mill pond gate"), // no stopwords
    (5L, "the the the the a spark row join merge sort"), // top token 5/10 > 0.2
    (6L, "the a spark spark row row join join merge merge sort sort data data")
  ).toDF("doc_id", "text")

  test("each rule fails its designed offender and only it") {
    val flags = QualityRules.gopherFlags(fixture)
      .orderBy("doc_id").collect()
    def row(id: Long) = flags.find(_.getLong(0) == id).get
    assert(row(1L).getBoolean(7), "the good doc passes")
    assert(!row(2L).getBoolean(2), "word count")
    assert(!row(3L).getBoolean(3), "mean word length")
    assert(!row(4L).getBoolean(4), "stopwords")
    assert(!row(5L).getBoolean(5), "top-token ratio")
    // doc 6: every token appears exactly twice -> distinct ratio 0.5
    // passes, so tighten via a custom threshold to show the knob
    val strict = QualityRules.gopherFlags(fixture,
      QualityRules.Thresholds(minDistinctRatio = 0.6, minTok = 5))
    assert(!strict.filter(col("doc_id") === 6L).head().getBoolean(6),
      "distinct ratio under the tightened threshold")
    // rules are independent: doc 5 still passes word count + stopwords
    assert(row(5L).getBoolean(2) && row(5L).getBoolean(4))
  }

  test("empty and null docs fail the whole battery") {
    val flags = QualityRules.gopherFlags(
      Seq((1L, ""), (2L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    assert(flags.filter(col("pass")).count() == 0)
    assert(flags.filter(col("r_mean_word_len") || col("r_top_token") ||
      col("r_distinct")).count() == 0)
  }

  test("report counts tie exactly to the flags frame") {
    val flags = QualityRules.gopherFlags(fixture)
    val rep = QualityRules.gopherReport(fixture)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (rule <- Seq("r_word_count", "r_mean_word_len", "r_stopword",
        "r_top_token", "r_distinct"))
      assert(rep(rule) == flags.filter(!col(rule)).count(),
        s"$rule count ties to flags")
    assert(rep("pass") == flags.filter(col("pass")).count())
  }

  test("published preset: each rule flips exactly at Rae table A1's bound") {
    // distinct 5-char filler words; every doc carries enough stopwords
    // and healthy ratios except the one dimension it straddles
    def w(n: Int) = (1 to n).map(i => f"w$i%04d")
    val docs = Seq(
      // word count 50 passes, 49 fails (bound: [50, 100000])
      1L -> (Seq("that", "have") ++ w(48)),
      2L -> (Seq("that", "have") ++ w(47)),
      // mean word length 2.0 < 3 fails (others: 4.96, inside [3, 10])
      3L -> (Seq("be", "to") ++ (10 to 57).map(_.toString)),
      // stopword hits: 1 < 2 fails, 2 passes
      4L -> (Seq("the") ++ w(49)),
      // top-token ratio: 10/50 = 0.2 passes (≤ 0.2), 11/50 fails
      5L -> (Seq.fill(10)("that") ++ Seq("have") ++ w(39)),
      6L -> (Seq.fill(11)("that") ++ Seq("have") ++ w(38)),
      // distinct ratio: 41/50 = 0.82 passes (≥ 0.8), 39/50 fails
      7L -> ((1 to 9).flatMap(i => Seq(f"d$i%04d", f"d$i%04d")) ++
        Seq("that", "have") ++ w(30)),
      8L -> ((1 to 11).flatMap(i => Seq(f"d$i%04d", f"d$i%04d")) ++
        Seq("that", "have") ++ w(26))
    ).map { case (id, ws) => (id, ws.mkString(" ")) }.toDF("doc_id", "text")
    val flags = QualityRules
      .gopherFlags(docs, QualityRules.Thresholds.published)
      .collect().map(r => r.getLong(0) -> r).toMap
    def only(id: Long, rule: String): Unit = {
      val r = flags(id)
      val idx = Map("r_word_count" -> 2, "r_mean_word_len" -> 3,
        "r_stopword" -> 4, "r_top_token" -> 5, "r_distinct" -> 6)
      idx.foreach { case (n, i) =>
        assert(r.getBoolean(i) == (n != rule), s"doc $id rule $n") }
      assert(!r.getBoolean(7), s"doc $id must fail the battery")
    }
    assert(flags(1L).getBoolean(7), "50 words at the published floor passes")
    only(2L, "r_word_count")
    only(3L, "r_mean_word_len")
    only(4L, "r_stopword")
    assert(flags(5L).getBoolean(7), "top ratio exactly 0.2 passes")
    only(6L, "r_top_token")
    assert(flags(7L).getBoolean(7), "distinct ratio 0.82 passes")
    only(8L, "r_distinct")
  }

  test("the battery is one narrow projection: no shuffle in the flags plan") {
    val plan = QualityRules.gopherFlags(fixture)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"flags must not shuffle:\n$plan")
  }
}
