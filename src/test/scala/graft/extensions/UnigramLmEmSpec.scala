package graft.extensions

import graft.{SparkSpec, Tables}

/** [[UnigramLm.trainIterated]] — the iterated hard-EM loop: exact
  * one-round equivalence with [[UnigramLm.train]], a hand-built corpus
  * where the SECOND round genuinely moves a segmentation (so the
  * driver row's oracle would catch a broken re-estimation), and the
  * observed one-round fixed point on the harness corpus. */
class UnigramLmEmSpec extends SparkSpec {
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("emRounds = 1 is train, bitwise") {
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
    assert(canon(UnigramLm.trainIterated(docs, 24, 4, emRounds = 1)) ==
      canon(UnigramLm.train(docs, 24, 4)))
  }

  // Engineered so re-estimation changes an argmax: under the SEED
  // scores "aaa" segments "a aa" (the substring census overweights
  // "aa"), but the round-1 recount concentrates mass on "a"
  // (10 of 22 occurrences) and starves "aa" (1), so round 2
  // re-segments "aaa" as "a a a". Counts verified by hand:
  //   round-1 M-step: a=10 (9 from "a baab" + 1), baab=9, ab=2, aa=1
  //   round-2 M-step: a=12 (9 + 3 from "a a a"), baab=9, ab=2 (aa gone)
  private lazy val moving = Seq(
    (1L, ("abaab " * 9).trim + " aaa ab ab")).toDF("doc_id", "text")

  test("a second EM round genuinely moves the model on the engineered corpus") {
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val r1 = m(UnigramLm.trainIterated(moving, 24, 4, emRounds = 1))
    val r2 = m(UnigramLm.trainIterated(moving, 24, 4, emRounds = 2))
    assert(r1 == Map("a" -> 10L, "baab" -> 9L, "ab" -> 2L, "aa" -> 1L,
      "b" -> 0L))
    assert(r2 == Map("a" -> 12L, "baab" -> 9L, "ab" -> 2L, "b" -> 0L))
  }

  test("hard-EM monotonicity on the engineered corpus: total best-path score non-decreasing") {
    // freq-weighted corpus score under each round's FINAL vocabulary
    def score(df: org.apache.spark.sql.DataFrame): Double = {
      val vocab = df.filter("logp is not null")
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      UnigramLm.viterbiSegment(UnigramLm.wordFreqs(moving), vocab, 4)
        .selectExpr("sum(freq * score)").head.getDouble(0)
    }
    val s1 = score(UnigramLm.trainIterated(moving, 24, 4, emRounds = 1))
    val s2 = score(UnigramLm.trainIterated(moving, 24, 4, emRounds = 2))
    assert(s2 >= s1 - 1e-6, s"EM went backwards: $s1 -> $s2")
  }

  test("the harness corpus is a one-round fixed point (why the driver row pins the fixed point, not a delta)") {
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
    assert(canon(UnigramLm.trainIterated(docs, 24, 4, emRounds = 2)) ==
      canon(UnigramLm.train(docs, 24, 4)))
  }

  test("emRounds is a bounded driver loop") {
    intercept[IllegalArgumentException] {
      UnigramLm.trainIterated(moving, 24, 4, emRounds = 0)
    }
    intercept[IllegalArgumentException] {
      UnigramLm.trainIterated(moving, 24, 4, emRounds = 9)
    }
  }
}
