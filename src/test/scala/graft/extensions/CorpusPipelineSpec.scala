package graft.extensions

import graft.SparkSpec

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  // 30-token body passes the [20, 70] gate with zero stopwords
  private val body = (1 to 30).map(i => s"w$i").mkString(" ")

  private lazy val docs = Seq(
    (1L, body, "en", "s", 1L),
    (2L, body, "en", "s", 1L),                    // exact dup of 1 → dropped
    (3L, body.replace("w30", "zz"), "en", "s", 1L), // near dup of 1 → dropped by LSH
    (4L, "short text", "en", "s", 1L),            // under min tokens → dropped
    (5L, ("the " * 25).trim, "en", "s", 1L),      // stop_ratio 1.0 → dropped
    (6L, (31 to 60).map(i => s"v$i").mkString(" "), "en", "s", 1L) // clean survivor
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("pipeline drops short, stopword-heavy, exact-dup and near-dup docs") {
    val out = CorpusPipeline.clean(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == Set(1L, 6L), out.toString)
    assert(out.values.forall(s => s == "train" || s == "val"))
  }

  test("split is deterministic and content-independent") {
    val s1 = CorpusPipeline.clean(docs).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val s2 = CorpusPipeline.clean(docs).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(s1 == s2)
  }

  test("cleanFull additionally drops repetitive and benchmark-contaminated docs") {
    // all three 24-token bodies pass the quality gate
    val repTxt = ("x y " * 12).trim                        // every bigram repeats
    val leakTxt = ((1 to 19).map(i => s"c$i") ++ (1 to 5).map(i => s"b$i")).mkString(" ")
    val corpus = Seq(
      (1L, body, "en", "s", 1L),       // survivor
      (2L, repTxt, "en", "s", 1L),     // fails the duplicate-bigram gate
      (3L, leakTxt, "en", "s", 1L)     // shares 5-gram "b1 … b5" with the benchmark
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val benchmark = Seq((100L, "b1 b2 b3 b4 b5 b6")).toDF("doc_id", "text")
    val out = CorpusPipeline.cleanFull(corpus, benchmark).collect()
      .map(r => r.getLong(0)).toSet
    assert(out == Set(1L))
    // and without those gates, clean() keeps all three
    assert(CorpusPipeline.clean(corpus).count() == 3L)
  }
}
