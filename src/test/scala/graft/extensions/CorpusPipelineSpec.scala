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
}
