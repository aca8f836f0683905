package graft.extensions

import graft.{SparkSpec, Tables}

/** [[LineDedup.dedupLinesBloom]] — the 2-pass Bloom line-dedup (r19
  * VERDICT #1, previously a prose scale claim): parity with the exact
  * path when the filter is sized for exactness, the EXPLICIT
  * false-positive contract (extra drops only, never resurrection) under
  * a deliberately undersized filter, the no-anti-join plan shape, and
  * the empty-dup-set identity. */
class LineDedupBloomSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a b c x y z p q", "s1"),
    (2L, "a b c d e f", "s1"),
    (3L, "", "s2"),
    (4L, "k k k k k k", "s2"),
    (5L, "x y z x y z a b c", "s2")).toDF("doc_id", "text", "source")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.toString).toSeq

  test("sized-for-exactness filter: bit-identical to the exact-df path (fixture + corpus)") {
    assert(canon(LineDedup.dedupLinesBloom(docs, lineLen = 3, maxDf = 1)) ==
      canon(LineDedup.dedupLines(docs, lineLen = 3, maxDf = 1)))
    val full = Tables.table(spark, "/root/testdata/sf0.001", "documents")
    assert(canon(LineDedup.dedupLinesBloom(full)) ==
      canon(LineDedup.dedupLines(full)))
  }

  test("FP contract: an undersized filter only drops MORE, never resurrects — kept lines stay a subsequence of the exact path's") {
    // capacity 1 at fpp 0.5: a few bits for a 4-hash dup set probed by
    // every distinct line — false positives all but guaranteed across
    // the corpus slice, which is the point
    val full = Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val exact = LineDedup.dedupLines(full)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val bloom = LineDedup.dedupLinesBloom(full,
      expectedDupLines = 1L, fpp = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(bloom.keySet == exact.keySet, "per-doc rows never vanish")
    var extraDrops = 0L
    bloom.foreach { case (id, (nl, nk, text)) =>
      val (enl, enk, etext) = exact(id)
      assert(nl == enl, s"doc $id: n_lines is census-independent")
      assert(nk <= enk, s"doc $id: FPs may only drop more lines")
      extraDrops += enk - nk
      // order-preserving containment: the bloom path's kept tokens are
      // a subsequence of the exact path's (drops, never edits)
      val kept = text.split(" ").filter(_.nonEmpty)
      val sup = etext.split(" ").filter(_.nonEmpty).iterator
      assert(kept.forall(t => sup.contains(t)),
        s"doc $id: bloom kept text must be a subsequence of exact kept text")
    }
    assert(extraDrops > 0,
      "the undersized filter must actually fire (else the test is vacuous)")
  }

  test("plan shape: scan-side probe, no anti-join for the dup set") {
    val df = LineDedup.dedupLinesBloom(docs, lineLen = 3, maxDf = 1)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_probe"),
      s"scrub must ride the codegen'd BloomProbe filter:\n$plan")
    assert(!plan.contains("LeftAnti"),
      s"the dup set must never materialize as a join side:\n$plan")
  }

  test("empty dup set (all lines unique): identity, no Bloom built") {
    val uniq = Seq((1L, "a b c d e f", "s"), (2L, "g h i j k l", "s"))
      .toDF("doc_id", "text", "source")
    val out = LineDedup.dedupLinesBloom(uniq, lineLen = 3, maxDf = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .sorted
    assert(out == Seq((1L, 2L, 2L), (2L, 2L, 2L)))
  }
}
