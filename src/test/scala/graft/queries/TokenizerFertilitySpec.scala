package graft.queries

import graft.SparkSpec

/** q_tokenizer_fertility invariants the oracle cannot express as
  * hashes: the two tokenizers segment the SAME word table, so their
  * coverage columns must be identical — BPE's s4 carries every word,
  * and the unigram Viterbi completes every word because [[Round19Queries.uniVocab]]
  * has full single-character coverage. A fertility below 1.0 would
  * mean a word segmented into zero pieces (impossible); this pins the
  * floor on a real corpus, not just the fixture. */
class TokenizerFertilitySpec extends SparkSpec {

  test("one corpus scan at runtime: the shared word frame's exchange is reused across both segmenters") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => p.children
      }
      p +: kids.flatMap(flatten)
    }
    val df = Registry.queries("q_tokenizer_fertility")(
      spark, "/root/testdata/sf0.001")
    df.collect() // finalize the adaptive plan (stage reuse happens here)
    val nodes = flatten(df.queryExecution.executedPlan)
    val scans = nodes.count(_.isInstanceOf[FileSourceScanExec])
    val reused = nodes.exists(_.isInstanceOf[ReusedExchangeExec]) ||
      nodes.count(_.isInstanceOf[QueryStageExec]) >
        nodes.collect { case q: QueryStageExec => q.id }.distinct.size
    assert(scans == 1 || reused,
      s"census pre-execution shows 2 scans; at runtime the identical word" +
        s" subtrees must collapse to one ($scans scan nodes, reused=$reused)")
  }

  test("both tokenizers cover the identical word set; fertility ≥ 1") {
    val rows = Registry.queries("q_tokenizer_fertility")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 2, s"one row per tokenizer, got ${rows.length}")
    val by = rows.map(r => r.getString(0) -> r).toMap
    assert(by.keySet == Set("bpe", "unigram"))
    assert(by("bpe").getLong(1) == by("unigram").getLong(1),
      "same n_words: both segmenters must cover every corpus word")
    assert(by("bpe").getLong(2) == by("unigram").getLong(2),
      "same total_freq: the word table is shared, not re-derived")
    rows.foreach { r =>
      assert(r.getDouble(4) >= 1.0,
        s"${r.getString(0)}: fertility ${r.getDouble(4)} < 1 — a word segmented into zero pieces")
      assert(r.getLong(3) >= r.getLong(2),
        "total_pieces ≥ total_freq (every occurrence yields ≥ 1 piece)")
    }
  }
}
