package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics of [[Mixture]] — the data-mixing contract:
  * the budget is the largest total no source has to upsample for, each
  * source's keep share follows the target weights, the sampled corpus
  * adheres to the per-source budget exactly (overshoot < one doc), and
  * selection is seeded-deterministic. */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  // src a: plentiful (many tokens), src b: scarce, src c: unweighted
  private def docs: DataFrame = (
    (0L until 40L).map(i => (i, "t " * 50 + i.toString, "a")) ++
    (100L until 110L).map(i => (i, "t t t t " + i.toString, "b")) ++
    (200L until 205L).map(i => (i, "ignored words here", "c"))
  ).toDF("doc_id", "text", "source")

  private def weights: DataFrame =
    Seq(("a", 3L), ("b", 1L), ("c", 0L)).toDF("source", "weight")

  private def planRows: Map[String, (Long, Long, Long, Long, Long)] =
    Mixture.plan(docs, weights).collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap

  test("budget binds at the scarce source; keeps follow the weights") {
    val p = planRows
    assert(p.keySet == Set("a", "b"), "weight-0 sources are excluded")
    val (taTok, _, budget, keepA, _) = p("a")
    val (tbTok, _, budgetB, keepB, _) = p("b")
    assert(budget == budgetB, "budget is one number for the whole plan")
    // a: 40 docs x 51 tokens, b: 10 docs x 5 tokens -> b is scarce
    // relative to its 1/4 target: B = min(ta*4/3, tb*4/1) = 4*tb
    assert(tbTok == 50L && taTok == 2040L)
    assert(budget == 4L * tbTok)
    assert(keepB == tbTok, "the binding source keeps everything it has")
    assert(keepA == 3L * budget / 4L)
    assert(keepA <= taTok && keepB <= tbTok, "no source upsamples")
    // mixture shares hit the 3:1 target exactly (floor rounding only)
    assert(math.abs(keepA - 3L * keepB) <= 3L)
  }

  test("epochs_at_2x prices the upsampling a doubled budget costs") {
    val p = planRows
    // at 2B the binding source must serve 2x what it holds -> 2 epochs;
    // the plentiful source still fits in one pass
    assert(p("b")._5 == 2L)
    assert(p("a")._5 == 1L)
  }

  test("sample adheres to each source's budget within one doc") {
    val kept = Mixture.sample(docs, weights, seed = 7L)
    val keeps = planRows.map { case (s, t) => s -> t._4 }
    val bySource = kept.groupBy("source")
      .agg(sum("n_tok").as("tok"), max("n_tok").as("maxDoc"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(bySource.keySet == Set("a", "b"))
    bySource.foreach { case (s, (tok, maxDoc)) =>
      assert(tok >= keeps(s), s"$s under budget: $tok < ${keeps(s)}")
      assert(tok < keeps(s) + maxDoc, s"$s overshot by a full doc")
    }
  }

  test("a weighted source absent from the corpus binds the budget to 0 — strict, visible") {
    val w = Seq(("a", 3L), ("b", 1L), ("d", 2L)).toDF("source", "weight")
    val rows = Mixture.plan(docs, w).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // the culprit is IN the plan at tokens_total = 0, not silently gone
    assert(rows.keySet == Set("a", "b", "d"))
    assert(rows("d") == (0L, 0L, 0L, 0L))
    // and it binds everyone: the target mixture is unservable without
    // upsampling d, so the no-upsampling budget is zero
    rows.values.foreach { case (_, budget, keep, epochs) =>
      assert(budget == 0L && keep == 0L && epochs == 0L)
    }
    // the materialized corpus is empty rather than silently off-target
    assert(Mixture.sample(docs, w, seed = 7L).count() == 0L)
  }

  test("selection is seeded-deterministic; seeds decorrelate") {
    def ids(seed: Long): Seq[Long] =
      Mixture.sample(docs, weights, seed).select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(7L) == ids(7L))
    // source b keeps ALL docs regardless of seed; source a keeps a
    // seed-dependent subset
    assert(ids(7L) != ids(8L))
  }
}
