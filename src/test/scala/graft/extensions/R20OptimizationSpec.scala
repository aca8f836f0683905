package graft.extensions

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-20 optimization pins: every rewrite here claims "same rows,
  * fewer exchanges / cheaper per-row work" — these tests pin the SAME
  * ROWS half against the pre-rewrite formulation re-stated inline, and
  * the plan half against the executed plan (the oracle hash gate pins
  * the end-to-end queries; these localize a future break to the
  * operator).
  */
class R20OptimizationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    // within-doc repeats (the case the old post-explode distinct
    // existed for), cross-doc shared grams, an empty doc, a null text
    (1L, "a b a b a b c", "s0"),
    (2L, "a b a b x y z", "s0"),
    (3L, "q w e r t y q w e r", "s1"),
    (4L, "", "s1"),
    (5L, null.asInstanceOf[String], "s2"),
    (6L, "a b a b a b c", "s2")
  ).toDF("doc_id", "text", "source")

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _ => p.children
    }
    p +: kids.flatMap(flatten)
  }

  test("kmvHashNative is bit-identical to the declarative kmvHash (incl null/empty/unicode)") {
    graft.functions.GraftFunctions.register(spark)
    val toks = (Seq("", "a", "alpha beta", "ünïcödé ✓", "0", " ",
      "a" * 300) ++ (0 until 200).map(i => s"tok_$i"))
      .toDF("t").withColumn("t", when(col("t") === "0", lit(null)).otherwise(col("t")))
    val both = toks.select(
      Sketches.kmvHash(col("t")).as("decl"),
      Sketches.kmvHashNative(col("t")).as("nat"))
    assert(both.filter(!(col("decl") <=> col("nat"))).count() === 0)
  }

  test("termPairs == the old explode-then-distinct formulation") {
    val now = Postings.termPairs(docs).as[(Long, String)].collect().toSet
    val old = docs.select(col("doc_id"),
        explode(TextAnalysis.wordNgrams(3)).as("term"))
      .distinct().as[(Long, String)].collect().toSet
    assert(now === old)
    // and no duplicates — downstream df counts depend on pair distinctness
    assert(Postings.termPairs(docs).count() === now.size)
  }

  test("buildFromPairs: one shuffle exchange, rows identical to the two-agg+join formulation") {
    val pairs = Postings.termPairs(docs).localCheckpoint()
    val maxDf = 2
    val idx = Postings.buildFromPairs(pairs, maxDf)
    // reference: the pre-r20 shape, restated
    val dfc = pairs.groupBy("term").agg(count(lit(1)).as("df"))
    val under = dfc.filter(col("df") <= maxDf)
    val lists = pairs.join(under, Seq("term")).groupBy("term")
      .agg(first(col("df")).as("df"),
        sort_array(collect_list("doc_id")).as("_ids"))
      .select(col("term"), col("df"),
        element_at(col("_ids"), 1).as("first_doc"),
        element_at(col("_ids"), size(col("_ids"))).as("last_doc"),
        concat_ws(",", transform(col("_ids"), (x, i) =>
          when(i === 0, x).otherwise(x - element_at(col("_ids"), i))
            .cast("string"))).as("postings"))
    val capped = dfc.filter(col("df") > maxDf)
      .select(col("term"), col("df"),
        lit(null).cast("long").as("first_doc"),
        lit(null).cast("long").as("last_doc"),
        lit(null).cast("string").as("postings"))
    val ref = lists.unionByName(capped)
    assert(idx.collect().toSet === ref.collect().toSet)
    // the fixture must actually exercise the cap (df > maxDf terms)
    assert(idx.filter(col("postings").isNull).count() > 0)
    assert(idx.filter(col("postings").isNotNull).count() > 0)
    // plan: exactly ONE shuffle exchange end to end (the groupBy) —
    // the r20 point; the old shape paid two over the pair frame
    idx.write.format("noop").mode("overwrite").save()
    val exch = flatten(idx.queryExecution.executedPlan)
      .count(_.isInstanceOf[ShuffleExchangeExec])
    assert(exch === 1, s"expected 1 exchange, got $exch")
  }

  test("appendDeltaFromPairs still matches build-on-union through the capped transition") {
    val oldDocs = docs.filter(col("doc_id") <= 3)
    val newDocs = docs.filter(col("doc_id") > 3)
    val maxDf = 2
    val idx = Postings.build(oldDocs, maxDf = maxDf)
    val delta = Postings.appendDelta(idx, newDocs, maxDf = maxDf)
    val applied = Postings.applyDelta(idx, delta)
    val full = Postings.build(docs, maxDf = maxDf)
    assert(applied.collect().toSet === full.collect().toSet)
  }

  test("shingles == the old explode-then-distinct formulation") {
    val now = Dedup.shingles(docs, share = false)
      .as[(Long, String)].collect().toSet
    val old = docs.select(col("doc_id"), split(col("text"), " ").as("arr"))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(arr) >= 3
           THEN transform(sequence(1, size(arr) - 2),
                          i -> concat_ws(' ', slice(arr, i, 3)))
           ELSE array() END""")).as("s"))
      .distinct().as[(Long, String)].collect().toSet
    assert(now === old)
    assert(Dedup.shingles(docs, share = false).count() === now.size)
  }

  test("DataCard buildState kmv rows == distinct-sort-limit of the hash stream") {
    graft.functions.GraftFunctions.register(spark)
    val cd = docs.withColumn("lang", lit("en"))
      .withColumn("n_chars", length(coalesce(col("text"), lit(""))).cast("long"))
    val st = DataCard.buildState(cd, k = 4)
    val gotTok = st.filter(col("kind") === "kmv_tok")
      .select("n").as[Long].collect().sorted.toSeq
    val expTok = docs
      .select(explode(filter(split(lower(coalesce(col("text"), lit(""))), " "),
        t => t =!= "")).as("tok"))
      .select(Sketches.kmvHash(col("tok")).as("h"))
      .distinct().orderBy("h").limit(4).as[Long].collect().sorted.toSeq
    assert(gotTok === expTok)
  }
}
