package graft.extensions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exact-substring span geometry: maximal-span merging (overlap, touch,
  * gap), the keep-one-canonical-copy removal budget, and consistency
  * with q_dup_spans' window counts. */
class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  // doc 2 embeds doc 1's single 6-token window at offset 2.
  private lazy val quoteDocs = Seq(
    (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),
    (2L, "x1 x2 t1 t2 t3 t4 t5 t6 z1 z2"),
    (3L, "u1 u2 u3 u4 u5 u6 u7")).toDF("doc_id", "text")

  private def spans(df: org.apache.spark.sql.DataFrame) =
    TextAnalysis.exactSubstrSpans(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

  private def clean(df: org.apache.spark.sql.DataFrame) =
    TextAnalysis.exactSubstrClean(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("a single shared window surfaces as one span per doc at its own offset") {
    assert(spans(quoteDocs) == Set(
      (1L, 0L, 6L, 6L, 1L),
      (2L, 2L, 8L, 6L, 1L)))
  }

  test("owner (min doc_id) keeps its copy; the other doc pays the removal") {
    assert(clean(quoteDocs) == Map(
      1L -> ((10L, 0L, 1.0)),
      2L -> ((10L, 6L, 0.4)),
      3L -> ((7L, 0L, 1.0))))
  }

  test("consecutive overlapping duplicated windows fuse into one maximal span") {
    // identical 9-token docs: four shared windows at pos 0..3 merge to [0, 9)
    val docs = Seq(
      (3L, "a1 a2 a3 a4 a5 a6 a7 a8 a9"),
      (4L, "a1 a2 a3 a4 a5 a6 a7 a8 a9")).toDF("doc_id", "text")
    assert(spans(docs) == Set(
      (3L, 0L, 9L, 9L, 4L),
      (4L, 0L, 9L, 9L, 4L)))
    assert(clean(docs) == Map(
      3L -> ((9L, 0L, 1.0)),
      4L -> ((9L, 9L, 0.0))))
  }

  test("touching intervals (next pos == prev pos + k) merge; a wider gap splits") {
    // doc 7 duplicates two windows at pos 0 and pos 6 (touch -> one span
    // [0, 12)); doc 8 carries the same windows at pos 0 and pos 11
    // (11 > 0 + 6 -> two spans). The five filler tokens between them are
    // unique, so only the planted windows recur across docs.
    val docs = Seq(
      (7L, "p1 p2 p3 p4 p5 p6 q1 q2 q3 q4 q5 q6"),
      (8L, "p1 p2 p3 p4 p5 p6 z9 z8 z7 z6 z5 q1 q2 q3 q4 q5 q6")).toDF("doc_id", "text")
    assert(spans(docs) == Set(
      (7L, 0L, 12L, 12L, 2L),
      (8L, 0L, 6L, 6L, 1L),
      (8L, 11L, 17L, 6L, 1L)))
    // owner 7 keeps both windows; doc 8 loses both disjoint spans: 12 of 17
    assert(clean(docs) == Map(
      7L -> ((12L, 0L, 1.0)),
      8L -> ((17L, 12L, 0.2941))))
  }

  test("an owner keeps every position of its window, including intra-doc repeats") {
    // doc 5 holds the shared window twice (pos 0 and pos 13); doc 6 once.
    // Both doc-5 positions are duplicated SPANS (cross-doc recurrence),
    // but the removal budget charges only non-owner doc 6.
    val docs = Seq(
      (5L, "g1 g2 g3 g4 g5 g6 m1 m2 m3 m4 m5 m6 m7 g1 g2 g3 g4 g5 g6"),
      (6L, "g1 g2 g3 g4 g5 g6")).toDF("doc_id", "text")
    assert(spans(docs) == Set(
      (5L, 0L, 6L, 6L, 1L),
      (5L, 13L, 19L, 6L, 1L),
      (6L, 0L, 6L, 6L, 1L)))
    assert(clean(docs) == Map(
      5L -> ((19L, 0L, 1.0)),
      6L -> ((6L, 6L, 0.0))))
  }

  test("span window counts reconcile with duplicatedSpans' per-doc totals") {
    val fixture = quoteDocs.union(Seq(
      (9L, "p1 p2 p3 p4 p5 p6 q1 q2 q3 q4 q5 q6"),
      (10L, "p1 p2 p3 p4 p5 p6 z9 z8 z7 z6 z5 q1 q2 q3 q4 q5 q6"))
      .toDF("doc_id", "text"))
    val bySpans = TextAnalysis.exactSubstrSpans(fixture)
      .groupBy("doc_id").agg(sum("n_windows").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byCounts = TextAnalysis.duplicatedSpans(fixture)
      .filter(col("n_dup_windows") > 0)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(bySpans == byCounts,
      s"merged spans must cover exactly the duplicated windows: $bySpans vs $byCounts")
  }

  test("exactSubstrApply ships exactly the clean budget: token counts and owner round-trips") {
    val docs = quoteDocs.union(Seq(
      (7L, "p1 p2 p3 p4 p5 p6 q1 q2 q3 q4 q5 q6"),
      (8L, "p1 p2 p3 p4 p5 p6 z9 z8 z7 z6 z5 q1 q2 q3 q4 q5 q6"))
      .toDF("doc_id", "text"))
    val budget = clean(docs) // doc_id -> (n_tok, n_removed, keep_frac)
    val applied = TextAnalysis.exactSubstrApply(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val canon = docs.select(col("doc_id"),
      concat_ws(" ", filter(split(lower(coalesce(col("text"), lit(""))), " "),
        t => t =!= "")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(applied.keySet == budget.keySet)
    budget.foreach { case (id, (nTok, nRemoved, _)) =>
      val kept =
        if (applied(id).isEmpty) 0L
        else applied(id).split(" ").length.toLong
      assert(kept == nTok - nRemoved,
        s"doc $id: clean_text carries $kept tokens, budget says ${nTok - nRemoved}")
      if (nRemoved == 0L)
        assert(applied(id) == canon(id),
          s"doc $id removed nothing but its text changed: '${applied(id)}'")
    }
    // and something was genuinely scrubbed (the fixture plants removals)
    assert(budget.values.exists(_._2 > 0L))
  }

  test("hashWindows parity: hashed spans/clean/apply ≡ raw on the sf0.01 corpus") {
    val docs = graft.Tables.table(spark, "/root/testdata/sf0.01", "documents")
      .select("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toString).sorted
    assert(rows(TextAnalysis.exactSubstrSpans(docs, hashWindows = true))
      .sameElements(rows(TextAnalysis.exactSubstrSpans(docs))))
    assert(rows(TextAnalysis.exactSubstrClean(docs, hashWindows = true))
      .sameElements(rows(TextAnalysis.exactSubstrClean(docs))))
    assert(rows(TextAnalysis.exactSubstrApply(docs, hashWindows = true))
      .sameElements(rows(TextAnalysis.exactSubstrApply(docs))))
    assert(rows(TextAnalysis.duplicatedSpans(docs, hashWindows = true))
      .sameElements(rows(TextAnalysis.duplicatedSpans(docs))))
  }

  // the plan tests disable the shared-frame memo: a memoized call
  // returns the checkpointed frame (LogicalRDD), hiding the build
  // plan these assertions exist to inspect
  private def withoutSharing[T](body: => T): T = {
    spark.conf.set("spark.graft.dedup.shareFrames", "false")
    try body finally spark.conf.unset("spark.graft.dedup.shareFrames")
  }

  test("hashWindows swaps the shuffle key for an 8-byte hash — no string window survives the exchange") {
    withoutSharing {
      val plan = TextAnalysis.exactSubstrSpans(quoteDocs, hashWindows = true)
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("xxhash64"), plan)
      // same exchange budget as the raw plan (the lever changes key WIDTH,
      // not plan shape)
      val exec = TextAnalysis.exactSubstrSpans(quoteDocs, hashWindows = true)
        .queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(exec).length
      assert(exchanges <= 3, s"expected <=3 hash exchanges, got $exchanges:\n$exec")
    }
  }

  test("plan shape: no cartesian product; the span groupBy reuses the window's doc partitioning") {
    withoutSharing {
      val plan = TextAnalysis.exactSubstrSpans(quoteDocs)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan)
      // window-key agg + join-back + one doc_id sort for the islands merge;
      // the final (doc_id, run) aggregation must NOT add a fourth shuffle
      // (HashPartitioning(doc_id) already clusters the grouping keys)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges <= 3, s"expected <=3 hash exchanges, got $exchanges:\n$plan")
    }
  }
}
