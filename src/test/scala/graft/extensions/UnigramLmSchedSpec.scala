package graft.extensions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[UnigramLm.trainScheduled]] — Kudo's shrinking-vocabulary pruning
  * schedule on the canonical unigram teaching corpus
  * (hug×10, pug×5, pun×12, bun×4, hugs×5 — the standard worked example
  * of unigram-LM training): likelihood-loss ranking keeps the whole
  * high-frequency words where a raw-count cut would keep the most
  * frequent SUBSTRINGS, plus the schedule's structural contracts
  * (unconditional char coverage, counts from the last E-step, bounded
  * loop, determinism). */
class UnigramLmSchedSpec extends SparkSpec {
  import spark.implicits._

  private lazy val canonical = Seq(
    (1L, (List.fill(10)("hug") ++ List.fill(5)("pug") ++
      List.fill(12)("pun") ++ List.fill(4)("bun") ++
      List.fill(5)("hugs")).mkString(" ")))
    .toDF("doc_id", "text")

  test("canonical example: loss ranking keeps the whole words; chars survive unconditionally (hand-pinned rows)") {
    val out = UnigramLm.trainScheduled(canonical, vocabSize = 3,
      maxPieceLen = 4, pruneRounds = 2, shrink = 0.5)
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2), r.getBoolean(3)))
    // kept multi pieces are the three whole words by likelihood loss —
    // loss(p) = c·(logp(p) − Σ char logp) rewards a piece whose single
    // log beats the sum of its chars' logs, i.e. exactly the pieces
    // that compress the corpus; a count cut would have kept 'ug'-style
    // substrings instead. 'pug' decomposes (p·u·g), which is where the
    // u/g/p counts come from; h and s end unused (NULL logp) but stay
    // for coverage.
    assert(out.toSeq == Seq(
      ("pun", 12L, -2.169925, false),
      ("hug", 10L, -2.432959, false),
      ("u", 9L, -2.584963, true),
      ("g", 5L, -3.432959, true),
      ("hugs", 5L, -3.432959, false),
      ("p", 5L, -3.432959, true),
      ("b", 4L, -3.754888, true),
      ("n", 4L, -3.754888, true),
      ("h", 0L, null, true),
      ("s", 0L, null, true)))
  }

  test("vocabSize=1: the single highest-loss piece survives; every corpus char still present") {
    val out = UnigramLm.trainScheduled(canonical, vocabSize = 1,
      maxPieceLen = 4, pruneRounds = 2, shrink = 0.5).collect()
    val multi = out.filter(!_.getBoolean(3)).map(_.getString(0)).toSeq
    assert(multi == Seq("pun"), s"highest-loss piece only, got $multi")
    val chars = out.filter(_.getBoolean(3)).map(_.getString(0)).toSet
    assert(chars == Set("h", "u", "g", "p", "n", "b", "s"),
      "single-char coverage is unconditional at any target size")
  }

  test("structural contracts on the harness corpus: bounded size, counted multis, char coverage, determinism") {
    val docs = graft.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val out = UnigramLm.trainScheduled(docs, vocabSize = 24,
      maxPieceLen = 4, pruneRounds = 2, shrink = 0.5)
    val rows = out.collect()
    val chars = UnigramLm.wordFreqs(docs)
      .select(explode(expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))")))
      .distinct().as[String].collect().toSet
    assert(rows.count(!_.getBoolean(3)) <= 24,
      "at most vocabSize multi-char pieces survive the final cut")
    assert(rows.filter(_.getBoolean(3)).map(_.getString(0)).toSet == chars,
      "every corpus character is in the output, used or not")
    assert(rows.filter(!_.getBoolean(3)).forall(_.getLong(1) > 0),
      "a kept multi-char piece was counted by the final E-step")
    // NULL logp exactly for zero counts; counted rows renormalize to
    // ≤ 0 log-probs
    rows.foreach { r =>
      if (r.getLong(1) == 0L) assert(r.isNullAt(2))
      else assert(!r.isNullAt(2) && r.getDouble(2) <= 0.0)
    }
    val again = UnigramLm.trainScheduled(docs, vocabSize = 24,
      maxPieceLen = 4, pruneRounds = 2, shrink = 0.5).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "the schedule is deterministic end-to-end")
  }

  test("empty corpus: empty vocabulary, not a crash; bounds enforced") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(UnigramLm.trainScheduled(empty).count() == 0L)
    intercept[IllegalArgumentException] {
      UnigramLm.trainScheduled(canonical, pruneRounds = 9)
    }
    intercept[IllegalArgumentException] {
      UnigramLm.trainScheduled(canonical, shrink = 1.0)
    }
  }
}
