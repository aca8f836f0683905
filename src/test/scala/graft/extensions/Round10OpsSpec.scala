package graft.extensions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-10 composition surface: the TrainingSet ship-it artifact —
  * policy (who ships), budget fidelity (packed token counts equal the
  * scrub budget), and per-shard packing geometry, on the sf0.001
  * corpus. */
class Round10OpsSpec extends SparkSpec {

  private lazy val docs = graft.Tables
    .table(spark, "/root/testdata/sf0.001", "documents")
  private lazy val packed = TrainingSet.compose(docs).collect()
    .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7)))
  // (doc_id, shard, n_tok, end_tok, start_tok, chunk_first, chunk_last, assignment)

  test("policy: exactly the non-dropped, non-empty-scrub docs ship, under their assignment") {
    val assign = Dedup.trainEvalSplit(docs).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val cleanBudget = TextAnalysis.exactSubstrClean(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1) - r.getLong(2))).toMap
    val expected = assign.collect {
      case (id, a) if a != "dropped" && cleanBudget(id) > 0 => id -> a
    }
    assert(packed.map(p => p._1 -> p._8).toMap == expected)
    assert(packed.nonEmpty)
  }

  test("budget fidelity: each packed n_tok equals the scrub budget's n_tok - n_removed") {
    val cleanBudget = TextAnalysis.exactSubstrClean(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1) - r.getLong(2))).toMap
    packed.foreach { p =>
      assert(p._3 == cleanBudget(p._1),
        s"doc ${p._1}: packed ${p._3} tokens, budget says ${cleanBudget(p._1)}")
    }
  }

  test("geometry: shard streams are gapless cumulative spans with correct chunk bounds") {
    packed.groupBy(_._2).foreach { case (shard, rows) =>
      val sorted = rows.sortBy(_._1)
      var cursor = 0L
      sorted.foreach { case (id, _, nTok, endTok, startTok, cf, cl, _) =>
        assert(startTok == cursor, s"$shard doc $id starts at $startTok, stream is at $cursor")
        assert(endTok == startTok + nTok)
        assert(cf == startTok / 64 && cl == (endTok - 1) / 64,
          s"$shard doc $id chunk bounds ($cf,$cl)")
        cursor = endTok
      }
    }
    // shard = assignment:lang — train and eval never share a stream
    assert(packed.forall(p => p._2.startsWith(p._8 + ":")))
  }

  test("plan: PQ encode + ADC is a zero-exchange, zero-join chain over the scan") {
    val emb = graft.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val books = Array.tabulate(2)(j =>
      Array(Array.fill(32)(0.1 * (j + 1)), Array.fill(32)(-0.1 * (j + 1))))
    val cb = ProductQuantization.Codebooks(64, 2, books)
    val df = ProductQuantization.adcScores(
      ProductQuantization.encode(emb, cb), cb, Array.fill(64)(0.0))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("composeBalanced: same shipped docs as compose, disjoint class namespaces, serpentine by scrubbed count") {
    val balanced = TrainingSet.composeBalanced(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(7)))
    // (doc_id, shard, n_tok, assignment)
    // the POLICY is unchanged — only shard labels differ
    assert(balanced.map(t => (t._1, t._3, t._4)).sorted.toSeq ==
      packed.map(t => (t._1, t._3, t._8)).sorted.toSeq)
    // shard namespace: assignment:lane, lane in 0..7, never cross-class
    assert(balanced.forall { case (_, shard, _, assignment) =>
      val Array(cls, lane) = shard.split(":", 2)
      cls == assignment && lane.toInt >= 0 && lane.toInt < 8
    }, balanced.map(_._2).distinct.mkString(","))
    // dealing is serpentine over (clean n_tok desc, doc_id) per class:
    // recompute the expectation driver-side from the shipped counts
    balanced.groupBy(_._4).foreach { case (_, rows) =>
      val ranked = rows.sortBy(t => (-t._3, t._1)).zipWithIndex
      ranked.foreach { case ((_, shard, _, _), rn) =>
        val lane = if ((rn / 8) % 2 == 0) rn % 8 else 7 - rn % 8
        assert(shard.endsWith(s":$lane"), s"rank $rn got $shard")
      }
    }
  }

  test("plan: the training-set composition never materializes a cartesian product") {
    val plan = TrainingSet.compose(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the only nested-loop node allowed is the mixture-rate build's
    // cross against the broadcast ONE-ROW totals frame
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(nlj <= 1, s"expected <=1 broadcast NLJ (one-row totals cross), got $nlj:\n$plan")
  }
}
