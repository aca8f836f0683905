package graft.extensions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[Packing.globalRowNumber]] (distributed enumeration ≡ the
  * single-partition window it replaces) and [[Packing.shardAssign]]
  * (serpentine dealing: hand-traced fixture, partition property, and
  * the balance claim vs plain round-robin on a skewed corpus). */
class ShardAssignSpec extends SparkSpec {
  import spark.implicits._

  private def mkDoc(id: Long, nTok: Int): (Long, String) =
    id -> Seq.fill(nTok)("t").mkString(" ")

  test("globalRowNumber ≡ single-partition window row_number (1000 rows, duplicate keys, 4 range partitions)") {
    // key space deliberately collides (k = id % 97) so ties cross range
    // boundaries; the doc_id tiebreaker must keep the orders identical
    val df = spark.range(1000).select(
      col("id").as("doc_id"), pmod(col("id"), lit(97L)).as("n_tok"))
    val sortCols = Seq(col("n_tok").desc, col("doc_id"))
    val got = Packing.globalRowNumber(df, sortCols)
      .select("doc_id", "rn").as[(Long, Long)].collect().toMap
    val want = df.withColumn("rn",
        row_number().over(Window.orderBy(sortCols: _*)).cast("long") - 1L)
      .select("doc_id", "rn").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("shardAssign serpentine: hand-traced 5-doc fixture at S=2") {
    val docs = Seq(mkDoc(1, 10), mkDoc(2, 8), mkDoc(3, 6), mkDoc(4, 4),
      mkDoc(5, 2)).toDF("doc_id", "text")
    val got = Packing.shardAssign(docs, 2).orderBy("doc_id")
      .as[(Long, Long, Int)].collect().toSeq
    // ranks by desc tokens: doc1 r0, doc2 r1, doc3 r2, doc4 r3, doc5 r4
    // pass0 deals 0,1; pass1 reverses to 1,0; pass2 starts 0 again
    assert(got == Seq((1L, 10L, 0), (2L, 8L, 1), (3L, 6L, 1), (4L, 4L, 0),
      (5L, 2L, 0)))
    // shard totals: 16 vs 14 — plain round-robin would give 18 vs 12
  }

  test("shardAssign partitions the corpus: every doc exactly once, shard ∈ [0, S)") {
    val docs = (1L to 300L).map(i => mkDoc(i, (i % 37).toInt + 1))
      .toDF("doc_id", "text")
    val out = Packing.shardAssign(docs, 8).collect()
    assert(out.length == 300)
    assert(out.map(_.getLong(0)).toSet == (1L to 300L).toSet)
    assert(out.forall { r => val s = r.getInt(2); s >= 0 && s < 8 })
  }

  test("serpentine balances a skewed (Zipf-ish) corpus tighter than plain round-robin") {
    // token counts ~ 20000/(rank+20): a heavy Zipf-ish head that punishes
    // naive dealing, but no single doc exceeds the per-shard budget (a
    // 13%-of-corpus doc would make ANY assignment blow the 5% bound)
    val docs = (1L to 1000L).map(i => mkDoc(i, (20000 / (i + 20)).toInt + 1))
      .toDF("doc_id", "text")
    val assigned = Packing.shardAssign(docs, 8)
    val serp = Packing.shardBalance(assigned, 8)
      .select("balance_x10k").as[Long].collect()
    assert(serp.length == 8)
    // plain round-robin twin over the same global ranks
    val rr = Packing.globalRowNumber(
        docs.select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tok")),
        Seq(col("n_tok").desc, col("doc_id")))
      .withColumn("shard", pmod(col("rn"), lit(8L)).cast("int"))
    val rrBal = Packing.shardBalance(rr, 8)
      .select("balance_x10k").as[Long].collect()
    def spread(xs: Seq[Long]) = xs.max - xs.min
    assert(spread(serp.toSeq) < spread(rrBal.toSeq),
      s"serpentine ${serp.toSeq} vs round-robin ${rrBal.toSeq}")
    // and the absolute contract the balance row publishes: within 5%
    // (×10000 scale: 10000 = perfect)
    assert(serp.forall(b => b > 9500L && b < 10500L), serp.toSeq.toString)
  }

  test("applyDeletes ≡ packChunks over the filtered corpus; untouched prefix and cost bound hold") {
    val docs = graft.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val budget = 64
    val manifest = Packing.packChunks(docs, budget)
    val deletes = manifest.select("doc_id").filter(col("doc_id") % 37 === 0)

    // 1. the defining contract: repacking the MANIFEST equals packing
    // the FILTERED corpus (no text ever re-tokenized)
    val viaManifest = Packing.applyDeletes(manifest, deletes, budget)
      .orderBy("shard", "doc_id").collect().toSeq
    val viaCorpus = Packing
      .packChunks(docs.filter(col("doc_id") % 37 =!= 0), budget)
      .orderBy("shard", "doc_id").collect().toSeq
    assert(viaManifest == viaCorpus)

    // 2. bounded rewrite: before the first deleted doc's chunk_first,
    // every retained row keeps identical geometry (those chunk files
    // never rewrite); shards without deletes are identical end to end
    val oldRows = manifest.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("start_tok"), r.getAs[Long]("end_tok"))).toMap
    val firstHit = manifest
      .join(deletes, Seq("doc_id"), "left_semi")
      .groupBy("shard").agg(min("chunk_first").as("fh")).collect()
      .map(r => r.getAs[String]("shard") -> r.getAs[Long]("fh")).toMap
    viaManifest.foreach { r =>
      val fh = firstHit.get(r.getAs[String]("shard"))
      val untouched = fh.forall(h => r.getAs[Long]("chunk_last") < h)
      if (untouched)
        assert(oldRows(r.getAs[Long]("doc_id")) ==
          ((r.getAs[Long]("start_tok"), r.getAs[Long]("end_tok"))))
    }

    // 3. the bill reconciles: rewritten = chunks_after − first_hit
    // (0 where no deletes landed), never negative, never > after
    Packing.repackCost(manifest, deletes, budget).collect().foreach { r =>
      val (before, after, rew) = (r.getAs[Long]("chunks_before"),
        r.getAs[Long]("chunks_after"), r.getAs[Long]("chunks_rewritten"))
      assert(rew >= 0 && rew <= after, r.toString)
      assert(after <= before, r.toString)
      firstHit.get(r.getAs[String]("shard")) match {
        case Some(h) => assert(rew == math.max(after - h, 0L), r.toString)
        case None => assert(rew == 0L, r.toString)
      }
    }
  }

  test("composition: assignment joins back and packChunks packs per shard") {
    val docs = Seq(mkDoc(1, 6), mkDoc(2, 5), mkDoc(3, 4), mkDoc(4, 3))
      .toDF("doc_id", "text")
    val withShard = docs.join(
      Packing.shardAssign(docs, 2).select("doc_id", "shard"), Seq("doc_id"))
    val packed = Packing.packChunks(withShard, budget = 4, shardCol = "shard")
    // each shard's token stream restarts at 0 and is gapless
    val byShard = packed.orderBy("shard", "doc_id").collect()
      .groupBy(_.getAs[Int]("shard"))
    assert(byShard.keySet == Set(0, 1))
    byShard.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("start_tok"))
      assert(sorted.head.getAs[Long]("start_tok") == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("end_tok") == b.getAs[Long]("start_tok"))
        case _ =>
      }
    }
  }
}
