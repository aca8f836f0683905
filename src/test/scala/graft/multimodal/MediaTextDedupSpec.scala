package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.extensions.Dedup

/** The q_media_text_dedup composition with REAL media payloads — the
  * registry row derives its media fingerprint deterministically so
  * DuckDB can reproduce it; this spec pins the "drop-in" claim by
  * running the SAME composition over [[Multimodal.imageHashes]]' aHash
  * column computed from genuine PNG bytes: text SimHash banding ∘
  * image perceptual-hash banding, one full-outer join on the pair key,
  * channel attribution (text / media / both) exact. */
class MediaTextDedupSpec extends SparkSpec {
  import spark.implicits._

  private def seededPng(seed: Int, perturb: Boolean = false): Array[Byte] =
    TestImages.seededPng(seed, perturb)

  test("joint pairs channel-attribute exactly over real aHash + text SimHash") {
    // d1/d2: same caption, near-identical image  -> both
    // d3: same caption as d1/d2, unrelated image -> text with d1, d2
    // d4: distinct caption, near-dup of d3's image -> media with d3
    // d5: distinct caption, unrelated image -> no pairs
    val t1 = "senior spark engineer wanted for the lakehouse team"
    val docs = Seq(
      (1L, t1), (2L, t1), (3L, t1),
      (4L, "completely unrelated gibberish zq xv ww pp"),
      (5L, "another disjoint caption about embedded firmware qa")
    ).toDF("doc_id", "text")
    val media = Seq(
      (1L, seededPng(1)), (2L, seededPng(1, perturb = true)),
      (3L, seededPng(9)), (4L, seededPng(9, perturb = true)),
      (5L, seededPng(77))
    ).map { case (id, p) =>
      Multimodal.MediaRow(id, "image", p,
        Multimodal.MediaMeta(None, None, None, None))
    }.toDS()

    // the registry row's synthesized mhash column swapped for the REAL
    // perceptual hash — structurally identical composition
    val mediaFp = Multimodal.imageHashes(media).toDF()
      .select(col("media_id").as("doc_id"), col("ahash"))
    val textPairs = Dedup
      .hammingBandPairs(Dedup.simHash(docs), "doc_id", "simhash",
        maxHamming = 3, numBands = 4)
      .select(col("a"), col("b"), col("hamming").as("t_hamming"))
    val mediaPairs = Dedup
      .hammingBandPairs(mediaFp, "doc_id", "ahash",
        maxHamming = 3, numBands = 4)
      .select(col("a"), col("b"), col("hamming").as("m_hamming"))
    val joint = textPairs.join(mediaPairs, Seq("a", "b"), "full_outer")
      .select(col("a"), col("b"),
        when(col("t_hamming").isNotNull && col("m_hamming").isNotNull, "both")
          .when(col("t_hamming").isNotNull, "text")
          .otherwise("media").as("channel"))

    val got = joint.as[(Long, Long, String)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    assert(got == Map(
      (1L, 2L) -> "both",
      (1L, 3L) -> "text", (2L, 3L) -> "text",
      (3L, 4L) -> "media"), got.toString)

    // both legs stay banded — the composition never goes all-pairs
    val p = joint.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("registry fixture's media bands all partition the corpus — no constant band") {
    // r16 ADVICE: the old 48-bit fixture hash banded 4×16 left band 3
    // constant-zero, so that band's bucket held the ENTIRE corpus and
    // its self-join was all-pairs behind an equi-join node — a plan-node
    // assertion can't see it. The honest check is band-bucket OCCUPANCY:
    // with the 63-bit fingerprint every band's largest bucket must stay
    // a small fraction of the corpus (it is bounded by the meme-template
    // group sizes plus md5 collisions, not by n).
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.table(spark, dir, "documents")
    val n = docs.count()
    val worst = Dedup.hammingBands(
        graft.queries.Round16Queries.mediaFingerprints(docs),
        "doc_id", "mhash", numBands = 4)
      .groupBy("i", "bv").count()
      .groupBy("i").agg(max("count").as("worst"))
      .select("i", "worst").as[(Int, Long)].collect().toMap
    assert(worst.keySet == Set(0, 1, 2, 3), worst.toString)
    worst.foreach { case (band, occ) =>
      assert(occ <= n / 4,
        s"band $band's largest bucket holds $occ of $n docs — a " +
          "degenerate (constant) band makes that band's self-join all-pairs")
    }
  }
}
