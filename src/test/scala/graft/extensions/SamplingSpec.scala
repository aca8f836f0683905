package graft.extensions

import graft.SparkSpec

/** Weighted-sampling contracts ([[Sampling]]): the Efraimidis–Spirakis
  * selection matches a driver-side reference, and the systematic
  * sampler's integer guarantees (mass can't be skipped, even spacing
  * under unit weights, ≤ k picks) hold structurally. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "text", "source")

  private lazy val docs = mkDocs(Seq(
    (1L, "a b c d e", "s0"),
    (2L, "a b", "s0"),
    (3L, "a b c d e f g h i j k l", "s0"),
    (4L, "x", "s0"),
    (5L, "", "s0"), // zero weight: never sampled
    (6L, "p q r s", "s1"),
    (7L, "p q", "s1")))

  private def md5u48(id: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(6).map(b => f"$b%02x").mkString, 16)
  }

  test("prioritySample matches the driver-side Efraimidis–Spirakis reference") {
    val got = Sampling.prioritySample(docs, k = 2)
      .as[(String, Long, Long, Long)].collect()
      .map { case (s, id, w, r) => (s, r) -> (id, w) }.toMap
    val ref = docs.as[(Long, String, String)].collect()
      .map { case (id, t, s) =>
        (s, id, t.toLowerCase.split(" ").count(_.nonEmpty).toLong) }
      .filter(_._3 > 0)
      .groupBy(_._1).toSeq.flatMap { case (src, rows) =>
        rows.map { case (_, id, w) =>
          val u = (md5u48(id) + 1).toDouble / 281474976710657.0
          (id, w, math.log(u) / w)
        }.sortBy { case (id, _, key) => (-key, id) }
          .zipWithIndex.take(2)
          .map { case ((id, w, _), i) => (src, i + 1L) -> (id, w) }
      }.toMap
    assert(got == ref, s"$got vs $ref")
    // zero-weight doc 5 must not appear anywhere
    assert(!got.values.exists(_._1 == 5L))
  }

  test("prioritySample emits at most k per source and is deterministic") {
    val a = Sampling.prioritySample(docs, k = 2).collect().toSet
    val b = Sampling.prioritySample(docs, k = 2).collect().toSet
    assert(a == b)
    val perSrc = a.groupBy(_.getString(0)).view.mapValues(_.size)
    assert(perSrc.toMap.values.forall(_ <= 2))
  }

  test("systematicSample: unit weights pick exactly every step-th doc") {
    // 16 unit docs, k=4 → step=4 → picks are the docs whose interval
    // crosses token indices 4, 8, 12, 16: doc_ids 4, 8, 12, 16
    val unit = mkDocs((1L to 16L).map(i => (i, "tok", "s")))
    val got = Sampling.systematicSample(unit, k = 4)
      .as[(String, Long, Long, Long)].collect().map(_._2).sorted
    assert(got.toSeq == Seq(4L, 8L, 12L, 16L), got.mkString(","))
  }

  test("systematicSample: a doc spanning a full stride is always picked; ≤ k picks") {
    // s0 total = 5+2+12+1 = 20, k=4 → step=5; doc 3 (w=12 ≥ 5) must be in
    val got = Sampling.systematicSample(docs, k = 4)
      .as[(String, Long, Long, Long)].collect()
    assert(got.exists(r => r._2 == 3L), got.mkString(";"))
    assert(!got.exists(r => r._2 == 5L), "zero-weight doc picked")
    val perSrc = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perSrc.values.forall(_ <= 4), perSrc.toString)
  }

  test("systematicSample conserves spacing: consecutive picks are one stride apart") {
    // in token space: each selected doc's interval contains exactly the
    // next multiple of step when weights < step (no doc straddles two)
    val unit = mkDocs((1L to 30L).map(i => (i, "t1 t2 t3", "s"))) // w=3, total=90
    val k = 9 // step = 10
    val got = Sampling.systematicSample(unit, k)
      .as[(String, Long, Long, Long)].collect().sortBy(_._4)
    val strides = got.map(r => r._4 / 10) // start_tok / step
    // each pick sits in a distinct stride, strides are consecutive
    assert(strides.distinct.length == got.length, got.mkString(";"))
    assert(got.length == 9, got.length.toString)
  }
}
