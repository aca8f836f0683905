package graft.extensions

import org.apache.spark.sql.Row

import graft.SparkSpec

/** Unit coverage for the round-4 operator surface at adversarial
  * parameter points the single-point oracle rows don't reach:
  * keepCanonical tie-breaks, the jaccardEstimate exact column against an
  * independently computed ground truth, bigramLmScore short-doc NULLs
  * and a hand-derived probability, zipfStats cumulative shares, and
  * normalizeText unicode/whitespace/null behavior. */
class Round4OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- keepCanonical -------------------------------------------------

  test("keepCanonical keeps the longest doc per cluster, ties to smallest id") {
    // docs 1-3 share identical text (⇒ identical SimHash cluster);
    // doc 2 and 3 tie on n_chars, so doc 2 wins by id; doc 4 is alone
    val docs = Seq(
      (1L, "x y z w", 7L),
      (2L, "x y z w", 100L),
      (3L, "x y z w", 100L),
      (4L, "p q r s", 7L))
      .toDF("doc_id", "text", "n_chars")
    val out = Dedup.keepCanonical(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(out(1L) == (2L, false))
    assert(out(2L) == (2L, true))
    assert(out(3L) == (2L, false))
    assert(out(4L) == (4L, true))
  }

  // ---- jaccardEstimate ----------------------------------------------

  private def shingleSet(text: String): Set[String] =
    text.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet

  test("jaccardEstimate: exact column matches independent ground truth; " +
    "identical docs estimate 1.0") {
    val t1 = "a b c d e f g h"
    val t3 = "a b c d e f g q"   // near-dup of t1
    val docs = Seq(
      (1L, t1, 15L), (2L, t1, 15L), (3L, t3, 15L),
      (10L, "z1 z2 z3 z4 z5 z6 z7 z8", 20L)) // disjoint shingles
      .toDF("doc_id", "text", "n_chars")
    val texts = Map(1L -> t1, 2L -> t1, 3L -> t3,
      10L -> "z1 z2 z3 z4 z5 z6 z7 z8")
    val rows = Dedup.jaccardEstimate(docs).collect()
    // identical docs MUST surface as a candidate pair with est = exact = 1
    val idPair = rows.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(idPair.isDefined, rows.mkString(","))
    assert(idPair.get.getDouble(2) == 1.0 && idPair.get.getDouble(3) == 1.0)
    // every candidate's exact_jac equals the Scala-computed shingle Jaccard
    rows.foreach { case Row(a: Long, b: Long, est: Double, exact: Double) =>
      val (sa, sb) = (shingleSet(texts(a)), shingleSet(texts(b)))
      val truth = (sa & sb).size.toDouble / (sa | sb).size
      assert(math.abs(exact - truth) < 5e-5, s"($a,$b): $exact vs $truth")
      assert(est >= 0.0 && est <= 1.0)
      assert(a < b, "pairs are ordered")
    }
    // the shingle-disjoint doc can never be a candidate of the others
    assert(!rows.exists(r => r.getLong(0) == 10L || r.getLong(1) == 10L))
  }

  // ---- bigramLmScore -------------------------------------------------

  test("bigramLmScore: docs with <2 tokens score NULL; hand-derived value") {
    // corpus: model C('a b')=1, ctx C(a·)=1, V=|{a,b}|=2, k=0.5
    // ⇒ P(b|a) = (1+0.5)/(1+0.5·2) = 0.75, log2 = -0.415
    val docs = Seq((1L, "a b"), (2L, "a"), (3L, "")).toDF("doc_id", "text")
    val rows = TextAnalysis.bigramLmScore(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toList.sortBy(_._1)
    assert(rows == List(
      (1L, 1L, Some(-0.415)),
      (2L, 0L, None),
      (3L, 0L, None)))
  }

  // ---- zipfStats -----------------------------------------------------

  test("zipfStats: ranks by count desc then token, cum_share sums to 1") {
    val docs = Seq((1L, "a a a b"), (2L, "b c")).toDF("doc_id", "text")
    val rows = TextAnalysis.zipfStats(docs, topK = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toList
    assert(rows == List(
      (1, "a", 3L, 0.5), (2, "b", 2L, 0.8333), (3, "c", 1L, 1.0)))
  }

  test("zipfStats: topK truncates after ranking the full vocabulary") {
    val docs = Seq((1L, "a a b c")).toDF("doc_id", "text")
    val rows = TextAnalysis.zipfStats(docs, topK = 1).collect()
    assert(rows.length == 1 && rows(0).getString(1) == "a")
    assert(rows(0).getDouble(3) == 0.5) // share of the WHOLE corpus, not the head
  }

  // ---- normalizeText -------------------------------------------------

  test("normalizeText: unicode letters strip, whitespace collapses, null is empty") {
    val docs = Seq(
      (1L, "Héllo,  Wörld!"),
      (2L, "  A  B  "),
      (3L, null.asInstanceOf[String]),
      (4L, "already clean 123"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.normalizeText(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList
      .sortBy(_._1)
    assert(rows == List(
      (1L, "h llo w rld", 11L),
      (2L, "a b", 3L),
      (3L, "", 0L),
      (4L, "already clean 123", 17L)))
  }
}
