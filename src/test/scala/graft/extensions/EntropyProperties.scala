package graft.extensions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

import graft.SparkSpec

/** ScalaCheck invariants for the unigram-entropy quality signal:
  * 0 <= H <= ln(n_distinct) (the uniform distribution maximizes
  * entropy), a uniform doc hits the bound exactly, and duplicating
  * every token k times leaves the distribution — hence H — unchanged.
  * Case counts kept small — each case runs a real Spark job. */
object EntropyProperties extends Properties("TokenEntropy") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val word: Gen[String] = for {
    len <- Gen.choose(1, 4)
    cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c', 'd'))
  } yield cs.mkString

  private def entropyOf(tokens: Seq[String]): (Long, Long, Double) = {
    val r = TextAnalysis
      .tokenEntropy(Seq((1L, tokens.mkString(" "))).toDF("doc_id", "text"))
      .collect().head
    (r.getLong(1), r.getLong(2), r.getDouble(3))
  }

  property("0 <= H <= ln(n_distinct) + rounding slack") =
    forAll(Gen.nonEmptyListOf(word)) { toks =>
      val (_, nDistinct, h) = entropyOf(toks)
      h >= 0.0 && h <= math.log(nDistinct.toDouble) + 5e-5
    }

  property("a uniform doc hits the ln(n_distinct) bound exactly") =
    forAll(Gen.choose(1, 8)) { k =>
      val toks = (1 to k).map(i => s"w$i")
      val (_, _, h) = entropyOf(toks)
      h == math.rint(math.log(k.toDouble) * 1e4) / 1e4
    }

  property("k-fold duplication of every token preserves H") =
    forAll(Gen.nonEmptyListOf(word), Gen.choose(2, 4)) { (toks, k) =>
      val (_, _, h1) = entropyOf(toks)
      val (n2, d2, h2) = entropyOf(toks.flatMap(t => Seq.fill(k)(t)))
      h1 == h2 && n2 == toks.size.toLong * k
    }
}

/** Invariants for the mean-IDF novelty score: 0 <= novelty <=
  * ln(n_docs) (a token in every doc scores 0, a token unique to one
  * doc scores the ln N ceiling), and an all-identical corpus scores
  * exactly 0 everywhere — boilerplate has no novelty. */
object NoveltyProperties extends Properties("DocNovelty") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val word: Gen[String] = for {
    len <- Gen.choose(1, 3)
    cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString

  private val corpus: Gen[List[List[String]]] = for {
    n <- Gen.choose(2, 5)
    docs <- Gen.listOfN(n, Gen.nonEmptyListOf(word))
  } yield docs

  property("0 <= novelty <= ln(n_docs) + rounding slack") =
    forAll(corpus) { docs =>
      val df = docs.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val bound = math.log(docs.size.toDouble) + 5e-4
      TextAnalysis.docNovelty(df).collect()
        .forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= bound)
    }

  property("an all-identical corpus has zero novelty everywhere") =
    forAll(Gen.nonEmptyListOf(word), Gen.choose(2, 5)) { (toks, n) =>
      val df = (1 to n).map(i => (i.toLong, toks.mkString(" ")))
        .toDF("doc_id", "text")
      TextAnalysis.docNovelty(df).collect().forall(_.getDouble(2) == 0.0)
    }
}
