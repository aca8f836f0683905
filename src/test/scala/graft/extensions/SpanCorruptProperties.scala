package graft.extensions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

import graft.SparkSpec

/** ScalaCheck invariants for span corruption: the (input, target) pair
  * is lossless for ANY token stream (substituting each sentinel's
  * target span into the input reproduces the original), sentinel
  * counts agree everywhere, and window accounting is exact. Case
  * counts kept small — each case runs a real Spark job. */
object SpanCorruptProperties extends Properties("SpanCorrupt") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val word: Gen[String] = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")
  private val doc: Gen[(Long, List[String])] = for {
    id <- Gen.choose(0L, 100000L)
    toks <- Gen.listOf(word)
  } yield (id, toks)

  private def corruptOne(id: Long, toks: Seq[String], l: Int) =
    SpanCorrupt.corrupt(Seq((id, toks.mkString(" "))).toDF("doc_id", "text"),
      windowLen = l).collect().head

  private val sentinel = "<extra_id_(\\d+)>".r

  private def reconstruct(input: String, target: String): Seq[String] = {
    val ms = sentinel.findAllMatchIn(target).toSeq
    val byId = ms.zipWithIndex.map { case (m, i) =>
      val end = if (i + 1 < ms.size) ms(i + 1).start else target.length
      m.group(1).toInt -> target.substring(m.end, end).trim
    }.toMap
    input.split(" ").filter(_.nonEmpty).toSeq.flatMap { tok =>
      sentinel.findFirstMatchIn(tok) match {
        case Some(m) => byId(m.group(1).toInt).split(" ").filter(_.nonEmpty).toSeq
        case None => Seq(tok)
      }
    }
  }

  property("lossless for any token stream and window length") =
    forAll(doc, Gen.choose(1, 5)) { case ((id, toks), l) =>
      val r = corruptOne(id, toks, l)
      reconstruct(r.getAs[String]("input_text"),
        r.getAs[String]("target_text")) == toks
    }

  property("window and sentinel accounting is exact") =
    forAll(doc, Gen.choose(1, 5)) { case ((id, toks), l) =>
      val r = corruptOne(id, toks, l)
      val nw = r.getAs[Long]("n_windows")
      val nm = r.getAs[Long]("n_masked")
      val inIds = sentinel.findAllMatchIn(r.getAs[String]("input_text"))
        .map(_.group(1).toInt).toSeq
      val tgIds = sentinel.findAllMatchIn(r.getAs[String]("target_text"))
        .map(_.group(1).toInt).toSeq
      nw == (toks.size + l - 1) / l &&
        r.getAs[Long]("n_tok") == toks.size.toLong &&
        inIds == (0 until nm.toInt) && tgIds == inIds
    }
}

/** ScalaCheck pin for the Gopher most-frequent-token metric: the sorted
  * run-length fold (the r18 rewrite of the per-distinct rescan) agrees
  * with a brute-force max count under the rule's exact rounding. */
object GopherTopTokenProperties extends Properties("GopherTopToken") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val word: Gen[String] = Gen.oneOf("a", "bb", "ccc", "dd", "e")

  property("run-length fold == brute-force max frequency under rule rounding") =
    forAll(Gen.nonEmptyListOf(word)) { toks =>
      val flag = QualityRules.gopherFlags(
        Seq((1L, toks.mkString(" "))).toDF("doc_id", "text"))
        .collect().head.getAs[Boolean]("r_top_token")
      val top = toks.groupBy(identity).values.map(_.size).max
      val ratio = BigDecimal(top.toDouble / toks.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      flag == (ratio <= 0.2)
    }
}
