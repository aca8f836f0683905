package graft.extensions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

import graft.SparkSpec

/** ScalaCheck invariants for the sliding-window chunker: the covered
  * token set is exactly { i : i mod stride < win } (total coverage iff
  * stride <= win), chunk count is ceil(n/stride), every chunk is exactly
  * min(win, n - start) tokens, and stride >= win produces disjoint
  * chunks. Case counts kept small — each case runs a real Spark job. */
object ChunkProperties extends Properties("slidingChunks") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val cases = for {
    n <- Gen.choose(1, 30)
    win <- Gen.choose(1, 10)
    stride <- Gen.choose(1, 10)
  } yield (n, win, stride)

  property("coverage, count, and sizes") = forAll(cases) { case (n, win, stride) =>
    val text = (0 until n).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val rows = Packing.slidingChunks(docs, win, stride)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val nChunks = (n + stride - 1) / stride
    val covered = rows.flatMap(_._4.split(" ")).toSet
    val expected = (0 until n).filter(_ % stride < win).map(i => s"t$i").toSet
    val sizesOk = rows.forall { case (k, start, nTok, _) =>
      start == k.toLong * stride && nTok == math.min(win, n - start)
    }
    val disjointOk = stride < win || rows.flatMap(_._4.split(" ")).length == covered.size
    rows.length == nChunks && covered == expected && sizesOk && disjointOk
  }
}
