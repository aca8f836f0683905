package graft.extensions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

import graft.SparkSpec

/** Driver-side reference twin of [[WordPiece.learn]] /
  * [[WordPiece.learnBatched]] — the [[BpeSim]] discipline under the
  * likelihood argmax: score = c(lr) / (c(l)·c(r)) computed with the
  * engine's exact cast order (count → double BEFORE the product), rank
  * order (score DESC, l ASC, r ASC), literal left-to-right merge
  * application (shared with [[BpeSim]]), and the STRONGER
  * [[WordPiece.conflicts]] predicate — within a batch no selected merge
  * may touch another's pair occurrences OR operand symbol counts, else
  * its recorded score would differ from sequential's. */
private[extensions] object WpSim {
  type Pair = (String, String)
  /** (rank, left, right, pairFreq, score) — [[WordPiece.Merge]]'s shape. */
  type Trace = List[(Int, String, String, Long, Double)]

  def symCounts(seqs: Map[Vector[String], Long]): Map[String, Long] =
    seqs.toList.flatMap { case (s, f) => s.map(_ -> f) }
      .groupMapReduce(_._1)(_._2)(_ + _)

  /** Likelihood-ranked pairs — the engine's rankedPairs order and its
    * exact double arithmetic (c * 1.0, then the cast product). */
  def ranked(seqs: Map[Vector[String], Long]): List[(Pair, Long, Double)] = {
    val sc = symCounts(seqs)
    BpeSim.pairCounts(seqs).toList
      .map { case ((l, r), c) =>
        ((l, r), c, c * 1.0 / (sc(l).toDouble * sc(r).toDouble)) }
      .sortBy { case ((l, r), _, s) => (-s, l, r) }
  }

  def sequential(words: Map[String, Int], n: Int): Trace = {
    var seqs = BpeSim.toSeqs(words)
    val trace = List.newBuilder[(Int, String, String, Long, Double)]
    var rank = 1
    var continue = rank <= n
    while (continue) {
      ranked(seqs).headOption match {
        case None => continue = false
        case Some(((l, r), c, s)) =>
          trace += ((rank, l, r, c, s))
          seqs = BpeSim.applyAll(seqs, (l, r))
          rank += 1
          continue = rank <= n
      }
    }
    trace.result()
  }

  final case class SimResult(trace: Trace, clean: Boolean, rounds: List[List[Pair]])

  /** Mirrors [[WordPiece.learnBatched]] exactly: same candidate window,
    * same skip-style top-m non-conflicting selection (under the
    * WordPiece predicate), same one-pass fold application. `clean` =
    * replaying the batch one-at-a-time keeps every selection the global
    * argmax at its turn — the precondition under which batched ≡
    * sequential is provable. */
  def batched(words: Map[String, Int], n: Int, m: Int): SimResult = {
    var seqs = BpeSim.toSeqs(words)
    val trace = List.newBuilder[(Int, String, String, Long, Double)]
    val rounds = List.newBuilder[List[Pair]]
    var rank = 1
    var clean = true
    var continue = rank <= n
    while (continue) {
      val remaining = n - rank + 1
      val cap = math.min(m, remaining)
      val top = ranked(seqs).take(math.max(cap * 4, 8))
      if (top.isEmpty) continue = false
      else {
        val selected =
          scala.collection.mutable.ArrayBuffer.empty[(Pair, Long, Double)]
        var i = 0
        while (i < top.length && selected.size < cap) {
          val cand = top(i)
          if (selected.forall(s => !WordPiece.conflicts(s._1, cand._1)))
            selected += cand
          i += 1
        }
        var replay = seqs
        selected.foreach { case (p, _, _) =>
          if (ranked(replay).headOption.map(_._1) != Some(p)) clean = false
          replay = BpeSim.applyAll(replay, p)
        }
        selected.foreach { case ((l, r), c, s) =>
          trace += ((rank, l, r, c, s)); rank += 1
        }
        rounds += selected.map(_._1).toList
        seqs = selected.foldLeft(seqs) { case (s, (p, _, _)) =>
          BpeSim.applyAll(s, p) }
        continue = rank <= n
      }
    }
    SimResult(trace.result(), clean, rounds.result())
  }
}

/** Pure-simulation invariants — cheap, so hundreds of corpora. */
object WordPieceBatchSimProperties extends Properties("WordPieceBatchedSim") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(300)

  private val word: Gen[String] = for {
    len <- Gen.choose(1, 5)
    cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c', 'd', 'e', 'f'))
  } yield cs.mkString

  private val corpus: Gen[Map[String, Int]] = for {
    n <- Gen.choose(1, 6)
    ws <- Gen.listOfN(n, word)
    fs <- Gen.listOfN(n, Gen.choose(1, 5))
  } yield ws.zip(fs).toMap

  property("batched == sequential whenever every round is clean") =
    forAll(corpus, Gen.choose(1, 6), Gen.choose(1, 3)) { (words, n, m) =>
      val res = WpSim.batched(words, n, m)
      val st = WpSim.sequential(words, n)
      Prop.classify(res.clean, "clean", "interleaved") {
        if (res.clean) res.trace == st
        else res.trace.headOption == st.headOption
      }
    }

  property("m=1 reproduces sequential unconditionally") =
    forAll(corpus, Gen.choose(1, 6)) { (words, n) =>
      WpSim.batched(words, n, 1).trace == WpSim.sequential(words, n)
    }

  property("batch members are pairwise non-conflicting (WordPiece predicate) with contiguous ranks") =
    forAll(corpus, Gen.choose(2, 6), Gen.choose(2, 3)) { (words, n, m) =>
      val res = WpSim.batched(words, n, m)
      val ranksOk = res.trace.map(_._1) == (1 to res.trace.size).toList
      val roundsOk = res.rounds.forall { r =>
        r.size <= m && r.combinations(2).forall {
          case Seq(a, b) => !WordPiece.conflicts(a, b)
          case _ => true
        }
      }
      ranksOk && roundsOk
    }

  property("WordPiece conflicts is stronger than BPE's: shared operand symbols interfere") =
    forAll(corpus, Gen.choose(2, 6)) { (words, n) =>
      // every BPE conflict is a WordPiece conflict; and the cases BPE's
      // predicate ALLOWS but the likelihood denominator cannot — a
      // shared left operand (a,b)/(a,c) or right operand (a,b)/(c,b) —
      // interfere here, because applying one changes the shared
      // symbol's count and so the other's score
      val pairs = WpSim.sequential(words, n).map(t => (t._2, t._3))
      pairs.combinations(2).forall {
        case Seq(a, b) =>
          !BpeTrain.conflicts(a, b) || WordPiece.conflicts(a, b)
        case _ => true
      } && WordPiece.conflicts(("a", "b"), ("a", "c")) &&
        WordPiece.conflicts(("a", "b"), ("c", "b"))
    }
}

/** Spark-bridging properties: the distributed implementation matches
  * the driver-side reference twin bit-for-bit — INCLUDING the
  * likelihood score doubles (same IEEE operation order). Case counts
  * kept small — each case runs real Spark merge rounds. */
object WordPieceBatchProperties extends Properties("WordPieceBatched") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val word: Gen[String] = for {
    len <- Gen.choose(1, 4)
    cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c', 'd'))
  } yield cs.mkString

  private val corpus: Gen[Map[String, Int]] = for {
    n <- Gen.choose(1, 5)
    ws <- Gen.listOfN(n, word)
    fs <- Gen.listOfN(n, Gen.choose(1, 4))
  } yield ws.zip(fs).toMap

  private def docsOf(words: Map[String, Int]) =
    Seq((1L, words.toList.flatMap { case (w, f) => List.fill(f)(w) }
      .mkString(" "))).toDF("doc_id", "text")

  private def trace(ms: Seq[WordPiece.Merge]): WpSim.Trace =
    ms.map(m => (m.rank, m.left, m.right, m.pairFreq, m.score)).toList

  property("Spark learnBatched == driver-side reference batched") =
    forAll(corpus, Gen.choose(2, 4), Gen.choose(2, 3)) { (words, n, m) =>
      trace(WordPiece.learnBatched(docsOf(words), n, m)) ==
        WpSim.batched(words, n, m).trace
    }

  property("Spark learnBatched(batchSize=1) == Spark learn") =
    forAll(corpus, Gen.choose(1, 4)) { (words, n) =>
      trace(WordPiece.learnBatched(docsOf(words), n, 1)) ==
        trace(WordPiece.learn(docsOf(words), n))
    }
}
