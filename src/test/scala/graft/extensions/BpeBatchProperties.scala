package graft.extensions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

import graft.SparkSpec

/** Driver-side reference twins of [[BpeTrain.learn]] /
  * [[BpeTrain.learnBatched]] over a word-frequency map — the same
  * ranked-argmax / conflict-free-prefix / literal left-to-right merge
  * semantics, in plain Scala, so the batched ≡ sequential equivalence
  * can be property-checked over hundreds of corpora without paying a
  * Spark job per merge round. */
private[extensions] object BpeSim {
  type Pair = (String, String)
  type Trace = List[(Int, String, String, Long)]

  def toSeqs(words: Map[String, Int]): Map[Vector[String], Long] =
    words.map { case (w, n) => w.map(_.toString).toVector -> n.toLong }

  def pairCounts(seqs: Map[Vector[String], Long]): Map[Pair, Long] =
    seqs.toList
      .flatMap { case (s, f) => s.zip(s.drop(1)).map(_ -> f) }
      .groupMapReduce(_._1)(_._2)(_ + _)

  /** (count desc, left asc, right asc) — BpeTrain's argmax order. */
  def ranked(counts: Map[Pair, Long]): List[(Pair, Long)] =
    counts.toList.sortBy { case ((l, r), c) => (-c, l, r) }

  /** One literal left-to-right merge pass over a symbol sequence —
    * the vector twin of `replace(seq, " l  r ", " lr ")`. */
  def applyMerge(seq: Vector[String], p: Pair): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < seq.length) {
      if (i + 1 < seq.length && seq(i) == p._1 && seq(i + 1) == p._2) {
        out += (seq(i) + seq(i + 1)); i += 2
      } else { out += seq(i); i += 1 }
    }
    out.result()
  }

  def applyAll(seqs: Map[Vector[String], Long], p: Pair): Map[Vector[String], Long] =
    seqs.toList.map { case (s, f) => applyMerge(s, p) -> f }
      .groupMapReduce(_._1)(_._2)(_ + _)

  def sequential(words: Map[String, Int], n: Int): Trace = {
    var seqs = toSeqs(words)
    var trace = List.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var continue = rank <= n
    while (continue) {
      ranked(pairCounts(seqs)).headOption match {
        case None => continue = false
        case Some(((l, r), c)) =>
          trace += ((rank, l, r, c))
          seqs = applyAll(seqs, (l, r))
          rank += 1
          continue = rank <= n
      }
    }
    trace.result()
  }

  /** Result of a simulated batched run: the merge trace, whether every
    * round was CLEAN (no merge's newly created symbol would have
    * out-ranked a later batch member in a sequential run — the
    * precondition under which batched ≡ sequential is provable), and
    * the per-round batches for invariant checks. */
  final case class SimResult(trace: Trace, clean: Boolean, rounds: List[List[Pair]])

  /** Mirrors learnBatched exactly: same candidate window, same
    * skip-style top-m non-conflicting selection, same one-pass fold
    * application. */
  def batched(words: Map[String, Int], n: Int, m: Int): SimResult = {
    var seqs = toSeqs(words)
    var trace = List.newBuilder[(Int, String, String, Long)]
    var rounds = List.newBuilder[List[Pair]]
    var rank = 1
    var clean = true
    var continue = rank <= n
    while (continue) {
      val remaining = n - rank + 1
      val cap = math.min(m, remaining)
      val top = ranked(pairCounts(seqs)).take(math.max(cap * 4, 8))
      if (top.isEmpty) continue = false
      else {
        val selected = scala.collection.mutable.ArrayBuffer.empty[(Pair, Long)]
        var i = 0
        while (i < top.length && selected.size < cap) {
          val cand = top(i)
          if (selected.forall(s => !BpeTrain.conflicts(s._1, cand._1)))
            selected += cand
          i += 1
        }
        // cleanliness: replay the batch one-at-a-time; each selection
        // must still be the global argmax at its turn
        var replay = seqs
        selected.foreach { case (p, _) =>
          if (ranked(pairCounts(replay)).headOption.map(_._1) != Some(p))
            clean = false
          replay = applyAll(replay, p)
        }
        selected.foreach { case ((l, r), c) =>
          trace += ((rank, l, r, c)); rank += 1
        }
        rounds += selected.map(_._1).toList
        seqs = selected.foldLeft(seqs) { case (s, (p, _)) => applyAll(s, p) }
        continue = rank <= n
      }
    }
    SimResult(trace.result(), clean, rounds.result())
  }
}

/** Pure-simulation invariants — cheap, so hundreds of corpora. */
object BpeBatchSimProperties extends Properties("BpeBatchedSim") {

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
      val res = BpeSim.batched(words, n, m)
      val st = BpeSim.sequential(words, n)
      Prop.classify(res.clean, "clean", "interleaved") {
        if (res.clean) res.trace == st
        // interleaved rounds may diverge past the first pick, but the
        // first pick is the same global argmax in both runs
        else res.trace.headOption == st.headOption
      }
    }

  property("m=1 reproduces sequential unconditionally") =
    forAll(corpus, Gen.choose(1, 6)) { (words, n) =>
      BpeSim.batched(words, n, 1).trace == BpeSim.sequential(words, n)
    }

  property("batch members are pairwise non-conflicting with contiguous ranks") =
    forAll(corpus, Gen.choose(2, 6), Gen.choose(2, 3)) { (words, n, m) =>
      val res = BpeSim.batched(words, n, m)
      val ranksOk = res.trace.map(_._1) == (1 to res.trace.size).toList
      val roundsOk = res.rounds.forall { r =>
        r.size <= m && r.combinations(2).forall {
          case Seq(a, b) => !BpeTrain.conflicts(a, b)
          case _ => true
        }
      }
      ranksOk && roundsOk
    }
}

/** Spark-bridging properties: the distributed implementations match the
  * driver-side reference twins bit-for-bit. Case counts kept small —
  * each case runs real Spark merge rounds. */
object BpeBatchProperties extends Properties("BpeBatched") {

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

  private def trace(ms: Seq[BpeTrain.Merge]): BpeSim.Trace =
    ms.map(m => (m.rank, m.left, m.right, m.pair_freq)).toList

  property("Spark learnBatched == driver-side reference batched") =
    forAll(corpus, Gen.choose(2, 4), Gen.choose(2, 3)) { (words, n, m) =>
      trace(BpeTrain.learnBatched(docsOf(words), n, m)) ==
        BpeSim.batched(words, n, m).trace
    }

  property("Spark learnBatched(batchSize=1) == Spark learn") =
    forAll(corpus, Gen.choose(2, 4)) { (words, n) =>
      val docs = docsOf(words)
      trace(BpeTrain.learnBatched(docs, n, 1)) == trace(BpeTrain.learn(docs, n))
    }
}
