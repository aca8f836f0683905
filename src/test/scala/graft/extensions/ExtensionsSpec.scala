package graft.extensions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog"), // near dup
    (4L, "completely different text about spark engines here"),
    (5L, "")).toDF("doc_id", "text")

  test("exact: dup group keeps min id, counts members") {
    val m = Dedup.exact(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == 2L)       // docs 1+2 in one group keyed by keeper 1
    assert(!m.contains(2L))
    assert(m(3L) == 1L)
  }

  test("minhash LSH finds the identical pair, not unrelated docs") {
    val pairs = Dedup.minHashLsh(docs).as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("lshProbe: batch-vs-index candidates equal the cross-side subset of full LSH") {
    val corpus = docs.filter($"doc_id" =!= 2L)
    val batch = docs.filter($"doc_id" === 2L)
    val probed = Dedup.lshProbe(
      Dedup.bandBuckets(Dedup.shingles(corpus, share = false)), batch)
      .as[(Long, Long)].collect().toSet
    val full = Dedup.minHashLsh(docs, share = false).as[(Long, Long)].collect().toSet
    val crossSide = full.collect {
      case (a, 2L) => (a, 2L)
      case (2L, b) => (b, 2L)
    }
    assert(probed == crossSide)
    assert(probed.contains((1L, 2L))) // the identical pair must surface
  }

  test("simhash: identical docs share fingerprint; unrelated differ") {
    val m = Dedup.simHash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L))
    assert(m(1L) != m(4L))
  }

  test("ngram jaccard: identical pair scores 1.0; near pair in (0,1)") {
    val m = Dedup.ngramJaccard(docs, 0.1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(m((1L, 2L)) == 1.0)
    val near = m((1L, 3L))
    assert(near > 0.1 && near < 1.0)
    assert(!m.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1f, 0f, 0f), 0),
    (1L, Array(1f, 0f, 0f), 0),     // identical to query
    (2L, Array(0.9f, 0.1f, 0f), 0), // close
    (3L, Array(0f, 1f, 0f), 0),     // orthogonal
    (4L, Array(1f, 0f, 0f), 1)      // identical but other cell
  ).toDF("vec_id", "embedding", "label")

  test("brute force: identical vector ranks first with cos 1.0; query excluded") {
    val top = Similarity.bruteForceTopK(vecs, 0L, 3)
      .as[(Long, Double)].collect().toSeq
    assert(top.head == ((1L, 1.0)))
    assert(top.map(_._1).contains(4L))
    assert(!top.map(_._1).contains(0L))
    assert(top.map(_._1).indexOf(3L) == -1 || top.last._2 < 0.2)
  }

  test("quantized top-k: identical vectors still score 1.0; ranking preserved") {
    val top = Similarity.quantizedTopK(vecs, 0L, 4)
      .as[(Long, Double)].collect().toSeq
    // int8 quantization is exact for these axis-aligned vectors except 2,
    // whose rounded direction stays closest-but-not-equal
    assert(top.head._1 == 1L && top.head._2 == 1.0)
    assert(top.map(_._1).take(3).toSet == Set(1L, 4L, 2L))
    val floatTop = Similarity.bruteForceTopK(vecs, 0L, 4)
      .as[(Long, Double)].collect().toSeq
    assert(top.map(_._1) == floatTop.map(_._1)) // same ranking on this fixture
  }

  test("ivf restricts to the query's cell") {
    val ids = Similarity.ivfTopK(vecs, 0L, 10).as[(Long, Double)].collect().map(_._1)
    assert(!ids.contains(4L)) // other label, even though identical
    assert(ids.toSet == Set(1L, 2L, 3L))
  }

  test("blocked pairs: within-cell only, ordered by cosine desc") {
    val pairs = Similarity.blockedCosinePairs(vecs, 10)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs.head._3 == 1.0)
    assert(pairs.forall { case (a, b, _) => Set(a, b).subsetOf(Set(0L, 1L, 2L, 3L)) })
  }
}

class IvfSearchSpec extends SparkSpec {
  import spark.implicits._

  /** Well-separated synthetic clusters: cell c points near axis c. */
  private lazy val clustered = {
    val rnd = new scala.util.Random(1)
    (0 until 300).map { i =>
      val cell = i % 3
      val base = Array.fill(8)(0f)
      base(cell) = 1f
      val noisy = base.map(v => v + (rnd.nextFloat() - 0.5f) * 0.2f)
      (i.toLong, noisy, cell)
    }.toDF("vec_id", "embedding", "label")
  }

  private lazy val cents = Seq(
    (0, Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
    (1, Array(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f)),
    (2, Array(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f))).toDF("cell_id", "centroid")

  test("ivfSearch with nprobe=1 matches brute force on separated clusters") {
    val brute = Similarity.bruteForceTopK(clustered, 0L, 10)
      .as[(Long, Double)].collect().map(_._1).toSeq
    val ivf = Similarity.ivfSearch(clustered, cents, 0L, 10, nprobe = 1)
      .as[(Long, Double)].collect().map(_._1).toSeq
    assert(ivf == brute) // query's cluster holds all true neighbors
  }

  test("KMeans.fit recovers separated clusters; fitted centroids drive ivfSearch") {
    val cents = KMeans.fit(clustered, k = 3, iters = 3)
    assert(cents.count() == 3)
    // purity: every vector's fitted cell maps 1:1 to its true label
    val purity = KMeans.assign(clustered, cents)
      .join(clustered.select($"vec_id", $"label"), "vec_id")
      .groupBy("cell_id", "label").count()
      .groupBy("cell_id").count() // distinct labels per fitted cell
      .select(max("count")).as[Long].head()
    assert(purity == 1L)

    val brute = Similarity.bruteForceTopK(clustered, 0L, 10)
      .as[(Long, Double)].collect().map(_._1).toSeq
    val ivf = Similarity.ivfSearch(clustered, cents, 0L, 10, nprobe = 1)
      .as[(Long, Double)].collect().map(_._1).toSeq
    assert(ivf == brute)
  }

  test("nprobe widens the candidate set monotonically") {
    def hits(nprobe: Int) =
      Similarity.ivfSearch(clustered, cents, 0L, 1000, nprobe)
        .count()
    assert(hits(1) < hits(2) && hits(2) < hits(3))
    assert(hits(3) == 299) // all cells probed = full scan minus query
  }
}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the the the data table", "en", "s", 22L),
    (2L, "query row query row query", "en", "s", 25L),
    (3L, "zzz yyy xxx", "en", "s", 11L)).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("languageId: marker argmax with 'und' fallback") {
    val m = TextAnalysis.languageId(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) == "en")  // 'the'×3 beats 'data'+'table' (de×2)
    assert(m(2L) == "es")  // query+row are es markers
    assert(m(3L) == "und")
  }

  test("qualityScore: hand-checked ratios") {
    val r = TextAnalysis.qualityScore(docs).filter($"doc_id" === 1).head()
    assert(r.getAs[Long]("n_tok") == 5L)
    assert(r.getAs[Double]("stop_ratio") == 0.6)
    assert(r.getAs[Double]("avg_tok_len") == 3.6) // (3+3+3+4+5)/5
  }

  test("tokenCounts: regex tokenizer splits punctuation-free text like whitespace") {
    val r = TextAnalysis.tokenCounts(docs).filter($"doc_id" === 3).head()
    assert(r.getAs[Long]("ws_tokens") == 3L)
    assert(r.getAs[Long]("re_tokens") == 3L)
  }

  test("fingerprint is word-order and duplication insensitive") {
    val two = Seq((1L, "b a c"), (2L, "a b c c"), (3L, "a b d")).toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprint(two).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }
}

class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("decontaminate: only docs sharing a 3-gram with the benchmark are flagged") {
    val train = Seq(
      (1L, "a b c d e"),        // shares "a b c", "b c d", "c d e"
      (2L, "x y z w"),          // nothing shared
      (3L, "q r"),              // too short for a 3-gram
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val bench = Seq((100L, "a b c d e f")).toDF("doc_id", "text")
    val m = TextAnalysis.decontaminate(train, bench).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(m(1L) == ((3L, true)))
    assert(m(2L) == ((0L, false)))
    assert(m(3L) == ((0L, false)))
    assert(m(4L) == ((0L, false)))
  }

  test("repetition: duplicate bigrams and top-token mass, hand-checked") {
    val docs = Seq(
      (1L, "a b a b a"),   // bigrams: ab ba ab ba -> 4 total, 2 distinct
      (2L, "a b c"),       // no repetition
      (3L, "solo")).toDF("doc_id", "text")
    val m = TextAnalysis.repetition(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(m(1L) == ((4L, 0.5, 0.6)))    // top token 'a' = 3/5
    assert(m(2L) == ((2L, 0.0, 0.3333)))
    assert(m(3L) == ((0L, 0.0, 1.0)))
  }

  test("slidingChunks: full coverage, stride overlap, short tail") {
    // 7 tokens, win=3, stride=2 -> starts 0,2,4,6
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6")).toDF("doc_id", "text")
    val rows = Packing.slidingChunks(docs, win = 3, stride = 2)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(rows.toSeq == Seq(
      (0, 0L, 3L, "t0 t1 t2"),
      (1, 2L, 3L, "t2 t3 t4"),
      (2, 4L, 3L, "t4 t5 t6"),
      (3, 6L, 1L, "t6")))
    // every token appears in at least one chunk
    val covered = rows.flatMap(_._4.split(" ")).toSet
    assert(covered == (0 to 6).map(i => s"t$i").toSet)
  }

  test("duplicatedSpans: shared 6-token window flagged in both docs, unique doc clean") {
    val shared = "s1 s2 s3 s4 s5 s6"
    val docs = Seq(
      (1L, s"$shared a1 a2 a3"),     // 4 windows, 1 duplicated
      (2L, s"b1 b2 $shared"),        // 3 windows, 1 duplicated
      (3L, "c1 c2 c3 c4 c5 c6 c7"),  // 2 windows, none duplicated
      (4L, "tiny")).toDF("doc_id", "text")
    val m = TextAnalysis.duplicatedSpans(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(m(1L) == ((4L, 1L, 0.25)))
    assert(m(2L) == ((3L, 1L, 0.3333)))
    assert(m(3L) == ((2L, 0L, 0.0)))
    assert(m(4L) == ((0L, 0L, 0.0)))
  }

  test("stratifiedSample: deterministic, per-stratum rates, absent stratum dropped") {
    val docs = (0L until 400L).map(i =>
      (i, s"text $i", if (i % 2 == 0) "en" else "fr")).toDF("doc_id", "text", "lang")
    val rates = Map("en" -> 0.5)
    val once = TextAnalysis.stratifiedSample(docs, rates).collect()
    val again = TextAnalysis.stratifiedSample(docs, rates).collect()
    assert(once.map(_.getLong(0)).toSet == again.map(_.getLong(0)).toSet) // deterministic
    assert(once.forall(_.getString(1) == "en"))                           // fr has no rate
    val frac = once.length.toDouble / 200                                  // 200 en docs
    assert(frac > 0.35 && frac < 0.65, s"en keep fraction $frac far from 0.5")
    assert(once.forall(_.getLong(2) < 50))                                 // bucket < 100*0.5
  }

  test("qualityCutoff: per-stratum quartile keeps the top three quarters") {
    val docs = (1L to 8L).map(i => (i, s"d$i", "en", i * 10L)) ++
      Seq((9L, "x", "fr", 5L), (10L, "y", "fr", 100L))
    val df = docs.toDF("doc_id", "text", "lang", "n_chars")
    val kept = TextAnalysis.qualityCutoff(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // en metric values 10..80; q25 = 10 + 0.25*70 = 27.5 -> keep 30..80
    assert(kept.keySet.filter(_ <= 8L) == (3L to 8L).toSet)
    assert(kept(3L) == 27.5)
    // fr: values 5,100; q25 = 28.75 -> only doc 10 survives
    assert(kept.keySet.filter(_ > 8L) == Set(10L))
  }

  test("oovRate: tokens outside the top-k vocab are counted") {
    val docs = Seq(
      (1L, "a a a b"),     // corpus TF: a=5, b=2, z=1
      (2L, "a b z"),
      (3L, "a")).toDF("doc_id", "text")
    val m = TextAnalysis.oovRate(docs, vocabSize = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(m(1L) == ((4L, 0L, 0.0)))
    assert(m(2L) == ((3L, 1L, 0.3333)))   // z is OOV
    assert(m(3L) == ((1L, 0L, 0.0)))
  }
}
