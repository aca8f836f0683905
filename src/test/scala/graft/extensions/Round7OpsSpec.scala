package graft.extensions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed goldens for the round-7 operators: SemDeDup-style
  * embedding dedup, unigram entropy, and mean-IDF novelty. */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  test("semDedup drops exactly the vectors with a smaller-id near-dup in their cell") {
    graft.functions.GraftFunctions.register(spark)
    // cell 1: vec 1 and 2 identical (cos 1.0), vec 3 orthogonal;
    // cell 2: vecs 4, 5 orthogonal — nothing dropped
    val emb = Seq(
      (1L, 1L, Array(1.0f, 0.0f)),
      (2L, 1L, Array(1.0f, 0.0f)),
      (3L, 1L, Array(0.0f, 1.0f)),
      (4L, 2L, Array(1.0f, 0.0f)),
      (5L, 2L, Array(0.0f, 1.0f))).toDF("vec_id", "label", "embedding")
    val out = Similarity.semDedup(emb, tau = 0.9).orderBy("label")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (1L, 3L, 1L, 2L, 0.6667), // vec 2 dropped (near-dup of 1)
      (2L, 2L, 0L, 2L, 1.0)))
  }

  test("semDedup tau sweep: lower tau never keeps more") {
    graft.functions.GraftFunctions.register(spark)
    val emb = (1L to 30L).map(i =>
      (i, i % 3, Array((i % 5).toFloat + 1f, (i % 7).toFloat, 1f)))
      .toDF("vec_id", "label", "embedding")
    def kept(tau: Double) = Similarity.semDedup(emb, tau)
      .agg(sum("n_kept")).head().getLong(0)
    assert(kept(0.5) <= kept(0.9) && kept(0.9) <= kept(1.1))
  }

  test("tokenEntropy: uniform two-token doc scores ln 2; degenerate docs score 0") {
    val docs = Seq(
      (1L, "a a b b"), // uniform over 2 -> ln 2
      (2L, "a a a a"), // single symbol -> 0
      (3L, ""), // empty -> 0 with zero counts
      (4L, "a b c d")) // uniform over 4 -> ln 4
      .toDF("doc_id", "text")
    val m = TextAnalysis.tokenEntropy(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(m(1L) == ((4L, 2L, 0.6931)))
    assert(m(2L) == ((4L, 1L, 0.0)))
    assert(m(3L) == ((0L, 0L, 0.0)))
    assert(m(4L) == ((4L, 4L, 1.3863)))
  }

  test("knnClassify: majority label wins with deterministic tie-breaks") {
    graft.functions.GraftFunctions.register(spark)
    // query 0 points along x; two label-1 neighbors nearly parallel,
    // two label-2 neighbors orthogonal -> k=3 votes 2:1 for label 1
    val emb = Seq(
      (0L, 1L, Array(1.0f, 0.0f)),
      (1L, 1L, Array(0.9f, 0.1f)),
      (2L, 1L, Array(0.95f, 0.05f)),
      (3L, 2L, Array(0.0f, 1.0f)),
      (4L, 2L, Array(0.0f, 0.9f))).toDF("vec_id", "label", "embedding")
    val r = Similarity.knnClassify(emb, Seq(0L), k = 3).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((0L, 1L, 2L, 1L, 1L)))
  }

  test("contaminationReport: leaked benchmark docs counted, clean docs kept at zero") {
    val corpus = Seq(
      (1L, "a b c d e"), // shares the 4-gram "a b c d" with bench 10
      (2L, "x y z w v")).toDF("doc_id", "text")
    val bench = Seq(
      (10L, "a b c d q"),
      (20L, "n o p q r")).toDF("doc_id", "text")
    val out = TextAnalysis.contaminationReport(corpus, bench, n = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(10L -> ((1L, 1L)), 20L -> ((0L, 0L))))
  }

  test("cc cluster-size histogram counts the dup pair and the singleton") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // exact dup of 1
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val hist = ConnectedComponents
      .label(docs.select("doc_id"), Dedup.minHashLsh(docs, share = false))
      .groupBy("comp").agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size")).agg(count(lit(1)).as("n_clusters"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist == Map(1L -> 1L, 2L -> 1L))
  }

  test("mixtureSample: over-represented source downsampled to weight/share, under-represented passes whole") {
    // big: 90 docs x 100 chars (share 0.9, sqrt-weight 0.75 -> rate 0.8333)
    // small: 10 docs x 100 chars (share 0.1, weight 0.25 -> rate caps at 1)
    val docs = ((1L to 90L).map(i => (i, "big", 100L)) ++
      (91L to 100L).map(i => (i, "small", 100L)))
      .toDF("doc_id", "source", "n_chars")
    val out = TextAnalysis.mixtureSample(docs).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(out("big")._1 == 0.8333)
    assert(out("small") == ((1.0, 10L)), "rate 1 admits every doc")
    val bigAdmitted = out("big")._2
    assert(bigAdmitted > 0 && bigAdmitted < 90,
      s"the 0.8333 rate must genuinely drop some of the 90 docs, admitted $bigAdmitted")
  }

  test("semDedup composes with k-means cells — the 100 TB cell-assignment path") {
    graft.functions.GraftFunctions.register(spark)
    // two tight clusters far apart; one exact duplicate planted in each.
    // The scaladoc's scale story: at 100 TB the cell is the k-means
    // assignment, not a given label — so run the composition here:
    // fit -> assign -> semDedup over the ASSIGNED cells.
    val emb = Seq(
      (1L, Array(10.0f, 0.0f)), (2L, Array(10.0f, 0.0f)), // dup pair, cluster A
      (3L, Array(11.0f, 1.0f)),
      (4L, Array(0.0f, 10.0f)), (5L, Array(0.0f, 10.0f)), // dup pair, cluster B
      (6L, Array(1.0f, 11.0f))).map { case (id, v) => (id, 0L, v) }
      .toDF("vec_id", "label", "embedding")
    val cents = KMeans.fit(emb, k = 2, iters = 5)
    val cells = KMeans.assign(emb, cents)
      .select(col("vec_id"), col("cell_id").cast("long").as("label"),
        col("e").as("embedding"))
    val out = Similarity.semDedup(cells, tau = 0.9999)
      .agg(sum("n_vecs"), sum("n_dropped")).head()
    assert(out.getLong(0) == 6L)
    assert(out.getLong(1) == 2L, "exactly the two planted duplicates drop")
  }

  test("degenerate inputs: empty frames and single-source corpora stay well-formed") {
    graft.functions.GraftFunctions.register(spark)
    val noVecs = Seq.empty[(Long, Long, Array[Float])]
      .toDF("vec_id", "label", "embedding")
    assert(Similarity.semDedup(noVecs, 0.5).count() == 0)
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.tokenEntropy(noDocs).count() == 0)
    assert(TextAnalysis.docNovelty(noDocs).count() == 0)
    assert(TextAnalysis.contaminationReport(noDocs, noDocs, 4).count() == 0)
    // single source: share = weight = 1 -> rate 1, everything admitted
    val one = Seq((1L, "only", 10L), (2L, "only", 20L))
      .toDF("doc_id", "source", "n_chars")
    val m = TextAnalysis.mixtureSample(one).collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(m.toSeq == Seq(("only", 1.0, 2L)))
  }

  test("docNovelty: shared tokens score 0 IDF, unique tokens ln N") {
    val docs = Seq((1L, "x y"), (2L, "x z")).toDF("doc_id", "text")
    // df: x=2 -> idf 0; y, z=1 -> idf ln 2 = 0.693147
    val m = TextAnalysis.docNovelty(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(m(1L) == ((2L, 0.3466)))
    assert(m(2L) == ((2L, 0.3466)))
    // all-boilerplate doc scores exactly 0
    val m2 = TextAnalysis.docNovelty(
      Seq((1L, "x"), (2L, "x"), (3L, "x")).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(m2 == Map(1L -> 0.0, 2L -> 0.0, 3L -> 0.0))
  }
}
