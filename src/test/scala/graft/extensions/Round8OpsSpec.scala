package graft.extensions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-8 plan-shape fixes: the row-local k-means argmin (the de-weaked
  * IVF index build), the sorted run-length entropy fold, the semDedup
  * cell-size guard, and the conditional contamination broadcast. */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val twoCells = Seq(
    (0, Array(1.0f, 0.0f)),
    (1, Array(0.0f, 1.0f))).toDF("cell_id", "centroid")

  test("KMeans.assign is a zero-exchange narrow projection — no shuffle, no join") {
    val emb = (1L to 20L)
      .map(i => (i, Array((i % 3).toFloat, (i % 5).toFloat)))
      .toDF("vec_id", "embedding")
    val p = KMeans.assign(emb, twoCells).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p) // neither shuffle nor broadcast
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p) // the old n×k argmin ranking is gone
  }

  test("KMeans degenerate inputs: empty corpus fits to empty, empty centroids assign nothing") {
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(KMeans.fit(noVecs, k = 3, iters = 2).count() == 0)
    val some = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val noCents = Seq.empty[(Int, Array[Double])].toDF("cell_id", "centroid")
    assert(KMeans.assign(some, noCents).count() == 0)
  }

  test("KMeans.assign picks the nearest cell; ties break to the smallest cell_id") {
    val emb = Seq(
      (1L, Array(0.9f, 0.1f)), // near cell 0
      (2L, Array(0.1f, 0.9f)), // near cell 1
      (3L, Array(0.5f, 0.5f))) // equidistant -> cell 0 (smallest id wins)
      .toDF("vec_id", "embedding")
    val got = KMeans.assign(emb, twoCells)
      .select("vec_id", "cell_id").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 0))
  }

  test("semDedup maxCellSize caps the pair scan: a 10-identical-vector mega-cell rank-chunks into blocks of <= 3") {
    graft.functions.GraftFunctions.register(spark)
    // one cell, 10 identical vectors, cap 3 -> blocks {1,2,3},{4,5,6},
    // {7,8,9},{10}: each block keeps its smallest id -> 6 dropped. The
    // uncapped run would keep only vec 1 (9 dropped) — the delta IS the
    // documented cross-block approximation.
    val emb = (1L to 10L).map(i => (i, 0L, Array(1.0f, 0.0f)))
      .toDF("vec_id", "label", "embedding")
    val capped = Similarity.semDedup(emb, tau = 0.9, maxCellSize = 3)
      .select("n_vecs", "n_dropped").as[(Long, Long)].head()
    assert(capped == ((10L, 6L)))
    val uncapped = Similarity.semDedup(emb, tau = 0.9)
      .select("n_vecs", "n_dropped").as[(Long, Long)].head()
    assert(uncapped == ((10L, 9L)))
    // the survivor list is the summary, materialized: block heads only
    val kept = Similarity.semDedupSurvivors(emb, tau = 0.9, maxCellSize = 3)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 4L, 7L, 10L))
    assert(Similarity.semDedupSurvivors(emb, tau = 0.9)
      .select("vec_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("semDedup under-cap results are unchanged by the guard; no cartesian appears") {
    graft.functions.GraftFunctions.register(spark)
    val emb = (1L to 30L).map(i =>
      (i, i % 3, Array((i % 5).toFloat + 1f, (i % 7).toFloat, 1f)))
      .toDF("vec_id", "label", "embedding")
    val loose = Similarity.semDedup(emb, 0.9).orderBy("label").collect().toSeq
    val tight = Similarity.semDedup(emb, 0.9, maxCellSize = 10)
      .orderBy("label").collect().toSeq
    assert(loose == tight, "every cell is at the cap (10) — identical pairs")
    val p = Similarity.semDedup(emb, 0.9, maxCellSize = 10)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("semDedup composes with fitted k-means cells under an active cap") {
    graft.functions.GraftFunctions.register(spark)
    // fit's deterministic init seeds from the two lowest vec_ids, so ids
    // 1 and 2 anchor the two clusters; each cluster carries an exact dup
    // pair at adjacent ids (same rank chunk at cap 3) plus a filler, so
    // every fitted cell has 4 members and the cap=3 guard genuinely
    // engages (blocks of 3+1 per cell)
    val emb = (Seq(
      (1L, Array(10.0f, 0.0f)), (2L, Array(0.0f, 10.0f)), // seeds A, B
      (3L, Array(10.0f, 0.5f)), (4L, Array(10.0f, 0.5f)), // dup pair, A
      (5L, Array(0.5f, 10.0f)), (6L, Array(0.5f, 10.0f)), // dup pair, B
      (7L, Array(11.0f, 2.0f)), (8L, Array(2.0f, 11.0f)))) // fillers
      .map { case (id, v) => (id, 0L, v) }
      .toDF("vec_id", "label", "embedding")
    val cents = KMeans.fit(emb, k = 2, iters = 5)
    val cells = KMeans.assign(emb, cents)
      .select(col("vec_id"), col("cell_id").cast("long").as("label"),
        col("e").as("embedding"))
    assert(cells.groupBy("label").count().select(max("count"))
      .head().getLong(0) == 4L, "both fitted cells recover their 4 members")
    val out = Similarity.semDedup(cells, tau = 0.9999, maxCellSize = 3)
      .agg(sum("n_vecs"), sum("n_dropped")).head()
    assert(out.getLong(0) == 8L)
    assert(out.getLong(1) == 2L,
      "exactly the planted adjacent-id duplicates drop inside their rank chunks")
  }

  test("containment is asymmetric: a doc quoted whole inside a longer one scores cont=1 on the short side only") {
    // doc 2 = doc 1 plus a tail: every shingle of 1 appears in 2
    // (cont_a = 1.0) but not vice versa; they must be LSH candidates,
    // which exact inclusion of the full shingle set does not guarantee
    // for any tail — this tail is chosen so at least one band's four
    // signature mins are unchanged (deterministic under md5)
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon" // 20 words, 18 shingles
    val docs = Seq(
      (1L, base),
      (2L, base + " phi chi"), // +2 shingles; 18 of its 20 come from doc 1
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val out = Dedup.containment(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(out.contains((1L, 2L)), s"subset pair must surface as a candidate: $out")
    val (contA, contB) = out((1L, 2L))
    assert(contA == 1.0, "every shingle of the short doc is in the long one")
    assert(contB == 0.9, "18 of the long doc's 20 shingles come from the short one")
  }

  test("leakageSafeSplit keeps near-dup components whole: the dup pair shares a fold, folds stay in range") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // exact dup of 1
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val out = Dedup.leakageSafeSplit(docs, nFolds = 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.size == 3)
    assert(out(1L) == out(2L), "dup pair: same component, same fold")
    assert(out(1L)._1 == 1L, "component representative is the min id")
    assert(out.values.forall { case (_, f) => f >= 0 && f < 5 })
  }

  test("ivfSearch index build is row-local: no Window (the old n×k argmax ranking) in the plan") {
    graft.functions.GraftFunctions.register(spark)
    val emb = (0L to 29L)
      .map(i => (i, 0L, Array((i % 3).toFloat + 1f, (i % 5).toFloat, 1f)))
      .toDF("vec_id", "label", "embedding")
    val cents = Seq(
      (0, Array(1.0, 0.0, 0.0)),
      (1, Array(0.0, 1.0, 0.0))).toDF("cell_id", "centroid")
    val q = Similarity.ivfSearch(emb, cents, queryId = 0L, k = 5, nprobe = 1)
    assert(q.count() <= 5)
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
  }

  test("contaminationReport: bounded gram dims broadcast, oversized ones degrade to a shuffle join — same answer") {
    val corpus = Seq(
      (1L, "a b c d e"), // shares the 4-gram "a b c d" with bench 10
      (2L, "x y z w v")).toDF("doc_id", "text")
    val bench = Seq(
      (10L, "a b c d q"),
      (20L, "n o p q r")).toDF("doc_id", "text")
    def collectReport(limit: Long) =
      TextAnalysis.contaminationReport(corpus, bench, n = 4,
        broadcastGramLimit = limit)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val expected = Map(10L -> ((1L, 1L)), 20L -> ((0L, 0L)))
    assert(collectReport(Long.MaxValue) == expected)
    assert(collectReport(0L) == expected, "the shuffle path is the same report")
    // pin both plan shapes with auto-broadcast off, so the hint (and
    // only the hint) decides: hinted -> BroadcastHashJoin survives;
    // unhinted -> every join takes the sort-merge path
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val hinted = TextAnalysis.contaminationReport(corpus, bench, 4)
        .queryExecution.executedPlan.toString
      assert(hinted.contains("BroadcastHashJoin"), hinted)
      val plain = TextAnalysis.contaminationReport(corpus, bench, 4,
        broadcastGramLimit = 0L).queryExecution.executedPlan.toString
      assert(!plain.contains("BroadcastHashJoin"), plain)
      assert(plain.contains("SortMergeJoin"), plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("KMeans.assign matches the windowed-argmin reference shape exactly") {
    // the old crossJoin + row_number plan, kept here as the semantic
    // oracle: the row-local fold must reproduce its assignment for every
    // vector, including distance ties
    import org.apache.spark.sql.expressions.Window
    val emb = (1L to 60L)
      .map(i => (i, Array((i % 7).toFloat, (i % 11).toFloat, (i % 3).toFloat)))
      .toDF("vec_id", "embedding")
    val cents = KMeans.fit(emb, k = 4, iters = 2)
    def dist2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
    val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("cell_id"))
    val reference = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .crossJoin(broadcast(cents.select(col("cell_id"),
        col("centroid").cast("array<double>").as("ce"))))
      .withColumn("d2", dist2(col("e"), col("ce")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("vec_id", "cell_id").as[(Long, Int)].collect().toMap
    val rowLocal = KMeans.assign(emb, cents)
      .select("vec_id", "cell_id").as[(Long, Int)].collect().toMap
    assert(rowLocal == reference)
  }
}

/** The semDedup cell-size guard's quadratic bound, as an invariant: for
  * ANY cell-size profile, rank chunking never emits a block over
  * maxCellSize, so no pair task ever sees more than
  * maxCellSize·(maxCellSize-1)/2 < maxCellSize² candidates — a HARD
  * bound, unlike hash sub-blocking's expected-size bound. Case counts
  * kept small — each case runs a real Spark job. */
object SemDedupBlockProperties
    extends org.scalacheck.Properties("SemDedupBlocks") {
  import org.scalacheck.{Gen, Prop}
  import org.scalacheck.Test.Parameters

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = graft.SparkSpec.session
  import spark.implicits._

  private val profile: Gen[List[Int]] = for {
    nCells <- Gen.choose(1, 4)
    sizes <- Gen.listOfN(nCells, Gen.choose(1, 12))
  } yield sizes

  property("no rank-chunked block ever exceeds maxCellSize") =
    Prop.forAll(profile, Gen.choose(2, 5)) { (sizes, cap) =>
      val rows = sizes.zipWithIndex.flatMap { case (sz, cell) =>
        (1 to sz).map(i => (cell.toLong * 1000 + i, cell.toLong))
      }
      val e = rows.toDF("vec_id", "label")
      val maxBlock = Similarity.cellBlocks(e, cap)
        .groupBy("label", "blk").count()
        .agg(org.apache.spark.sql.functions.max("count"))
        .head().getLong(0)
      maxBlock <= cap.toLong
    }

  property("blocks partition each cell exactly; under-cap cells stay whole") =
    Prop.forAll(profile, Gen.choose(2, 5)) { (sizes, cap) =>
      val rows = sizes.zipWithIndex.flatMap { case (sz, cell) =>
        (1 to sz).map(i => (cell.toLong * 1000 + i, cell.toLong))
      }
      val e = rows.toDF("vec_id", "label")
      val perCell = Similarity.cellBlocks(e, cap)
        .groupBy("label")
        .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.countDistinct("blk").as("nblk"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      perCell.forall { case (cell, n, nblk) =>
        nblk == (n + cap - 1) / cap // ceil(n/cap) blocks, no row lost
      } && perCell.map(_._2).sum == rows.size.toLong
    }
}
