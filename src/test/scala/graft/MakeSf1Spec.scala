package graft

import org.apache.spark.sql.functions._

/** Pins the invariants the sf1 scaling fixture's measured slopes rest
  * on ([[MakeSf1]], PLANS.md round-16 table). If the construction
  * drifted — a replica reusing an id range, the sign pattern varying
  * per vector, labels colliding across replicas — the scaling numbers
  * would silently measure a different workload (cross-replica near-dup
  * interaction squares pair counts; a per-vector sign would destroy
  * within-replica neighbor structure). */
class MakeSf1Spec extends SparkSpec {
  import spark.implicits._

  private lazy val dst = {
    val d = java.nio.file.Files.createTempDirectory("graft-sf1").toString
    MakeSf1.synthesize(spark, "/root/testdata/sf0.001", d, reps = 3, parts = 4)
    d
  }

  test("ids and labels replicate under disjoint strides, rows exactly reps×") {
    val src = Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val out = spark.read.parquet(s"$dst/embeddings.parquet")
    assert(out.count() == 3 * src.count())
    // every output id decomposes as (replica stride + source id); no overlap
    val perReplica = out
      .groupBy((col("vec_id") / MakeSf1.vecStride).cast("long").as("replica"))
      .agg(countDistinct("vec_id").as("n"), countDistinct("label").as("nl"))
      .collect()
    assert(perReplica.map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L, 2L))
    val srcIds = src.agg(countDistinct("vec_id"), countDistinct("label"))
      .as[(Long, Long)].head()
    perReplica.foreach { r =>
      assert((r.getLong(1), r.getLong(2)) == srcIds, r.toString)
    }
    // docs and orders stride-disjoint too
    val docs = spark.read.parquet(s"$dst/documents.parquet")
    assert(docs.count() ==
      3 * Tables.table(spark, "/root/testdata/sf0.001", "documents").count())
    assert(docs.select((col("doc_id") / MakeSf1.docStride).cast("long"))
      .distinct().count() == 3)
  }

  test("per-replica sign flip preserves within-replica dot products exactly") {
    val out = spark.read.parquet(s"$dst/embeddings.parquet")
    // FULL pairwise Gram check per replica against replica 0 (the
    // verbatim copy): every pair (a, b) in replica 0 must dot-product
    // BITWISE equal to its strided twin (a', b') — (s⊙a)·(s⊙b) = a·b
    // holds in exact float arithmetic because s ∈ {−1, +1} and the
    // positional fold order matches. Quadratic pair join is fine here:
    // sf0.001 has tens of vectors, and the whole point is exhaustive
    // coverage of the within-replica geometry.
    def grams(i: Int) = {
      val rep = out
        .filter(col("vec_id") >= i * MakeSf1.vecStride &&
          col("vec_id") < (i + 1) * MakeSf1.vecStride)
        .select((col("vec_id") - i * MakeSf1.vecStride).as("k"),
          col("embedding").as("e"))
      rep.as("x").join(rep.as("y"), col("x.k") <= col("y.k"))
        .select(col("x.k").as("ka"), col("y.k").as("kb"), expr(
          """aggregate(zip_with(x.e, y.e, (x, y) -> x * y),
                       0.0F, (s, v) -> s + v)""").as("dot"))
    }
    val base = grams(0)
    (1 to 2).foreach { i =>
      val diff = base.join(grams(i).withColumnRenamed("dot", "dot_i"),
        Seq("ka", "kb"))
        .filter(!(col("dot") <=> col("dot_i"))).count()
      assert(diff == 0L, s"replica $i gram diverged on $diff pairs")
    }
  }

  test("a source whose keys exceed the stride fails loudly, not subtly") {
    // r16 ADVICE: synthesizing FROM an already-synthesized fixture
    // (doc_id up to reps×stride) would overlap replica id ranges and
    // merge cells — the scaling fixture would silently measure a
    // different workload. The guard must reject such a source.
    val e = intercept[IllegalArgumentException] {
      MakeSf1.synthesize(spark, dst,
        java.nio.file.Files.createTempDirectory("graft-sf1-bad").toString,
        reps = 2, parts = 2)
    }
    assert(e.getMessage.contains("stride"), e.getMessage)
  }

  test("an EMPTY source table fails with the fixture diagnostic, not an NPE") {
    // r17 ADVICE: max(key) over an empty table is NULL; getLong(0) threw
    // an opaque NullPointerException where the guard exists to be loud.
    val empty = java.nio.file.Files.createTempDirectory("graft-sf1-empty")
    Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .limit(0).write.parquet(s"$empty/documents.parquet")
    val e = intercept[IllegalArgumentException] {
      MakeSf1.synthesize(spark, empty.toString,
        java.nio.file.Files.createTempDirectory("graft-sf1-empty-out").toString,
        reps = 2, parts = 2)
    }
    assert(e.getMessage.contains("empty"), e.getMessage)
  }

  test("cross-replica vectors land in disjoint cells (no pair interaction)") {
    val out = spark.read.parquet(s"$dst/embeddings.parquet")
    val mixedCells = out
      .groupBy("label")
      .agg(countDistinct((col("vec_id") / MakeSf1.vecStride).cast("long"))
        .as("n_replicas"))
      .filter(col("n_replicas") > 1)
      .count()
    assert(mixedCells == 0L)
  }
}
