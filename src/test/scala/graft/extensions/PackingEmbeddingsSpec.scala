package graft.extensions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingEmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  test("packChunks: spans are contiguous per shard and chunks cover them") {
    val docs = Seq(
      (1L, "a", "t1 t2 t3"), (2L, "a", "t1 t2 t3 t4 t5"), (3L, "a", "t1"),
      (4L, "b", "t1 t2")).toDF("doc_id", "lang", "text")
    val out = Packing.packChunks(docs, budget = 4).orderBy("shard", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    // (doc, shard, n_tok, end, start, chunk_first, chunk_last)
    assert(out.toSeq == Seq(
      (1L, "a", 3L, 3L, 0L, 0L, 0L),
      (2L, "a", 5L, 8L, 3L, 0L, 1L),   // straddles the 4-token boundary
      (3L, "a", 1L, 9L, 8L, 2L, 2L),
      (4L, "b", 2L, 2L, 0L, 0L, 0L))) // shard b restarts at 0
  }

  test("l2Normalize yields unit vectors; zero vector passes as zeros") {
    val e = Seq((1L, Seq(3.0f, 4.0f)), (2L, Seq(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val rows = Embeddings.l2Normalize(e).orderBy("vec_id").collect()
    assert(rows(0).getSeq[Double](1) == Seq(0.6, 0.8))
    assert(rows(1).getSeq[Double](1) == Seq(0.0, 0.0))
  }

  test("quantizeInt8: values bounded by ±127, max-abs maps to ±127") {
    val e = Seq((1L, Seq(0.5f, -1.0f, 0.25f)), (2L, Seq(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val rows = Embeddings.quantizeInt8(e).orderBy("vec_id").collect()
    assert(rows(0).getDouble(1) == 1.0) // scale = max abs
    assert(rows(0).getSeq[Int](2) == Seq(64, -127, 32))
    assert(rows(1).getSeq[Int](2) == Seq(0, 0)) // zero vector quantizes to zeros
  }

  test("hyperplaneLsh: identical vectors share a bucket, opposite differ") {
    val e = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f, -1.0f)),
      (2L, Seq(1.0f, 2.0f, 3.0f, -1.0f)),
      (3L, Seq(-1.0f, -2.0f, -3.0f, 1.0f))).toDF("vec_id", "embedding")
    val b = Embeddings.hyperplaneLsh(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(1L) == b(2L))
    assert(b(1L) != b(3L)) // every projection flips sign
  }
}
