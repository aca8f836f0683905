package graft.extensions

import graft.{SparkSpec, Tables}

/** Pins the equivalence [[Dedup.bandBucketsRowLocal]] ≡
  * [[Dedup.bandBuckets]]∘[[Dedup.shingles]] — the contract that lets the
  * streaming path band each micro-batch with a stateless narrow
  * projection while the batch-built index used the exploded
  * collect_set formulation. The two differ only in HOW the per-doc
  * shingle set is assembled (array_distinct row-locally vs
  * explode+collect_set); array_min is order-insensitive, so the
  * signatures — and hence every band key — must match exactly. */
class BandBucketsParitySpec extends SparkSpec {
  import spark.implicits._

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.get(2))).toSet

  private lazy val docs =
    Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")

  test("row-local banding equals exploded banding on the harness corpus (md5)") {
    val exploded = Dedup.bandBuckets(Dedup.shingles(docs, share = false))
    val rowLocal = Dedup.bandBucketsRowLocal(docs)
    val e = asSet(exploded)
    assert(e.nonEmpty)
    assert(asSet(rowLocal) == e)
  }

  test("row-local banding equals exploded banding under fastHash (xxhash64)") {
    val exploded = Dedup.bandBuckets(
      Dedup.shingles(docs, share = false), fastHash = true)
    val rowLocal = Dedup.bandBucketsRowLocal(docs, fastHash = true)
    assert(asSet(rowLocal) == asSet(exploded))
  }

  test("short and null docs drop identically from both paths") {
    val edge = Seq(
      (1L, "one two"),            // < 3 tokens: no shingles
      (2L, null.asInstanceOf[String]),
      (3L, ""),
      (4L, "alpha beta gamma delta")) // the only banded doc
      .toDF("doc_id", "text")
    val exploded = Dedup.bandBuckets(Dedup.shingles(edge, share = false))
    val rowLocal = Dedup.bandBucketsRowLocal(edge)
    assert(asSet(rowLocal) == asSet(exploded))
    assert(rowLocal.select("doc_id").distinct().collect().map(_.getLong(0)).toSet == Set(4L))
  }

  test("row-local plan is a stateless narrow projection: no Exchange, no Aggregate") {
    val plan = Dedup.bandBucketsRowLocal(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
    assert(!plan.toLowerCase.contains("aggregate"), s"expected aggregation-free plan:\n$plan")
  }
}
