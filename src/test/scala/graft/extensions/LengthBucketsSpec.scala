package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Packing.lengthBuckets]] / [[Packing.paddingWaste]] semantics: the
  * distributed within-bucket enumeration (global rank − bucket start)
  * equals the per-bucket ordinal, batches respect the size cap, the
  * padding bill is exact, and bucketing never loses to naive batching
  * on its own objective. */
class LengthBucketsSpec extends SparkSpec {
  import spark.implicits._

  // lengths spread over 3 buckets at width 4: [1,4) [4,8) [8,12)
  private def docs: DataFrame =
    (0L until 90L).map { i =>
      val len = 1 + (i % 11).toInt // 1..11 tokens
      (i, Seq.fill(len)("w").mkString(" "))
    }.toDF("doc_id", "text")

  test("every batch stays within docsPerBatch and one bucket") {
    val b = Packing.lengthBuckets(docs, bucketWidth = 4L, docsPerBatch = 8)
      .collect()
    assert(b.nonEmpty)
    b.foreach(r => assert(r.getAs[Long]("n_docs") <= 8L))
    // only the last batch of a bucket may be short
    val byBucket = b.groupBy(_.getAs[Long]("bucket"))
    byBucket.foreach { case (_, rows) =>
      val short = rows.count(_.getAs[Long]("n_docs") < 8L)
      assert(short <= 1)
    }
  }

  test("doc counts and token sums reconcile with the corpus") {
    val b = Packing.lengthBuckets(docs, bucketWidth = 4L, docsPerBatch = 8)
    val (nd, ts) = b.agg(sum("n_docs"), sum("tok_sum")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).head
    assert(nd == 90L)
    assert(ts == (0L until 90L).map(i => 1L + i % 11).sum)
  }

  test("padding bill is exact: waste = n_docs * max - sum per batch") {
    Packing.lengthBuckets(docs, bucketWidth = 4L, docsPerBatch = 8)
      .collect().foreach { r =>
        assert(r.getAs[Long]("padding_waste") ==
          r.getAs[Long]("n_docs") * r.getAs[Long]("max_tok") -
            r.getAs[Long]("tok_sum"))
      }
  }

  test("bucketed batching never wastes more than naive on the same corpus") {
    val w = Packing.paddingWaste(docs, bucketWidth = 4L, docsPerBatch = 8)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("waste_ppm")).toMap
    assert(w.keySet == Set("bucketed", "naive"))
    assert(w("bucketed") <= w("naive"),
      s"bucketed ${w("bucketed")} ppm vs naive ${w("naive")} ppm")
  }

  test("width 1 buckets (exact-length batching) drive waste to zero") {
    val w = Packing.paddingWaste(docs, bucketWidth = 1L, docsPerBatch = 8)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("waste_ppm")).toMap
    assert(w("bucketed") == 0L,
      "same-length docs padded to their own length waste nothing")
  }
}
