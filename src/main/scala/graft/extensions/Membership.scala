package graft.extensions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-prefiltered cross-corpus membership — the decontamination /
  * "is this already in the reference set?" probe at 100 TB shape.
  *
  * A plain semi-join shuffles EVERY row of the big side on the key; when
  * 99% of rows cannot match (the common case — a benchmark or reference
  * corpus is tiny next to a crawl), that shuffle is almost entirely
  * wasted I/O. Instead: build a Bloom filter over the reference keys
  * once (a treeAggregate producing a few MB of bitset), broadcast it,
  * and drop non-members AT THE SCAN with a codegen-friendly native
  * expression before the exact semi-join removes the false positives.
  * Only the ~fpp fraction of non-matching rows (plus true matches) ever
  * reach the exchange. Same shape as Spark's own AQE runtime bloom
  * filter (InjectRuntimeFilter), made explicit and persistable: a
  * production pipeline builds the filter when the reference set changes
  * and reuses the bytes across every batch.
  *
  * Sizing: a 1% fpp filter costs ~1.2 bytes/item — fine up to ~10⁸
  * reference keys on one driver; beyond that, partition the reference
  * set and apply per-partition filters, or fall back to the exact
  * semi-join which is what the post-filter join already is. */
object Membership {

  /** Rows of `big` whose `keyCol` appears in `ref`'s `keyCol` —
    * exactly the left-semi join result; the Bloom filter only prunes
    * the shuffle. */
  def bloomSemiJoin(
      big: DataFrame,
      ref: DataFrame,
      keyCol: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val bf = ref.select(xxhash64(col(keyCol)).as("k"))
      .stat.bloomFilter("k", expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    graft.functions.GraftFunctions.register(big.sparkSession)
    big
      .filter(call_function("bloom_might_contain",
        lit(bos.toByteArray), xxhash64(col(keyCol))))
      .join(ref.select(col(keyCol)).distinct(), Seq(keyCol), "left_semi")
  }
}
