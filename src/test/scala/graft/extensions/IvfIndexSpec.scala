package graft.extensions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.plans.Layout

/** The persisted IVF index's two contracts (r18 VERDICT #2): a probe
  * physically reads ONLY the probed cell's files (partition pruning —
  * the delta-log-pruning evidence pattern, via Layout.scannedFiles),
  * and the indexed path returns exactly [[Similarity.ivfTopK]]'s rows
  * (the q_ann_ivf hash gate's local twin). */
class IvfIndexSpec extends SparkSpec {

  private val emb = Tables.table(spark, "/root/testdata/sf0.001", "embeddings")

  test("probe scans exactly the query cell's directory; rows equal inline ivfTopK") {
    val dir = java.nio.file.Files
      .createTempDirectory("ivf-idx").toFile.getAbsolutePath
    Similarity.writeIvfIndex(emb, dir)
    val idx = spark.read.parquet(dir)

    val qlabel = idx.filter(col("vec_id") === 0L)
      .select("label").head().getInt(0)
    val probe = Similarity.ivfTopKIndexed(idx, 0L, 10)

    // pruning evidence: the probe's scan lists ONLY label=<qcell> files
    val probeFiles = Layout.scannedFiles(probe).toSet
    val allFiles = Layout.scannedFiles(idx).toSet
    val cellFiles = allFiles.filter(_.contains(s"label=$qlabel"))
    assert(probeFiles.nonEmpty)
    assert(probeFiles == cellFiles,
      s"probe must read exactly the query cell's files:\n$probeFiles")
    val nCells = idx.select("label").distinct().count()
    assert(nCells > 1, "fixture needs multiple cells for pruning to mean anything")
    assert(probeFiles.size < allFiles.size,
      s"pruned ${probeFiles.size} of ${allFiles.size} across $nCells cells")

    // row-for-row equivalence with the inline path (ordered compare —
    // both end in the same (cos desc, vec_id) top-k)
    val inline = Similarity.ivfTopK(emb, 0L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val indexed = probe
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(indexed == inline, "indexed probe must equal the inline cell scan")
  }

  test("index build is session-memoized: one path per corpus plan, evictable") {
    val p1 = Similarity.ivfIndexPath(emb)
    val p2 = Similarity.ivfIndexPath(
      Tables.table(spark, "/root/testdata/sf0.001", "embeddings"))
    assert(p1 == p2, "same corpus plan -> same persisted index")
    Similarity.evictIvfIndex(spark)
    val p3 = Similarity.ivfIndexPath(emb)
    assert(p3 != p1, "eviction forces a fresh build")
  }
}
