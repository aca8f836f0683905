package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.extensions.Sketches

/** MemoryStream proof of the sketch-maintenance story: folding
  * micro-batches through [[StreamingSketch]]'s merges yields
  * BIT-IDENTICALLY the sketch a batch rebuild over the concatenated
  * corpus produces — for the CMS grid (counter additivity) and the KMV
  * state (k-min set union) — so the always-on profile never needs to
  * re-scan history. */
class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  private val batches = Seq(
    Seq((1L, "alpha beta gamma delta epsilon", "src0"),
      (2L, "alpha beta zeta eta theta", "src1")),
    Seq((3L, "iota kappa lambda mu nu alpha", "src0"),
      (4L, "alpha beta gamma xi omicron", "src1")),
    Seq((5L, "pi rho sigma tau upsilon phi", "src0")))

  private def docs(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("doc_id", "text", "source")

  private def allDocs: DataFrame = docs(batches.flatten)

  private def gridMap(df: DataFrame): Map[(Int, Long), Long] =
    df.as[(Int, Long, Long)].collect()
      .map { case (s, b, c) => (s, b) -> c }.toMap

  private def kmvMap(df: DataFrame): Map[String, Seq[Long]] =
    df.as[(String, Seq[Long])].collect().toMap

  test("streamed sketch merges equal the batch rebuild over the union") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val arriving = mem.toDF().toDF("doc_id", "text", "source")

    // empty initial states (schema-typed)
    var cms = Sketches.cmsBuild(Sketches.tokens(allDocs.limit(0)), 4, 64)
      .localCheckpoint()
    var kmv = StreamingSketch.kmvState(allDocs.limit(0), k = 4, n = 2)
      .localCheckpoint()

    val q = StreamingSketch.sink(cms, kmv, arriving,
        onBatch = (newCms, newKmv, _) => {
          cms = newCms.localCheckpoint()
          kmv = newKmv.localCheckpoint()
        },
        depth = 4, width = 64, k = 4, n = 2)
      .start()
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    } finally q.stop()

    val rebuiltCms = Sketches.cmsBuild(Sketches.tokens(allDocs), 4, 64)
    assert(gridMap(cms) == gridMap(rebuiltCms), "CMS grid drifted from rebuild")

    val rebuiltKmv = StreamingSketch.kmvState(allDocs, k = 4, n = 2)
    assert(kmvMap(kmv) == kmvMap(rebuiltKmv), "KMV state drifted from rebuild")

    // and the estimates read out of maintained state match the batch
    // operator's published numbers for the same corpus
    val fromState = StreamingSketch.kmvEstimate(kmv, k = 4)
      .as[(String, Double)].collect().toMap
    val fromBatch = Sketches.kmvDistinct(allDocs, k = 4, n = 2)
      .select("source", "kmv_est").as[(String, Double)].collect().toMap
    assert(fromState == fromBatch)
  }

  test("merge operators are associative/commutative; KMV merge is idempotent") {
    val a = Sketches.cmsBuild(Sketches.tokens(docs(batches(0))), 4, 64)
    val b = Sketches.cmsBuild(Sketches.tokens(docs(batches(1))), 4, 64)
    assert(gridMap(StreamingSketch.mergeCms(a, b))
      == gridMap(StreamingSketch.mergeCms(b, a)))

    val ka = StreamingSketch.kmvState(docs(batches(0)), k = 4, n = 2)
    val kb = StreamingSketch.kmvState(docs(batches(1)), k = 4, n = 2)
    val ab = kmvMap(StreamingSketch.mergeKmv(ka, kb, 4))
    assert(ab == kmvMap(StreamingSketch.mergeKmv(kb, ka, 4)))
    // idempotent: re-merging a's state changes nothing (the replay
    // immunity CMS does NOT have — its caution is documented)
    val abDf = StreamingSketch.mergeKmv(ka, kb, 4).localCheckpoint()
    assert(kmvMap(StreamingSketch.mergeKmv(abDf, ka, 4)) == ab)
  }

  test("streamed histogram state equals the flat build (the r12 quantile member)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val arriving = mem.toDF().toDF("v")
    val (lo, hi, bins) = (0L, 100L, 16)
    val hbatches = Seq(Seq(5L, 7L, 42L, 99L, -3L), Seq(42L, 63L, 250L, 0L))

    var stateById = Map(-1L ->
      Sketches.histState(Seq.empty[Long].toDF("v"), "v", lo, hi, bins)
        .localCheckpoint())
    val q = StreamingSketch.histSink(
        stateById(stateById.keys.max), arriving,
        onBatch = (s, id) => stateById = stateById + (id -> s.localCheckpoint()),
        "v", lo, hi, bins)
      .start()
    try hbatches.foreach { b => mem.addData(b); q.processAllAvailable() }
    finally q.stop()

    def binMap(df: DataFrame) =
      df.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val streamed = stateById(stateById.keys.max)
    val flat = Sketches.histState(
      hbatches.flatten.toDF("v"), "v", lo, hi, bins)
    assert(binMap(streamed) == binMap(flat))
    // and the quantiles read identically out of the streamed state
    assert(Sketches.histQuantile(streamed, Seq(500), lo, hi, bins).collect()
      .toSeq == Sketches.histQuantile(flat, Seq(500), lo, hi, bins)
      .collect().toSeq)
  }

  test("streamed HLL state equals the flat build; replay is a no-op by algebra") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val arriving = mem.toDF().toDF("doc_id", "text", "source")

    var stateById = Map(-1L ->
      Sketches.hllState(docs(Seq.empty)).localCheckpoint())
    val q = StreamingSketch.hllSink(
        stateById(stateById.keys.max), arriving,
        onBatch = (s, id) => stateById = stateById + (id -> s.localCheckpoint()))
      .start()
    try batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    finally q.stop()

    def regMap(df: DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val streamed = stateById(stateById.keys.max)
    assert(regMap(streamed) == regMap(Sketches.hllState(allDocs)),
      "streamed ≡ rebuilt, bitwise")
    // replay no-op: re-merging the LAST batch into the final state
    // changes nothing — max is idempotent, so unlike the CMS leg this
    // sink needs no batchId-keyed persist to be exactly-once
    val replayed = Sketches.mergeHll(
      streamed, Sketches.hllState(docs(batches.last)))
    assert(regMap(replayed) == regMap(streamed))
    // and the estimate reads identically from streamed state and scan
    assert(Sketches.hllEstimate(streamed).collect().toSeq.sortBy(_.getString(0))
      == Sketches.hllEstimate(Sketches.hllState(allDocs)).collect().toSeq
        .sortBy(_.getString(0)))
  }
}
