package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Round-trip fidelity proofs for the interchange formats: the tricky
  * types (arrays, binary, timestamps, decimals, signed zero, nulls)
  * through ORC and JSON-lines, plus a real harness table and a real
  * PNG payload. */
class FormatMirrorSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-fm-$tag").toString

  // the awkward-type gauntlet: nullable everything, nested array,
  // binary bytes incl. zero and 0xff, micros-precision timestamp,
  // exact decimal, -0.0 (ORC/JSON writers must not normalize it away
  // silently — if they do, the diff count says so)
  private lazy val gauntlet = Seq(
    (1L, Seq("a", "b"), Array[Byte](0, 1, -1, 127), Timestamp.valueOf("2024-01-02 03:04:05.123456"), BigDecimal("12345.6789"), 1.5),
    (2L, Seq.empty[String], Array.emptyByteArray, Timestamp.valueOf("1999-12-31 23:59:59.0"), BigDecimal("-0.0001"), -0.0),
    (3L, null, null, null, null, Double.MaxValue))
    .toDF("id", "arr", "payload", "ts", "dec", "d")

  test("ORC round-trips the awkward-type gauntlet losslessly, both directions") {
    val (missing, extra) = FormatMirror.roundTripDiff(gauntlet, tmp("orc"), "orc")
    assert((missing, extra) == ((0L, 0L)))
  }

  test("JSON-lines round-trips losslessly UNDER THE EXPLICIT SCHEMA (binary rides base64)") {
    val path = tmp("json")
    val (missing, extra) = FormatMirror.roundTripDiff(gauntlet, path, "json")
    assert((missing, extra) == ((0L, 0L)))
    // the schema-loss hazard the reader contract exists for: INFERRED
    // reads land binary as a base64 STRING — readable, but a different
    // type entirely
    val inferred = spark.read.json(path)
    assert(inferred.schema("payload").dataType ==
      org.apache.spark.sql.types.StringType,
      "inference must demonstrate the base64-string degradation")
  }

  test("a real harness table mirrors to ORC with zero diffs") {
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val (missing, extra) = FormatMirror.roundTripDiff(docs, tmp("docs"), "orc")
    assert((missing, extra) == ((0L, 0L)))
  }

  test("genuine PNG payloads survive an ORC mirror byte-for-byte") {
    val media = graft.multimodal.Multimodal.syntheticPhotos(spark, 5).toDF()
    val path = tmp("media")
    FormatMirror.mirror(media, path, "orc")
    val back = FormatMirror.readMirror(media, path, "orc")
    val orig = media.select("media_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val rt = back.select("media_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(orig.keySet == rt.keySet)
    assert(orig.forall { case (id, bytes) =>
      java.util.Arrays.equals(bytes, rt(id)) })
    // and the mirrored payloads still DECODE — fidelity a hash compare
    // can't distinguish from luck
    import spark.implicits._
    val decoded = graft.multimodal.Multimodal.decodeImages(
      back.as[graft.multimodal.Multimodal.MediaRow]).count()
    assert(decoded == 5L)
  }
}
