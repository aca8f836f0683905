package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines — SURVEY §7.1
  * step 7 ("multimodal columns").
  *
  * Media payloads are opaque `binary` columns beside a typed metadata
  * struct; decode / feature-extract run as per-partition batch transforms
  * over the typed Dataset (the JVM analog of Python's mapInPandas: one
  * task processes a partition's rows as a batch, heavy codec state is
  * initialized once per partition, not per row).
  *
  * The actual codec is STUBBED (deterministic fake): image/audio
  * libraries are not in this container. The Spark-side contract — schema,
  * partitioning, batch shape, null behavior — is real and tested
  * (MultimodalSpec). Swapping [[FakeCodec]] for a real decoder changes no
  * plumbing.
  */
object Multimodal {

  /** A media row: payload + typed metadata (never parse metadata out of
    * the binary on the analytical path — it must prune independently). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),          // image | audio | video
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("mime", StringType))))))

  case class MediaMeta(width: Option[Int], height: Option[Int],
                       duration_ms: Option[Long], mime: Option[String])
  case class MediaRow(media_id: Long, kind: String,
                      payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, kind: String,
                           n_bytes: Long, checksum: Long, feature: Array[Float])

  /** Deterministic fake decode: byte-sum checksum + an 8-dim "embedding"
    * derived from byte histogram buckets. Stands in for a real
    * image/audio decoder (`???` territory — see object scaladoc). */
  object FakeCodec {
    def features(payload: Array[Byte]): (Long, Array[Float]) = {
      if (payload == null) return (0L, Array.fill(8)(0f))
      var sum = 0L
      val hist = new Array[Float](8)
      var i = 0
      while (i < payload.length) {
        val b = payload(i) & 0xff
        sum += b
        hist(b % 8) += 1f
        i += 1
      }
      (sum, hist)
    }
  }

  /** Per-partition batch decode — the mapInPandas-shaped hot path. The
    * iterator is consumed lazily: rows stream through without
    * materializing the partition, so payload bytes never pile up in
    * memory. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens HERE (real codecs open once per task)
      rows.map { r =>
        val (checksum, feat) = FakeCodec.features(r.payload)
        MediaFeatures(r.media_id, r.kind,
          if (r.payload == null) 0L else r.payload.length.toLong,
          checksum, feat)
      }
    }
  }

  /** Frame-sample stub: emits `n` deterministic byte-slices per video row
    * — the generator (1→N) shape of frame extraction, as a typed
    * flatMap. */
  def sampleFrames(media: Dataset[MediaRow], n: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val len = if (r.payload == null) 0 else r.payload.length
      (0 until math.min(n, math.max(len, 0))).map { i =>
        val step = math.max(len / math.max(n, 1), 1)
        (r.media_id, i, r.payload.slice(i * step, i * step + math.min(16, len)))
      }
    }.toDF("media_id", "frame_no", "frame_bytes")
  }

  /** Partitioning guidance applied: media tables are written with bounded
    * file sizes so a single task never holds more than ~`targetMB` of
    * payload (the reference bounds parquet files the same way,
    * feeder_hadoop.py:20). */
  def writeMedia(df: DataFrame, path: String, targetRecordsPerFile: Int = 1000): Unit =
    df.write.option("maxRecordsPerFile", targetRecordsPerFile.toLong)
      .mode("overwrite").parquet(path)

  /** Deterministic synthetic media frame for tests/demos. */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = Seq("image", "audio", "video")(i.toInt % 3)
      val payload = Array.tabulate[Byte](64 + (i % 64).toInt)(j => ((i * 31 + j) % 251).toByte)
      MediaRow(i, kind, payload,
        MediaMeta(Some(64), Some(48), Some(1000L * (i % 10)), Some(s"x/$kind")))
    }
  }
}
