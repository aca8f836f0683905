package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("extractFeatures: deterministic per payload, schema stable") {
    val media = Multimodal.syntheticMedia(spark, 30)
    def run() = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
      .map(f => (f.media_id, f.kind, f.n_bytes, f.checksum, f.feature.toSeq))
    val f1raw = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(run().toSeq == run().toSeq)
    val f1 = f1raw
    assert(f1.forall(_.feature.length == 8))
    assert(f1.forall(f => f.n_bytes >= 64 && f.n_bytes < 128))
    // checksum is the byte histogram total weighted — equal payload bytes sum
    assert(f1.forall(f => f.feature.sum == f.n_bytes.toFloat))
  }

  test("null payload yields zeroed features, not a crash") {
    import spark.implicits._
    val rows = Seq(Multimodal.MediaRow(99L, "image", null,
      Multimodal.MediaMeta(None, None, None, None))).toDS()
    val f = Multimodal.extractFeatures(rows).head()
    assert(f.n_bytes == 0L && f.checksum == 0L && f.feature.forall(_ == 0f))
  }

  test("sampleFrames: only video rows, bounded frame count") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val frames = Multimodal.sampleFrames(media, 4)
    val byId = frames.collect().groupBy(_.getLong(0))
    assert(byId.keySet.forall(_ % 3 == 2)) // kind(video) = ids ≡ 2 mod 3
    assert(byId.values.forall(_.length == 4))
  }

  test("decodeImages: REAL PNG payloads decode to their true dimensions via javax.imageio") {
    val media = Multimodal.syntheticImages(spark, 20)
    val decoded = Multimodal.decodeImages(media).collect().sortBy(_.media_id)
    assert(decoded.length == 20, "every genuine PNG decodes")
    decoded.foreach { d =>
      assert(d.mime == "image/png")
      // measured-from-bytes dimensions equal the encoder's choice
      assert(d.width == 4 + (d.media_id % 5).toInt)
      assert(d.height == 3 + (d.media_id % 4).toInt)
      assert(d.n_bytes > 50, "payload is a real container, not a stub")
    }
  }

  test("decodeImages: corrupt and non-image payloads drop instead of crashing") {
    import spark.implicits._
    val png = Multimodal.syntheticImages(spark, 1).head()
    val truncated = png.payload.take(20) // valid magic, broken body
    // valid JPEG magic + garbage body: ImageIO plugins can throw
    // UNCHECKED exceptions here, not just IOException — must quarantine
    val jpegGarbage = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++
      Array.tabulate[Byte](64)(i => (i * 37).toByte)
    val rows = Seq(
      png.copy(media_id = 1L),
      Multimodal.MediaRow(2L, "image", truncated, png.meta),
      Multimodal.MediaRow(3L, "image", Array[Byte](1, 2, 3, 4, 5), png.meta),
      Multimodal.MediaRow(4L, "image", null, png.meta),
      Multimodal.MediaRow(5L, "audio", png.payload, png.meta), // wrong kind: filtered
      Multimodal.MediaRow(6L, "image", jpegGarbage, png.meta)
    ).toDS()
    val out = Multimodal.decodeImages(rows).collect()
    assert(out.map(_.media_id).toSet == Set(1L))
  }

  test("sniffMime identifies containers from magic bytes without decoding") {
    val png = Multimodal.syntheticImages(spark, 1).head().payload
    assert(Multimodal.ImageCodec.sniffMime(png).contains("image/png"))
    assert(Multimodal.ImageCodec.sniffMime(
      Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte)).contains("image/jpeg"))
    assert(Multimodal.ImageCodec.sniffMime(Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(Multimodal.ImageCodec.sniffMime(null).isEmpty)
    assert(Multimodal.ImageCodec.sniffMime(Array[Byte](0x89.toByte)).isEmpty)
  }

  test("decodeAudio: REAL WAV payloads decode to their true rate/duration via javax.sound") {
    val media = Multimodal.syntheticWavs(spark, 15)
    val decoded = Multimodal.decodeAudio(media).collect().sortBy(_.media_id)
    assert(decoded.length == 15, "every genuine WAV decodes")
    decoded.foreach { d =>
      val expectRate = 8000 * (1 + (d.media_id % 3).toInt)
      val expectSamples = 400 + (d.media_id % 100).toInt * 4
      assert(d.sample_rate == expectRate,
        "measured-from-bytes sample rate equals the encoder's choice")
      assert(d.channels == 1)
      assert(d.duration_ms == expectSamples * 1000L / expectRate)
      assert(d.n_bytes > expectSamples, "payload is container + PCM, not a stub")
    }
  }

  test("decodeAudio: corrupt and non-WAV payloads drop instead of crashing") {
    import spark.implicits._
    val wav = Multimodal.syntheticWavs(spark, 1).head()
    val rows = Seq(
      wav.copy(media_id = 1L),
      Multimodal.MediaRow(2L, "audio", wav.payload.take(16), wav.meta), // truncated
      Multimodal.MediaRow(3L, "audio", Array[Byte](1, 2, 3), wav.meta),
      Multimodal.MediaRow(4L, "audio", null, wav.meta),
      Multimodal.MediaRow(5L, "video", wav.payload, wav.meta) // wrong kind
    ).toDS()
    assert(Multimodal.decodeAudio(rows).collect().map(_.media_id).toSet == Set(1L))
    assert(Multimodal.AudioCodec.sniffMime("RIFF0000WAVE".getBytes).contains("audio/wav"))
    assert(Multimodal.AudioCodec.sniffMime("RIFFWAVE".getBytes).isEmpty)
    assert(Multimodal.AudioCodec.sniffMime(null).isEmpty)
  }

  /** A real PNG with seed-derived pixels; `perturb` flips the low bits
    * of ONE pixel's blue channel — the 1-bit-perturbed near-identical
    * image of the dedup contract. 32×24 so each 8×8-grid cell averages
    * ~12 pixels and a single-pixel tweak moves its cell mean by well
    * under a luminance step. */
  private def seededPng(seed: Int, perturb: Boolean = false): Array[Byte] = {
    val w = 32; val h = 24
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((seed * 2654435761L + x * 31 + y * 17) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    if (perturb) img.setRGB(5, 5, img.getRGB(5, 5) ^ 0x03)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("perceptual hashes: a 1-pixel perturbation stays near; distinct images stay far") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = Multimodal.ImageCodec.aHash(seededPng(1)).get
    val near = Multimodal.ImageCodec.aHash(seededPng(1, perturb = true)).get
    val far = Multimodal.ImageCodec.aHash(seededPng(9)).get
    assert(ham(base, near) <= 2, s"1-pixel tweak moved aHash by ${ham(base, near)} bits")
    assert(ham(base, far) > 3, s"distinct images must not collide: ${ham(base, far)}")
    val dBase = Multimodal.ImageCodec.dHash(seededPng(1)).get
    val dNear = Multimodal.ImageCodec.dHash(seededPng(1, perturb = true)).get
    val dFar = Multimodal.ImageCodec.dHash(seededPng(9)).get
    assert(ham(dBase, dNear) <= 2)
    assert(ham(dBase, dFar) > 3)
    // undecodable payloads quarantine, not crash
    assert(Multimodal.ImageCodec.aHash(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.ImageCodec.aHash(null).isEmpty)
  }

  test("imageHashPairs finds the planted near-dup via banding — no cartesian, candidates complete") {
    import spark.implicits._
    val rows = (Seq(
      Multimodal.MediaRow(1L, "image", seededPng(1), Multimodal.MediaMeta(None, None, None, None)),
      Multimodal.MediaRow(2L, "image", seededPng(1, perturb = true), Multimodal.MediaMeta(None, None, None, None)),
      Multimodal.MediaRow(3L, "audio", seededPng(1), Multimodal.MediaMeta(None, None, None, None))) ++ // wrong kind: excluded
      (4L to 18L).map(i => Multimodal.MediaRow(i, "image", seededPng(i.toInt * 7),
        Multimodal.MediaMeta(None, None, None, None)))).toDS()
    val hashes = Multimodal.imageHashes(rows).cache()
    val pairs = Multimodal.imageHashPairs(hashes, maxHamming = 3)
    val got = pairs.select("a", "b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)), s"planted near-identical pair missed: $got")
    // completeness: numBands(4) > maxHamming(3) makes banding pure
    // optimization — the candidate set must equal brute force
    val hs = hashes.collect().map(h => h.media_id -> h.ahash)
    val brute = (for {
      (ia, ha) <- hs; (ib, hb) <- hs
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    assert(got == brute, s"banded $got != brute $brute")
    // the banded plan never materializes all pairs
    val p = pairs.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  /** An 8-bit mono WAV with a seed-derived AMPLITUDE-MODULATED tone —
    * shared fixture, see [[TestAudio.seededWav]]. */
  private def seededWav(seed: Int, perturbAt: Int = -1, gain: Double = 1.0): Array[Byte] =
    TestAudio.seededWav(seed, perturbAt, gain)

  test("audio envelope hash: perturbation and uniform gain stay near; different clips stay far") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = Multimodal.AudioCodec.envelopeHash(seededWav(1)).get
    val near = Multimodal.AudioCodec.envelopeHash(seededWav(1, perturbAt = 777)).get
    val half = Multimodal.AudioCodec.envelopeHash(seededWav(1, gain = 0.5)).get
    val far = Multimodal.AudioCodec.envelopeHash(seededWav(4)).get
    assert(ham(base, near) <= 2, s"1-sample nudge moved the hash ${ham(base, near)} bits")
    assert(ham(base, half) <= 2,
      s"gradient direction must survive uniform gain, moved ${ham(base, half)}")
    assert(ham(base, far) > 3, s"distinct clips must not collide: ${ham(base, far)}")
    // quarantine: non-WAV, corrupt, and too-short-to-envelope payloads
    assert(Multimodal.AudioCodec.envelopeHash(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.AudioCodec.envelopeHash(null).isEmpty)
    val tiny = { // genuine WAV, 32 samples < 65 windows
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](32)), fmt, 32L)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    assert(Multimodal.AudioCodec.envelopeHash(tiny).isEmpty)
  }

  test("audioHashPairs: banded pairing finds the planted near-dup clip, complete vs brute force") {
    import spark.implicits._
    val meta = Multimodal.MediaMeta(None, None, None, None)
    val rows = (Seq(
      Multimodal.MediaRow(1L, "audio", seededWav(1), meta),
      Multimodal.MediaRow(2L, "audio", seededWav(1, perturbAt = 777), meta),
      Multimodal.MediaRow(3L, "image", seededWav(1), meta)) ++ // wrong kind
      (4L to 15L).map(i => Multimodal.MediaRow(i, "audio",
        seededWav(i.toInt * 5), meta))).toDS()
    val hashes = Multimodal.audioHashes(rows).cache()
    val got = Multimodal.audioHashPairs(hashes, maxHamming = 3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)), s"planted near-identical clip pair missed: $got")
    val hs = hashes.collect().map(h => h.media_id -> h.ehash)
    val brute = (for {
      (ia, ha) <- hs; (ib, hb) <- hs
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    assert(got == brute, s"banded $got != brute $brute")
  }

  test("decodeVideo: REAL MJPEG-AVI payloads yield frame counts and measured dims via the RIFF walker") {
    val media = Multimodal.syntheticMjpegAvis(spark, 6, framesPer = 4)
    val decoded = Multimodal.decodeVideo(media).collect().sortBy(_.media_id)
    assert(decoded.length == 6, "every genuine MJPEG-AVI decodes")
    decoded.foreach { v =>
      assert(v.n_frames == 4)
      assert(v.width == 16 && v.height == 12,
        "dimensions measured from the FRAME BYTES, not the metadata struct")
      assert(v.mime == "video/x-msvideo")
    }
  }

  test("VideoCodec: truncated and non-AVI payloads quarantine; truncation keeps earlier frames") {
    import spark.implicits._
    val good = Multimodal.syntheticMjpegAvis(spark, 1, framesPer = 4).head()
    // cut inside the last frame: the walker must stop cleanly and keep
    // the complete frames before the cut
    val truncated = good.payload.take(good.payload.length - 10)
    val framesT = Multimodal.VideoCodec.frames(truncated)
    assert(framesT.nonEmpty && framesT.length < 4,
      s"truncation keeps complete earlier frames, got ${framesT.length}")
    assert(Multimodal.VideoCodec.frames(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.VideoCodec.frames(null).isEmpty)
    assert(Multimodal.VideoCodec.decode(
      "RIFF0000AVI somegarbagewithoutchunks".getBytes).isEmpty)
    val rows = Seq(
      good.copy(media_id = 1L),
      Multimodal.MediaRow(2L, "video", truncated, good.meta), // partial: still decodes
      Multimodal.MediaRow(3L, "video", Array[Byte](9, 9, 9), good.meta), // junk: dropped
      Multimodal.MediaRow(4L, "image", good.payload, good.meta)) // wrong kind: filtered
      .toDS()
    val got = Multimodal.decodeVideo(rows).collect().map(_.media_id).toSet
    assert(got == Set(1L, 2L))
  }

  test("sampleFramesMjpeg emits genuinely decodable, evenly-sampled frames") {
    import spark.implicits._
    val media = Multimodal.syntheticMjpegAvis(spark, 3, framesPer = 6)
    val frames = Multimodal.sampleFramesMjpeg(media, n = 3).collect()
    val byId = frames.groupBy(_.getLong(0))
    assert(byId.keySet == Set(0L, 1L, 2L))
    byId.values.foreach { fs =>
      assert(fs.length == 3, "n evenly-spaced frames per video")
      fs.foreach { r =>
        assert(r.getInt(3) == 16 && r.getInt(4) == 12)
        // the emitted bytes are a real standalone JPEG
        assert(Multimodal.ImageCodec.decode(r.getAs[Array[Byte]](2)).isDefined)
      }
    }
  }

  test("videoHashes + videoHashPairs: a re-posted clip pairs with its original; distinct clips don't") {
    import spark.implicits._
    val base = Multimodal.syntheticMjpegAvis(spark, 8, framesPer = 3)
    // the primary video-dedup case: the same file re-posted under a new id
    val repost = base.filter(_.media_id == 2L)
      .map(r => r.copy(media_id = 100L))
    val all = base.union(repost)
    val hashes = Multimodal.videoHashes(all).cache()
    assert(hashes.count() == 9, "every decodable clip gets a keyframe hash")
    val got = Multimodal.videoHashPairs(hashes)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got.contains((2L, 100L)), s"the re-post must pair with its original: $got")
    val hs = hashes.collect().map(h => h.media_id -> h.vhash)
    val brute = (for {
      (ia, ha) <- hs; (ib, hb) <- hs
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    assert(got == brute, s"banded $got != brute $brute")
  }

  test("resizeImages: downscale fits bounds preserving aspect; output is a real PNG that re-feeds the pipeline") {
    import spark.implicits._
    // a genuine 100x40 PNG, wider than the 10x10 bounds
    val img = new java.awt.image.BufferedImage(
      100, 40, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 40).foreach(y => (0 until 100).foreach(x =>
      img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Seq(Multimodal.MediaRow(7L, "image", bos.toByteArray,
      Multimodal.MediaMeta(Some(100), Some(40), None, Some("image/png")))).toDS()
    val out = Multimodal.resizeImages(media, 10, 10).collect()
    assert(out.length == 1)
    // scale = min(10/100, 10/40) = 0.1 → 10x4
    assert(out.head.width == 10 && out.head.height == 4, out.head)
    // the payload is itself a decodable PNG with those dims…
    val redecoded = Multimodal.ImageCodec.decode(out.head.payload)
    assert(redecoded == Some((10, 4, "image/png")), redecoded)
    // …and feeds the hash pipeline unchanged as an image-kind row
    val resizedRow = Seq(Multimodal.MediaRow(7L, "image", out.head.payload,
      Multimodal.MediaMeta(Some(10), Some(4), None, Some("image/png")))).toDS()
    assert(Multimodal.imageHashes(resizedRow).collect().length == 1)
  }

  test("resizeImages: never upscales, deterministic bytes, quarantines junk") {
    import spark.implicits._
    val tiny = Multimodal.syntheticImages(spark, 3) // 4-8 x 3-6 px
    def run() = Multimodal.resizeImages(tiny, 64, 64).collect()
      .sortBy(_.media_id)
    val a = run(); val b = run()
    // smaller than the bounds → original dimensions kept
    val dims = tiny.collect().sortBy(_.media_id)
      .map(r => (r.meta.width.get, r.meta.height.get))
    assert(a.map(r => (r.width, r.height)).toSeq == dims.toSeq)
    // PNG re-encode is lossless and unseeded → byte-stable across runs
    assert(a.zip(b).forall { case (x, y) =>
      java.util.Arrays.equals(x.payload, y.payload) })
    // junk payloads drop, never crash
    val junk = Seq(Multimodal.MediaRow(1L, "image", Array[Byte](1, 2, 3),
      Multimodal.MediaMeta(None, None, None, None))).toDS()
    assert(Multimodal.resizeImages(junk, 8, 8).collect().isEmpty)
  }

  test("media parquet roundtrip preserves payload bytes and metadata struct") {
    val dir = java.nio.file.Files.createTempDirectory("media").toFile.getAbsolutePath
    val media = Multimodal.syntheticMedia(spark, 10).toDF()
    Multimodal.writeMedia(media, dir, targetRecordsPerFile = 4)
    val back = spark.read.parquet(dir)
    assert(back.count() == 10)
    import spark.implicits._
    val orig = media.as[Multimodal.MediaRow].collect().sortBy(_.media_id)
    val rt = back.as[Multimodal.MediaRow].collect().sortBy(_.media_id)
    assert(orig.zip(rt).forall { case (a, b) =>
      java.util.Arrays.equals(a.payload, b.payload) && a.meta == b.meta })
  }
}
