package graft.multimodal

import graft.SparkSpec
import graft.queries.MultimodalQueries
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  private def dir = sf("any")

  test("feature extraction: real batching, normalized histograms, deterministic") {
    val out = Multimodal.extractFeatures(MultimodalQueries.binaryDocs(spark, dir)).cache()
    val rows = out.collect()
    assert(rows.length == 500)
    // batches actually formed (batch_size surfaced from mapPartitions)
    assert(rows.forall(r => r.getInt(5) >= 1 && r.getInt(5) <= 64))
    assert(rows.exists(_.getInt(5) > 1), "expected multi-element batches")
    // histogram sums to ~1 and dims are fixed
    val feats = rows.map(_.getSeq[Float](4))
    assert(feats.forall(_.length == Multimodal.StubDecoder.FeatureDim))
    assert(feats.forall(f => math.abs(f.sum - 1.0) < 1e-3))
    val again = Multimodal.extractFeatures(MultimodalQueries.binaryDocs(spark, dir)).collect()
    assert(rows.map(_.getLong(0)).sorted.sameElements(again.map(_.getLong(0)).sorted))
    out.unpersist()
  }

  test("gate form recovers exact integer bin counts summing to n_bytes") {
    import spark.implicits._
    val bad = MultimodalQueries.mmFeatures(spark, dir)
      .select(col("n_bytes"),
        aggregate(from_json(col("feature_counts"), lit("array<int>")),
          lit(0), (acc, x) => acc + x).as("count_sum"))
      .filter(col("count_sum") =!= col("n_bytes")).count()
    assert(bad == 0L, "rounded counts must sum back to the payload length")
  }

  test("payload bytes never shuffle: features plan has no exchange before mapPartitions") {
    val out = MultimodalQueries.mmFeatures(spark, dir)
    val planStr = out.queryExecution.executedPlan.toString
    assert(!planStr.contains("Exchange"), s"payload shuffle found:\n$planStr")
  }

  test("image decoder arm: a self-encoded PNG decodes to real dims + luminance bins; JPEG decodes; garbage yields nulls") {
    import spark.implicits._
    // the fixtures are SELF-MADE (ImageIO also encodes), so no binary
    // blob is committed and the expected pixels are exact by
    // construction: a 4x2 image, left half black (luma 0 -> bin 0),
    // right half white (luma 255 -> bin 15)
    def encode(fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 2; x <- 0 until 4)
        img.setRGB(x, y, if (x < 2) 0x000000 else 0xFFFFFF)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"JDK must encode $fmt")
      bos.toByteArray
    }
    val rows = Seq(
      (1L, encode("png")),
      (2L, encode("jpg")),
      (3L, "not an image at all".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val out = graft.multimodal.Multimodal.extractFeatures(rows, decoder = "image")
      .collect().map(r => r.getLong(0) -> r).toMap
    // PNG is lossless: exact dims AND exact bins
    val png = out(1L)
    assert(png.getInt(2) == 4 && png.getInt(3) == 2, s"png dims: $png")
    val bins = png.getSeq[Float](4)
    assert(math.abs(bins(0) - 0.5f) < 1e-6 && math.abs(bins(15) - 0.5f) < 1e-6,
      s"black/white halves must land in bins 0 and 15: $bins")
    assert(bins.zipWithIndex.filter { case (_, i) => i != 0 && i != 15 }
      .forall(_._1 == 0f), s"no other bin may fire for a 2-color image: $bins")
    // JPEG is lossy: dims exact, histogram a distribution (sums to 1)
    val jpg = out(2L)
    assert(jpg.getInt(2) == 4 && jpg.getInt(3) == 2, s"jpg dims: $jpg")
    assert(math.abs(jpg.getSeq[Float](4).sum - 1f) < 1e-4)
    // an unparseable payload is an honest null, never a fake decode
    val bad = out(3L)
    assert(bad.isNullAt(2) && bad.isNullAt(3) && bad.isNullAt(4),
      s"garbage must yield null decode columns: $bad")
    assert(bad.getInt(1) == "not an image at all".getBytes("UTF-8").length,
      "n_bytes stays real even when the decode fails")
    // the stub arm is untouched by the knob (the oracle-matched form)
    val stub = graft.multimodal.Multimodal.extractFeatures(rows).collect()
    assert(stub.forall(r => !r.isNullAt(2)), "stub decodes every payload")
  }

  test("image decoder refuses a decompression bomb from the header alone, before any raster allocates") {
    // a REAL 2x2 PNG whose IHDR is then patched to declare
    // 40000x40000 (~1.6G pixels): PNG dimensions live at fixed offsets
    // (width at 16, height at 20, big-endian) and the JDK's PNG reader
    // does not CRC-check the IHDR at header-read time, so the patched
    // payload parses as a valid header (probed: getWidth returns
    // 40000). Without the dimension probe, ImageIO.read would try to
    // allocate the ~6.4 GB raster BEFORE validating pixel data —
    // OutOfMemoryError, not an exception, so the NonFatal arm never
    // sees it and the executor dies. (BMP is unsuitable as the
    // fixture: the JDK's BMP readHeader already cross-checks
    // dimensions against the declared data size.)
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val bomb = bos.toByteArray
    def putIntBE(at: Int, v: Int): Unit = {
      bomb(at) = (v >>> 24).toByte; bomb(at + 1) = (v >>> 16).toByte
      bomb(at + 2) = (v >>> 8).toByte; bomb(at + 3) = v.toByte
    }
    putIntBE(16, 40000); putIntBE(20, 40000)
    // sanity: the header really declares the bomb dimensions
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bomb))
    val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
    reader.setInput(iis)
    assert(reader.getWidth(0) == 40000 && reader.getHeight(0) == 40000)
    reader.dispose()
    // the decode refuses from the header probe: fast, no allocation
    val t0 = System.nanoTime()
    assert(Multimodal.ImageDecoder.decode(bomb).isEmpty,
      "a header declaring > MaxPixels must be refused")
    assert((System.nanoTime() - t0) / 1e9 < 5.0,
      "the refusal must be header-only (no raster work)")
    // an in-bounds image still decodes through the same probe path
    val okBos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", okBos)
    assert(Multimodal.ImageDecoder.decode(okBos.toByteArray).nonEmpty)
  }

  test("audio decoder arm: a self-encoded WAV decodes to real rate/channels/duration + amplitude bins; garbage yields nulls") {
    import spark.implicits._
    // self-made fixture (AudioSystem also encodes): 8000 Hz mono,
    // 800 frames alternating +16384/-16384 — |s|/32768 = 0.5 exactly,
    // so every sample lands in bin 8 and duration is exactly 0.1 s
    def wav(frames: Int, sampleRate: Float = 8000f, channels: Int = 1,
            amp: Short = 16384): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        sampleRate, 16, channels, 2 * channels, sampleRate, false)
      val pcm = new Array[Byte](frames * 2 * channels)
      for (f <- 0 until frames; c <- 0 until channels) {
        val s0: Short = if (f % 2 == 0) amp else (-amp).toShort
        val at = (f * channels + c) * 2
        pcm(at) = (s0 & 0xFF).toByte; pcm(at + 1) = ((s0 >> 8) & 0xFF).toByte
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val rows = Seq(
      (1L, wav(800)),
      (2L, wav(400, sampleRate = 16000f, channels = 2)),
      (3L, "definitely not audio".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val out = Multimodal.extractAudioFeatures(rows)
      .collect().map(r => r.getLong(0) -> r).toMap
    val mono = out(1L)
    assert(mono.getInt(2) == 8000 && mono.getInt(3) == 1, s"rate/channels: $mono")
    assert(mono.getLong(4) == 800L, s"frames: $mono")
    assert(math.abs(mono.getFloat(5) - 0.1f) < 1e-6, s"duration: $mono")
    val bins = mono.getSeq[Float](6)
    assert(bins.length == Multimodal.AudioDecoder.FeatureDim)
    assert(math.abs(bins(8) - 1f) < 1e-6 &&
      bins.zipWithIndex.filter(_._2 != 8).forall(_._1 == 0f),
      s"|16384|/32768 lands every sample in bin 8: $bins")
    // stereo at a different rate: channel-aware frame count + duration
    val st = out(2L)
    assert(st.getInt(2) == 16000 && st.getInt(3) == 2, s"stereo: $st")
    assert(st.getLong(4) == 400L && math.abs(st.getFloat(5) - 0.025f) < 1e-6, s"$st")
    // an unparseable payload is an honest null, never a fake decode
    val bad = out(3L)
    assert(bad.isNullAt(2) && bad.isNullAt(3) && bad.isNullAt(4) &&
      bad.isNullAt(5) && bad.isNullAt(6), s"garbage must yield nulls: $bad")
    assert(bad.getInt(1) == "definitely not audio".getBytes("UTF-8").length)
  }

  test("frame sampling covers every 32nd byte and nothing else") {
    import spark.implicits._
    val one = MultimodalQueries.mmFrameSample(spark, dir)
      .filter(col("doc_id") === 0L).orderBy("frame_idx")
      .select("offset").as[Int].collect()
    val n = MultimodalQueries.binaryDocs(spark, dir)
      .filter(col("doc_id") === 0L)
      .select(octet_length(col("payload"))).as[Int].head()
    assert(one.toSeq == (1 to n by 32).toSeq)
  }
}
