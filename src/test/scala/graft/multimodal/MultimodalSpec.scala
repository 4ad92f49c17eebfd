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
