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
