package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** quality-model TRAINING (NB log-count-ratio over the shared DSIR
  * feature space): the loop the r7 verdict flagged as open — scoring
  * consumed trained weights but nothing produced them. Pins: planted
  * good/bad corpora separate a HELD-OUT mixed set, the fit is
  * deterministic, weights carry the log-odds sign structure, and the
  * weights table round-trips through the (bucket, weight_milli)
  * contract quality-score ingests. */
class QualityTrainSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint vocabularies; multiple distinct docs per class so the
  // fit sees a distribution, not one string
  private val goodVocab = Seq(
    "the committee reviewed the annual report and approved the budget for the coming year",
    "researchers published a detailed study of coastal erosion and its effect on local harbors",
    "the library extended its opening hours after residents asked for evening access to archives",
    "engineers inspected the bridge and scheduled repairs for the northern span next spring")
  private val badVocab = Seq(
    "click here buy cheap pills winner winner free prize claim now limited offer",
    "xxx hot singles near you click click subscribe unsubscribe mailto spam spam",
    "CHEAP CHEAP best price viagra casino jackpot bonus code claim claim claim",
    "follow like share subscribe smash that button giveaway giveaway free free free")

  private def df(texts: Seq[String], base: Long) =
    texts.zipWithIndex.map { case (t, i) => (base + i, t) }.toDF("doc_id", "text")

  private lazy val lam =
    TextQueries.qualityModelFit(df(goodVocab, 0L), df(badVocab, 100L))

  test("trained weights separate a held-out mixed corpus") {
    // held-out docs REUSE each class's vocabulary in new combinations
    // (the generalization a bag-of-grams model is supposed to make),
    // never a training string verbatim
    val held = Seq(
      (200L, "the committee published a detailed report and approved repairs to the library"),
      (201L, "residents reviewed the study of the northern bridge and its local effect"),
      (210L, "click here claim free bonus code winner subscribe now cheap prize"),
      (211L, "smash that subscribe button free giveaway jackpot claim click click"))
      .toDF("doc_id", "text")
    val kept = TextQueries.qualityModelScore(held, lam)
      .filter(col("keep")).collect().map(_.getLong(0)).toSet
    assert(kept == Set(200L, 201L),
      s"trained model must keep the good-vocabulary docs and drop the spam: $kept")
  }

  test("fit is deterministic and carries the log-odds sign structure") {
    val again = TextQueries.qualityModelFit(df(goodVocab, 0L), df(badVocab, 100L))
    assert(lam.sameElements(again), "same corpora must fit identical weights")
    // a gram only in the good class must weigh positive, only-bad
    // negative — the NB log-count-ratio's defining property, checked
    // through the production bucket hash via a one-gram probe doc
    def score(text: String): Long =
      TextQueries.qualityModelScore(Seq((0L, text)).toDF("doc_id", "text"), lam)
        .head().getLong(2)
    assert(score("committee") > 0L, "good-only vocabulary must score positive")
    assert(score("viagra") < 0L, "bad-only vocabulary must score negative")
  }

  test("weights table is full-coverage and feeds qualityModelScore unchanged") {
    val tbl = TextQueries.qualityWeightsTable(spark, lam)
    assert(tbl.count() == PipelineQueries.DsirBuckets)
    assert(tbl.select("bucket").distinct().count() == PipelineQueries.DsirBuckets)
    // round-trip through the table representation: rebuild the array
    // exactly as the CLI reader does and compare
    val back = new Array[Long](PipelineQueries.DsirBuckets)
    tbl.collect().foreach(r => back(r.getInt(0)) = r.getLong(1))
    assert(back.sameElements(lam))
  }
}
