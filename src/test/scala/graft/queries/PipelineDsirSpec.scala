package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** corpus_dsir_select: hashed-n-gram importance resampling. The gate
  * oracle pins the full arithmetic (bucket hash, milli-log ratios,
  * selection) against DuckDB at sf0.01; these specs pin the BEHAVIOR
  * the arithmetic is for — target-domain skew, the exact top-K
  * contract of the histogram-pruned selection (including the
  * boundary tie-break), and the no-gram exclusion rule. */
class PipelineDsirSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("dsir: selection skews toward the target domain's vocabulary") {
    // target sample: "science" vocabulary; candidates: half science,
    // half sports. Repetition gives the distributions mass.
    val sci = "quantum entanglement spectral decomposition tensor manifold " * 5
    val spo = "goalkeeper penalty halftime referee offside striker " * 5
    val targets = docsOf((1000L to 1019L).map(i => i -> sci): _*)
    val candidates = docsOf(
      ((0L until 20L).map(i => i -> sci) ++
        (20L until 40L).map(i => i -> spo)): _*)
    val sel = PipelineQueries
      .corpusDsirSelectDocs(candidates, targets, keepFrac = 0.5)
      .collect()
    assert(sel.length == 20)
    // every selected doc must be from the science half: the sports
    // half shares no gram with the target, so its smoothed log-ratio
    // is strictly negative while the science docs' is positive
    val ids = sel.map(_.getLong(0)).toSet
    assert(ids == (0L until 20L).toSet, s"selected $ids")
    assert(sel.forall(_.getLong(1) > 0L), "science weights must be positive")
  }

  test("dsir: exact top-K with deterministic doc_id tie-break at the boundary") {
    // every candidate identical ⇒ every weight identical ⇒ the whole
    // corpus IS the boundary class. K = ceil(10 * 0.2) = 2 must be
    // the two smallest doc_ids, ranks 1 and 2 — the histogram
    // degenerates to one bin and the prefix-superset window does all
    // the work.
    val t = "alpha beta gamma delta"
    val targets = docsOf(100L -> t)
    val candidates = docsOf((0L until 10L).map(i => (i * 7 + 3) -> t): _*)
    val sel = PipelineQueries
      .corpusDsirSelectDocs(candidates, targets, keepFrac = 0.2)
      .orderBy("sel_rank").collect()
    assert(sel.map(_.getLong(0)).toSeq == Seq(3L, 10L))
    assert(sel.map(_.getLong(2)).toSeq == Seq(1L, 2L))
    assert(sel.map(_.getLong(1)).distinct.length == 1)
  }

  test("dsir: docs with no extractable grams carry no evidence and are excluded") {
    val t = "alpha beta gamma"
    val targets = docsOf(100L -> t)
    // 4 grammed candidates + 1 empty + 1 non-ASCII ⇒ n = 4, K = 1
    val candidates = docsOf(
      1L -> t, 2L -> t, 3L -> t, 4L -> t, 5L -> "", 6L -> "你好 世界")
    val sel = PipelineQueries
      .corpusDsirSelectDocs(candidates, targets, keepFrac = 0.25)
      .collect()
    assert(sel.length == 1 && sel.head.getLong(0) == 1L)
  }

  test("dsir: gate form is deterministic across runs") {
    val dir = "/root/testdata/sf0.001"
    val a = PipelineQueries.corpusDsirSelect(spark, dir)
    val b = PipelineQueries.corpusDsirSelect(spark, dir)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.count() > 0)
  }
}
