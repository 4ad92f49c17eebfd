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

  test("dsir fit: a collapsed weight distribution warns DEGENERATE at seed time") {
    // every candidate identical ⇒ every weight lands in ONE histogram
    // bin ⇒ the calibrated threshold equals the minimum and the frozen
    // model keeps 100% regardless of keepFrac. The exact select caps
    // at k via row_number; the frozen per-doc threshold cannot — so
    // the fit must make the degeneracy VISIBLE at seed time instead
    // of silently inflating every later batch's keep rate.
    val sci = "quantum entanglement spectral decomposition tensor manifold " * 5
    val targets = docsOf((1000L to 1009L).map(i => i -> sci): _*)
    val flat = docsOf((0L until 20L).map(i => i -> sci): _*)
    val errBuf = new java.io.ByteArrayOutputStream()
    val realErr = System.err
    val (_, _, kept) =
      try {
        System.setErr(new java.io.PrintStream(errBuf, true))
        PipelineQueries.dsirFitModel(flat, targets, keepFrac = 0.2)
      } finally System.setErr(realErr)
    // behavior documented: the flat seed keeps everything...
    assert(kept.count() == 20L, "one-bin seed keeps 100% by construction")
    // ...and says so loudly, naming realized vs requested
    val err = errBuf.toString
    assert(err.contains("DEGENERATE"), s"expected a degenerate-fit warning, got: $err")
    assert(err.contains("20 of 20"), err)
    // a seed with real signal stays quiet (no cry-wolf warnings)
    val spo = "goalkeeper penalty halftime referee offside striker " * 5
    val mixed = docsOf(((0L until 10L).map(i => i -> sci) ++
      (10L until 20L).map(i => i -> spo)): _*)
    val errBuf2 = new java.io.ByteArrayOutputStream()
    try {
      System.setErr(new java.io.PrintStream(errBuf2, true))
      PipelineQueries.dsirFitModel(mixed, targets, keepFrac = 0.5)
    } finally System.setErr(realErr)
    assert(!errBuf2.toString.contains("DEGENERATE"),
      s"a separable seed must not warn: ${errBuf2.toString}")
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

  test("shard: complete contiguous positions, balanced shards, order decorrelated from doc_id") {
    val docs = (0L until 4000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val sh = PipelineQueries.shardDocs(docs, 16).cache()
    assert(sh.count() == 4000)
    // every shard's positions are exactly 1..count (no gaps, no dups)
    val perShard = sh.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("shard_pos").as("mx"), min("shard_pos").as("mn"),
        countDistinct("shard_pos").as("d"))
      .collect()
    assert(perShard.length == 16)
    perShard.foreach { r =>
      // columns: shard, n, max(pos), min(pos), distinct(pos)
      assert(r.getLong(2) == r.getLong(1) && r.getLong(3) == 1L &&
        r.getLong(4) == r.getLong(1),
        s"positions must be a contiguous 1..n permutation: $r")
      // affine-residue assignment is near-uniform on a contiguous id range
      assert(r.getLong(1) > 150 && r.getLong(1) < 350, s"shard imbalance: $r")
    }
    // the within-shard order must actually shuffle: a monotone map of
    // doc_id -> shard_pos would keep source adjacency (what a training
    // shuffle exists to break). Count order inversions per shard.
    val rows = sh.orderBy("shard", "shard_pos").collect()
      .groupBy(_.getLong(1)).values
    val someInverted = rows.forall { shard =>
      val ids = shard.sortBy(_.getLong(2)).map(_.getLong(0))
      ids.sliding(2).count(p => p.length == 2 && p(0) > p(1)) > ids.length / 10
    }
    assert(someInverted, "within-shard order must decorrelate from doc_id order")
    // pure function of the key: identical across runs
    val again = PipelineQueries.shardDocs(docs, 16)
    assert(sh.exceptAll(again).isEmpty && again.exceptAll(sh).isEmpty)
  }
}
