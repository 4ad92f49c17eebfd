package graft.queries

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

/** corpus_scrub: cross-document repeated-span removal. The gate oracle
  * pins the full arithmetic (chunking, seed-11 Horner fold, distinct-doc
  * frequency, rebuild) against DuckDB at sf0.01; these specs pin the
  * CONTRACT — what gets removed, what is guaranteed untouched, the
  * boundary-alignment rule, the hash parity between the frequency pass
  * (RollingHash expression) and the rebuild pass (ScrubUtil.polyHash),
  * and the loud driver-collect guard. */
class PipelineScrubSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  // a 4-word span repeated VERBATIM and chunk-ALIGNED across docs
  private val boiler = "terms of service apply"
  private def uniq(i: Long) = s"doc $i unique body"

  test("scrub: an aligned span shared by >= minDocs docs is removed everywhere") {
    // w=4: every doc is [boiler][unique] — boiler occupies chunk 0
    val in = docsOf((0L until 5L).map(i => i -> s"$boiler ${uniq(i)}"): _*)
    val out = PipelineQueries.scrubDocs(in, chunkWords = 4, minDocs = 3)
      .orderBy("doc_id").collect()
    assert(out.length == 5)
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getString(1) == uniq(i.toLong), s"doc $i: ${r.getString(1)}")
      assert(r.getLong(2) == 2L && r.getLong(3) == 1L)
    }
  }

  test("scrub: below the frequency floor nothing is removed and text is byte-identical") {
    val in = docsOf(
      0L -> s"$boiler ${uniq(0)}",
      1L -> s"$boiler ${uniq(1)}", // df = 2 < minDocs = 3
      2L -> uniq(2))
    val out = PipelineQueries.scrubDocs(in, chunkWords = 4, minDocs = 3)
      .orderBy("doc_id").collect()
    assert(out.map(_.getString(1)).toSeq ==
      Seq(s"$boiler ${uniq(0)}", s"$boiler ${uniq(1)}", uniq(2)))
    assert(out.forall(_.getLong(3) == 0L))
  }

  test("scrub: the span must be chunk-aligned to detect — the documented boundary contract") {
    // doc 2 carries the same words OFFSET by one, so its copy starts
    // mid-chunk and must survive even though docs 0,1,3 lose theirs
    val in = docsOf(
      0L -> s"$boiler a b c d",
      1L -> s"$boiler e f g h",
      3L -> s"$boiler i j k l",
      2L -> s"x $boiler m n o")
    val out = PipelineQueries.scrubDocs(in, chunkWords = 4, minDocs = 3)
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == "a b c d")
    assert(out(1).getString(1) == "e f g h")
    assert(out(2).getString(1) == s"x $boiler m n o") // unaligned copy kept
    assert(out(3).getString(1) == "i j k l")
  }

  test("scrub: within-doc repetition alone does not qualify (distinct-doc frequency)") {
    val in = docsOf(
      0L -> s"$boiler $boiler $boiler", // 3 copies, 1 doc
      1L -> uniq(1), 2L -> uniq(2))
    val out = PipelineQueries.scrubDocs(in, chunkWords = 4, minDocs = 3)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(3) == 0L, "one doc repeating itself is not cross-doc boilerplate")
  }

  test("scrub: a doc that is ALL boilerplate scrubs to the empty string") {
    val in = docsOf(
      0L -> boiler, 1L -> boiler, 2L -> boiler,
      3L -> s"$boiler ${uniq(3)}")
    val out = PipelineQueries.scrubDocs(in, chunkWords = 4, minDocs = 3)
      .orderBy("doc_id").collect()
    assert(out.take(3).forall(r => r.getString(1) == "" &&
      r.getLong(2) == 1L && r.getLong(3) == 1L))
    assert(out(3).getString(1) == uniq(3))
  }

  test("scrub: hash parity — RollingHash expression equals ScrubUtil.polyHash") {
    // the frequency pass hashes via the expression, the rebuild via
    // the compiled helper; a drift between them silently un-scrubs
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => ofExpr, expression => toExpr}
    val samples = Seq("", "a", "terms of service apply",
      "x" * 300, "mixed CASE and 123 digits", "éü non-ascii bytes")
    val viaExpr = samples.toDF("s")
      .select(ofExpr(graft.functions.expr.RollingHash(toExpr(col("s")),
        PipelineQueries.ScrubSeed, PipelineQueries.ScrubP)))
      .collect().map(_.getLong(0)).toSeq
    val viaUtil = samples.map(s => graft.functions.expr.ScrubUtil.polyHash(
      UTF8String.fromString(s), PipelineQueries.ScrubSeed, PipelineQueries.ScrubP))
    assert(viaExpr == viaUtil)
  }

  test("scrub: a first-fold hash collision must not delete innocent text (packed key verifies)") {
    // brute-force a real 31-bit collision: two DIFFERENT words with
    // equal seed-11 folds mod 2^31−1 (~2^16 candidates by birthday).
    // Same-length collisions persist under every seed with the same
    // base and modulus — which is why the second fold changes the
    // modulus, and what this test would catch regressing.
    import graft.functions.expr.ScrubUtil.polyHash
    def h1(s: String) = polyHash(UTF8String.fromString(s),
      PipelineQueries.ScrubSeed, PipelineQueries.ScrubP)
    val seen = scala.collection.mutable.HashMap.empty[Long, String]
    val (hot, innocent) = Iterator.from(0).map(i => s"w$i")
      .map(w => (seen.getOrElseUpdate(h1(w), w), w))
      .collectFirst { case (prev, w) if prev != w => (prev, w) }.get
    assert(hot != innocent && h1(hot) == h1(innocent), "fixture premise: a true h1 collision")
    val in = docsOf(
      0L -> hot, 1L -> hot, 2L -> hot, // the span genuinely hot in 3 docs
      3L -> innocent)                  // collides on fold 1 ONLY
    val out = PipelineQueries.scrubDocs(in, chunkWords = 1, minDocs = 3)
      .orderBy("doc_id").collect()
    assert(out.take(3).forall(_.getString(1) == ""), "the real hot span is removed")
    assert(out(3).getString(1) == innocent,
      s"a chunk colliding on one fold must survive — '$innocent' vs hot '$hot'")
  }

  test("scrub: sub-width tail chunks never become hot — shared tails and short docs survive") {
    // 3 docs share a 1-word tail chunk (5 words at w=4 ⇒ tail width 1):
    // a shared short tail is not boilerplate evidence
    val tails = docsOf(
      0L -> "alpha beta gamma delta end",
      1L -> "one two three four end",
      2L -> "red green blue white end")
    val out = PipelineQueries.scrubDocs(tails, chunkWords = 4, minDocs = 3)
      .orderBy("doc_id").collect()
    assert(out.forall(_.getLong(3) == 0L),
      s"shared sub-width tails must not scrub: ${out.map(_.getString(1)).toSeq}")
    // whole short docs (below chunk width) are likewise never evidence
    val shorts = docsOf(0L -> "hello world", 1L -> "hello world",
      2L -> "hello world", 3L -> "hello world")
    val out2 = PipelineQueries.scrubDocs(shorts, chunkWords = 4, minDocs = 3)
      .collect()
    assert(out2.forall(r => r.getString(1) == "hello world" && r.getLong(3) == 0L))
  }

  test("scrub: hot-span table overflow fails loudly, not by truncation") {
    // w=1, minDocs=2 over docs sharing every word ⇒ every word is a
    // hot span; cap of 3 must throw, naming the cap
    val in = docsOf(
      0L -> "a b c d e f", 1L -> "a b c d e f", 2L -> "a b c d e f")
    val e = intercept[IllegalArgumentException] {
      PipelineQueries.scrubDocs(in, chunkWords = 1, minDocs = 2, maxSpans = 3)
    }
    assert(e.getMessage.contains("hot-span table"))
  }

  test("scrub gate entry: every sf0.001 doc comes back exactly once, chunk accounting consistent") {
    val out = PipelineQueries.corpusScrub(spark, sf("x")).collect()
    val docs = graft.sources.Tables.load(spark, sf("x"), "documents").count()
    assert(out.length.toLong == docs)
    assert(out.forall(r => r.getLong(3) >= 0L && r.getLong(3) <= r.getLong(2)))
    // n_chunks must equal ceil(words/20) independently recomputed
    val words = graft.sources.Tables.load(spark, sf("x"), "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.col("text"), " ")).as("nw"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.foreach { r =>
      val expect = math.max(1, (words(r.getLong(0)) + 19) / 20)
      assert(r.getLong(2) == expect.toLong, s"doc ${r.getLong(0)}")
    }
  }
}
