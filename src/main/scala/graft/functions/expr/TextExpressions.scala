package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shingling helpers shared by eval and generated code. */
object ShingleUtil {
  private val SPACE = UTF8String.fromString(" ")

  /** Literal single-space split keeping empty tokens — byte-identical
    * to Spark's `split(text, " ")` and DuckDB's `string_split(text, ' ')`. */
  def splitWords(s: UTF8String): Array[UTF8String] = s.split(SPACE, -1)

  /** Word k-shingles joined by single spaces; optionally de-duplicated
    * (insertion order preserved, matching array_distinct semantics). */
  def shingles(s: UTF8String, k: Int, distinct: Boolean): ArrayData = {
    val words = splitWords(s)
    val n = words.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[UTF8String](n)
    val seen = if (distinct) new java.util.HashSet[UTF8String](n * 2) else null
    val buf = new Array[UTF8String](k)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < k) { buf(j) = words(i + j); j += 1 }
      val sh = UTF8String.concatWs(SPACE, buf: _*)
      if (!distinct || seen.add(sh)) out.add(sh)
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }
}

/** Polynomial rolling hash over the UTF-8 bytes of a string:
  * Horner fold `acc = (acc*31 + byte) mod p` from a seed — modular
  * (ANSI-safe) and one compiled loop instead of a per-character
  * interpreted HOF over `split(text, "")`. */
case class RollingHash(child: Expression, seed: Long, p: Long)
    extends UnaryExpression {

  require(p > 0 && p <= (Long.MaxValue / 32), "31*p + 255 must fit a long")

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(a: Any): Any = {
    val bytes = a.asInstanceOf[UTF8String].getBytes
    var acc = seed % p
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31L + (bytes(i) & 0xFF)) % p
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val bytes = ctx.freshName("bytes")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |final byte[] $bytes = $x.getBytes();
         |long $acc = ${seed}L % ${p}L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $acc = ($acc * 31L + ($bytes[$i] & 0xFF)) % ${p}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/** Word k-shingles of a string column as ONE native expression.
  *
  * The composed form (`array_distinct(transform(sequence(...), i ->
  * concat_ws(...)))`) walks an interpreted expression tree per shingle
  * — measured ~1.6 ms/doc, which made shingling dominate every dedup
  * query. This expression is a single compiled loop (~20 µs/doc). */
case class WordShingles(child: Expression, k: Int, distinct: Boolean = true)
    extends UnaryExpression {

  require(k >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(a: Any): Any =
    ShingleUtil.shingles(a.asInstanceOf[UTF8String], k, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"""
         |${ev.value} = graft.functions.expr.ShingleUtil$$.MODULE$$.shingles($x, $k, $distinct);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Membership test against a pre-built long-key bloom filter — the
  * broadcast-prefilter primitive for decontamination at eval-suite
  * scale. The filter travels as its serialized BYTES (a few MB for
  * 1e7 grams at 0.1% fpp) and is deserialized once per executor via
  * the codegen reference array — never inlined into generated source,
  * same pattern as the PQ codebooks. May false-positive (callers must
  * exact-verify hits), never false-negatives: a filter that drops a
  * true hit would silently un-flag contaminated training text. */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes))

  override protected def nullSafeEval(a: Any): Any =
    bloom.mightContainLong(a.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("gramBloom", bloom,
      "org.apache.spark.util.sketch.BloomFilter")
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $bf.mightContainLong($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

/** Chunking + scrub core shared by [[WordChunks]] and [[ScrubText]].
  *
  * A "chunk" is one of the ⌈|words|/w⌉ NON-overlapping w-word spans
  * of a single-space-split document, rejoined with single spaces —
  * the span granularity of the cross-document boilerplate scrub
  * (reference: C4/RefinedWeb-style repeated-passage removal; the
  * detection half is TextQueries.textBoilerplate). Alignment is part
  * of the contract: a span duplicated across documents is scrubbed
  * only where both copies start on a w-word boundary — the same
  * boundary convention line-based scrubbers inherit from '\n'. */
object ScrubUtil {
  private val SPACE = UTF8String.fromString(" ")

  /** Same Horner fold as [[RollingHash]] (kept textually in sync —
    * RollingHashParitySpec pins equality), callable from the scrub
    * loop without building an expression per chunk. */
  def polyHash(s: UTF8String, seed: Long, p: Long): Long = {
    val bytes = s.getBytes
    var acc = seed % p
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31L + (bytes(i) & 0xFF)) % p
      i += 1
    }
    acc
  }

  /** Non-overlapping `w`-word chunks; `split` of any string yields at
    * least one (possibly empty) word, so every document has ≥ 1 chunk. */
  def chunkArray(s: UTF8String, w: Int): Array[UTF8String] = {
    val words = ShingleUtil.splitWords(s)
    val n = (words.length + w - 1) / w
    val out = new Array[UTF8String](math.max(1, n))
    var c = 0
    while (c < out.length) {
      val from = c * w
      val len = math.max(0, math.min(w, words.length - from))
      val buf = new Array[UTF8String](len)
      var j = 0
      while (j < len) { buf(j) = words(from + j); j += 1 }
      out(c) = UTF8String.concatWs(SPACE, buf: _*)
      c += 1
    }
    out
  }

  def chunks(s: UTF8String, w: Int): ArrayData =
    new GenericArrayData(chunkArray(s, w).asInstanceOf[Array[AnyRef]])

  /** One compiled pass: chunk, hash into the packed two-fold span key
    * (h₁·2³¹ + h₂ — the frequency pass's key, see
    * PipelineQueries.scrubDocs for why one 31-bit fold is not enough),
    * binary-search the sorted hot-span table, rejoin survivors →
    * struct(text_scrubbed, n_chunks, n_scrubbed). */
  def scrub(s: UTF8String, w: Int, seed: Long, p: Long, seed2: Long, p2: Long,
            hot: Array[Long]): org.apache.spark.sql.catalyst.InternalRow = {
    val cs = chunkArray(s, w)
    val kept = new java.util.ArrayList[UTF8String](cs.length)
    var scrubbed = 0
    var i = 0
    while (i < cs.length) {
      val key = polyHash(cs(i), seed, p) * 2147483648L + polyHash(cs(i), seed2, p2)
      if (java.util.Arrays.binarySearch(hot, key) >= 0) scrubbed += 1
      else kept.add(cs(i))
      i += 1
    }
    val joined = UTF8String.concatWs(SPACE,
      kept.toArray(new Array[UTF8String](kept.size())): _*)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](joined, cs.length, scrubbed))
  }
}

/** Non-overlapping `w`-word chunks of a document as one compiled
  * expression — the span unit of the repeated-passage scrub (and a
  * frequency-pass primitive: explode → hash → document frequency). */
case class WordChunks(child: Expression, w: Int) extends UnaryExpression {

  require(w >= 1, "chunk width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_chunks"

  override protected def nullSafeEval(a: Any): Any =
    ScrubUtil.chunks(a.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.expr.ScrubUtil$$.MODULE$$.chunks($x, $w);")

  override protected def withNewChildInternal(newChild: Expression): WordChunks =
    copy(child = newChild)
}

/** Scan-local repeated-span removal: rebuild a document with every
  * chunk whose poly-hash appears in the SORTED `hot` table removed.
  * The table travels via the codegen reference array (same pattern as
  * the PQ codebooks / gram bloom — never inlined into generated
  * source) and is probed by binary search: O(chunks · log |hot|) per
  * row, no join, no shuffle — document text never leaves its scan
  * partition. Returns struct(text_scrubbed, n_chunks, n_scrubbed). */
case class ScrubText(child: Expression, w: Int, seed: Long, p: Long,
                     seed2: Long, p2: Long,
                     hot: Array[Long]) extends UnaryExpression {

  require(w >= 1, "chunk width must be >= 1")
  require(p != p2,
    "the two folds must use different moduli — same-length collisions " +
      "under one (base, p) persist under every seed, so a seed-only " +
      "second fold verifies nothing")
  require(hot.length <= 1 || (1 until hot.length).forall(i => hot(i - 1) <= hot(i)),
    "hot-span table must be sorted ascending (binary search)")

  override def dataType: DataType = StructType(Seq(
    StructField("text_scrubbed", StringType, nullable = false),
    StructField("n_chunks", IntegerType, nullable = false),
    StructField("n_scrubbed", IntegerType, nullable = false)))
  override def prettyName: String = "scrub_text"

  override protected def nullSafeEval(a: Any): Any =
    ScrubUtil.scrub(a.asInstanceOf[UTF8String], w, seed, p, seed2, p2, hot)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("hotSpans", hot, "long[]")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.expr.ScrubUtil$$.MODULE$$.scrub(" +
        s"$x, $w, ${seed}L, ${p}L, ${seed2}L, ${p2}L, $tbl);")
  }

  override protected def withNewChildInternal(newChild: Expression): ScrubText =
    copy(child = newChild)
}
