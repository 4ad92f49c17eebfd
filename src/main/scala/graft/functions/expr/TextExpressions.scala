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
