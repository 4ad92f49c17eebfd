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
