package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization primitives (FAISS-style ADC), as native codegen
  * expressions. A vector of `m·subDim` floats is encoded as `m` small
  * centroid ids (one per subspace) — a ~`4·subDim`× compression that
  * lets a 100 TB embedding corpus fit a memory budget — and queries
  * score codes through a per-query lookup table of subspace dot
  * products (asymmetric distance computation: the query stays exact,
  * only the corpus is quantized).
  *
  * Codebooks are baked into the expressions as a flat float array
  * (layout `((j·k + c)·subDim + d)`), same pattern as
  * [[MinHashSignature]]'s coefficient arrays.
  */
case class PqEncode(child: Expression, codebooks: Array[Float], m: Int, k: Int, subDim: Int)
    extends UnaryExpression {

  require(codebooks.length == m * k * subDim, "codebook shape mismatch")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    require(x.numElements() == m * subDim, s"vector dim ${x.numElements()} != ${m * subDim}")
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        var d2 = 0.0
        var d = 0
        while (d < subDim) {
          val diff = x.getFloat(j * subDim + d).toDouble - codebooks((j * k + c) * subDim + d)
          d2 += diff * diff
          d += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "float[]")
    nullSafeCodeGen(ctx, ev, x => {
      val (j, c, d) = (ctx.freshName("j"), ctx.freshName("c"), ctx.freshName("d"))
      val (best, bestD, d2, diff) =
        (ctx.freshName("best"), ctx.freshName("bestD"), ctx.freshName("d2"), ctx.freshName("diff"))
      val out = ctx.freshName("out")
      s"""
         |if ($x.numElements() != ${m * subDim}) {
         |  throw new IllegalArgumentException("vector dim " + $x.numElements() + " != ${m * subDim}");
         |}
         |final int[] $out = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $best = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $d2 = 0.0;
         |    for (int $d = 0; $d < $subDim; $d++) {
         |      final double $diff = ((double) $x.getFloat($j * $subDim + $d))
         |        - $cb[($j * $k + $c) * $subDim + $d];
         |      $d2 += $diff * $diff;
         |    }
         |    if ($d2 < $bestD) { $bestD = $d2; $best = $c; }
         |  }
         |  $out[$j] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Per-query ADC lookup table: `lut[j·k + c] = Σ_d q[j·subDim+d] ·
  * codebook[j][c][d]` — the query's exact dot product with every
  * centroid of every subspace (m·k doubles per query row). */
case class PqLut(child: Expression, codebooks: Array[Float], m: Int, k: Int, subDim: Int)
    extends UnaryExpression {

  require(codebooks.length == m * k * subDim, "codebook shape mismatch")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    require(x.numElements() == m * subDim, s"vector dim ${x.numElements()} != ${m * subDim}")
    val out = new Array[Double](m * k)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < k) {
        var acc = 0.0
        var d = 0
        while (d < subDim) {
          acc += x.getFloat(j * subDim + d).toDouble * codebooks((j * k + c) * subDim + d)
          d += 1
        }
        out(j * k + c) = acc
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "float[]")
    nullSafeCodeGen(ctx, ev, x => {
      val (j, c, d) = (ctx.freshName("j"), ctx.freshName("c"), ctx.freshName("d"))
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      s"""
         |if ($x.numElements() != ${m * subDim}) {
         |  throw new IllegalArgumentException("vector dim " + $x.numElements() + " != ${m * subDim}");
         |}
         |final double[] $out = new double[${m * k}];
         |for (int $j = 0; $j < $m; $j++) {
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $subDim; $d++) {
         |      $acc += ((double) $x.getFloat($j * $subDim + $d))
         |        * $cb[($j * $k + $c) * $subDim + $d];
         |    }
         |    $out[$j * $k + $c] = $acc;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** Residual against a coarse centroid: `vec − centroids[cell]`, the
  * IVFADC refinement — PQ codebooks quantize the (much lower-variance)
  * residual instead of the raw vector, buying recall at the same
  * bits/vector. Centroids ride along as a literal float[][]. */
case class CentroidResidual(left: Expression, right: Expression,
                            centroids: Array[Array[Float]])
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "centroid_residual"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val ctr = centroids(b.asInstanceOf[Int])
    require(x.numElements() == ctr.length, "vector/centroid dim mismatch")
    val out = new Array[Float](ctr.length)
    var d = 0
    while (d < ctr.length) { out(d) = x.getFloat(d) - ctr(d); d += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = ctx.addReferenceObj("ivfCentroids", centroids, "float[][]")
    nullSafeCodeGen(ctx, ev, (x, cell) => {
      val (ctr, out, d) = (ctx.freshName("ctr"), ctx.freshName("out"), ctx.freshName("d"))
      s"""
         |final float[] $ctr = $cs[$cell];
         |if ($x.numElements() != $ctr.length) {
         |  throw new IllegalArgumentException("vector/centroid dim mismatch");
         |}
         |final float[] $out = new float[$ctr.length];
         |for (int $d = 0; $d < $ctr.length; $d++) {
         |  $out[$d] = $x.getFloat($d) - $ctr[$d];
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CentroidResidual =
    copy(left = newLeft, right = newRight)
}

/** `dot(vec, centroids[cell])` in double — the exact query-to-centroid
  * term of the residual-ADC cosine:
  * `dot(q, x̂) = dot(q, c_cell) + dot(q, r̂)`. */
case class CentroidDot(left: Expression, right: Expression,
                       centroids: Array[Array[Float]])
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "centroid_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val ctr = centroids(b.asInstanceOf[Int])
    require(x.numElements() == ctr.length, "vector/centroid dim mismatch")
    var acc = 0.0
    var d = 0
    while (d < ctr.length) { acc += x.getFloat(d).toDouble * ctr(d).toDouble; d += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = ctx.addReferenceObj("ivfCentroids", centroids, "float[][]")
    nullSafeCodeGen(ctx, ev, (x, cell) => {
      val (ctr, acc, d) = (ctx.freshName("ctr"), ctx.freshName("acc"), ctx.freshName("d"))
      s"""
         |final float[] $ctr = $cs[$cell];
         |if ($x.numElements() != $ctr.length) {
         |  throw new IllegalArgumentException("vector/centroid dim mismatch");
         |}
         |double $acc = 0.0;
         |for (int $d = 0; $d < $ctr.length; $d++) {
         |  $acc += ((double) $x.getFloat($d)) * ((double) $ctr[$d]);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CentroidDot =
    copy(left = newLeft, right = newRight)
}

/** ADC score: `Σ_j lut[j·k + codes[j]]` — the approximate dot product
  * of the (exact) query against the quantized corpus vector. m array
  * lookups per pair instead of `m·subDim` multiplies. */
case class PqScore(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_score"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    var acc = 0.0
    var j = 0
    val m = codes.numElements()
    while (j < m) {
      acc += lut.getDouble(j * k + codes.getInt(j))
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val (j, mName, acc) = (ctx.freshName("j"), ctx.freshName("m"), ctx.freshName("acc"))
      s"""
         |final int $mName = $codes.numElements();
         |double $acc = 0.0;
         |for (int $j = 0; $j < $mName; $j++) {
         |  $acc += $lut.getDouble($j * $k + $codes.getInt($j));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqScore =
    copy(left = newLeft, right = newRight)
}
