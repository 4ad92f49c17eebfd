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

/** The WHOLE corpus-side IVF-PQ encode in one codegen pass:
  * `struct(cell, codes, cn)` from a raw vector — optional OPQ
  * rotation (empty array = identity), coarse-cell argmin, residual
  * against the chosen centroid, per-subspace code argmin, and the L2
  * norm, all over ONE rotated buffer.
  *
  * Exists because the composed spelling
  * (`PqEncode(CentroidResidual(vec, ivfAssign(vec), …))` over a
  * rotated `vec`) references the rotated vector from ~19 expression
  * sites after CollapseProject, and neither a repartition (the
  * optimizer pulls a deterministic project above any exchange) nor
  * codegen subexpression elimination (the argmin sites live inside
  * array_sort/struct trees) stops the 4096-FLOP MatVecFloat from
  * re-running per site — measured 2× on the whole composed search at
  * sf0.1. One expression = one rotation per row, no barrier, nothing
  * materialized — the shape [[graft.similarity.PqIndex]] encodes a
  * 100 TB corpus through.
  *
  * Arithmetic mirrors the composed path EXACTLY (same float/double
  * casts, same fold order, strict-< argmin with ties to the lower id,
  * matching `Similarity.probeCells`'s `‖c‖² − 2·v·c` ranking), so
  * swapping it in changes no results. */
case class IvfPqEncode(child: Expression, rotation: Array[Float],
                       centroids: Array[Array[Float]],
                       codebooks: Array[Float], m: Int, k: Int, subDim: Int)
    extends UnaryExpression {

  private val dim = m * subDim
  require(rotation.isEmpty || rotation.length == dim * dim, "rotation shape mismatch")
  require(centroids.forall(_.length == dim), "centroid dim mismatch")
  require(codebooks.length == m * k * subDim, "codebook shape mismatch")

  // ‖c‖² per cell, driver-side, same fold as probeCells' literal
  private val cellNorm2: Array[Double] =
    centroids.map(_.map(x => x.toDouble * x.toDouble).sum)

  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("cn", DoubleType, nullable = false)))
  override def prettyName: String = "ivf_pq_encode"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    require(x.numElements() == dim, s"vector dim ${x.numElements()} != $dim")
    val v = new Array[Float](dim)
    if (rotation.isEmpty) {
      var d = 0
      while (d < dim) { v(d) = x.getFloat(d); d += 1 }
    } else {
      var i = 0
      while (i < dim) {
        var acc = 0.0
        var j = 0
        while (j < dim) { acc += rotation(i * dim + j).toDouble * x.getFloat(j).toDouble; j += 1 }
        v(i) = acc.toFloat
        i += 1
      }
    }
    var n2 = 0.0
    var d = 0
    while (d < dim) { n2 += v(d).toDouble * v(d).toDouble; d += 1 }
    var cell = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val ctr = centroids(c)
      var dot = 0.0
      var t = 0
      while (t < dim) { dot += v(t).toDouble * ctr(t).toDouble; t += 1 }
      val dist = cellNorm2(c) - 2.0 * dot
      if (dist < bestD) { bestD = dist; cell = c }
      c += 1
    }
    val ctr = centroids(cell)
    val r = new Array[Float](dim)
    var t = 0
    while (t < dim) { r(t) = v(t) - ctr(t); t += 1 }
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bd = Double.MaxValue
      var cc = 0
      while (cc < k) {
        var d2 = 0.0
        var dd = 0
        while (dd < subDim) {
          val diff = r(j * subDim + dd).toDouble - codebooks((j * k + cc) * subDim + dd)
          d2 += diff * diff
          dd += 1
        }
        if (d2 < bd) { bd = d2; best = cc }
        cc += 1
      }
      codes(j) = best
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](cell, new GenericArrayData(codes), math.sqrt(n2)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rot = ctx.addReferenceObj("opqRotation", rotation, "float[]")
    val cs = ctx.addReferenceObj("ivfCentroids", centroids, "float[][]")
    val cn2 = ctx.addReferenceObj("cellNorm2", cellNorm2, "double[]")
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "float[]")
    nullSafeCodeGen(ctx, ev, x => {
      val v = ctx.freshName("v"); val r = ctx.freshName("r")
      val n2 = ctx.freshName("n2"); val cell = ctx.freshName("cell")
      val bestD = ctx.freshName("bestD"); val codes = ctx.freshName("codes")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val d = ctx.freshName("d")
      val acc = ctx.freshName("acc"); val ctr = ctx.freshName("ctr")
      val dist = ctx.freshName("dist"); val best = ctx.freshName("best")
      val bd = ctx.freshName("bd"); val d2 = ctx.freshName("d2")
      val diff = ctx.freshName("diff"); val fields = ctx.freshName("fields")
      s"""
         |if ($x.numElements() != $dim) {
         |  throw new IllegalArgumentException("vector dim " + $x.numElements() + " != $dim");
         |}
         |final float[] $v = new float[$dim];
         |if ($rot.length == 0) {
         |  for (int $i = 0; $i < $dim; $i++) { $v[$i] = $x.getFloat($i); }
         |} else {
         |  for (int $i = 0; $i < $dim; $i++) {
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      $acc += ((double) $rot[$i * $dim + $j]) * ((double) $x.getFloat($j));
         |    }
         |    $v[$i] = (float) $acc;
         |  }
         |}
         |double $n2 = 0.0;
         |for (int $i = 0; $i < $dim; $i++) { $n2 += ((double) $v[$i]) * ((double) $v[$i]); }
         |int $cell = 0; double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < ${centroids.length}; $c++) {
         |  final float[] $ctr = $cs[$c];
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $acc += ((double) $v[$i]) * ((double) $ctr[$i]);
         |  }
         |  final double $dist = $cn2[$c] - 2.0 * $acc;
         |  if ($dist < $bestD) { $bestD = $dist; $cell = $c; }
         |}
         |final float[] $r = new float[$dim];
         |for (int $i = 0; $i < $dim; $i++) { $r[$i] = $v[$i] - $cs[$cell][$i]; }
         |final int[] $codes = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $best = 0; double $bd = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $d2 = 0.0;
         |    for (int $d = 0; $d < $subDim; $d++) {
         |      final double $diff = ((double) $r[$j * $subDim + $d])
         |        - $cb[($j * $k + $c) * $subDim + $d];
         |      $d2 += $diff * $diff;
         |    }
         |    if ($d2 < $bd) { $bd = $d2; $best = $c; }
         |  }
         |  $codes[$j] = $best;
         |}
         |Object[] $fields = new Object[3];
         |$fields[0] = $cell;
         |$fields[1] = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |$fields[2] = java.lang.Math.sqrt($n2);
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow($fields);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): IvfPqEncode =
    copy(child = newChild)
}

/** The query-side twin of [[IvfPqEncode]]: rotation (optional), the
  * ADC lookup table, the query norm, and the `nProbe` closest cells
  * WITH their exact query·centroid dots, in one codegen pass over one
  * rotated buffer — `struct(lut, qn, probes: array<(cell, cdot)>)`.
  * Same motivation (the composed spelling re-evaluates the rotated
  * query from every consumer site) and the same arithmetic as the
  * composed path: PqLut's fold for the LUT, FloatVectorNorm's fold
  * for the norm, probeCells' `‖c‖² − 2·v·c` ranking with ties to the
  * lower cell id, and CentroidDot-style direct folds for the dot
  * (kept from the ranking pass, never reconstructed algebraically —
  * float rounding would diverge). */
case class IvfPqProbe(child: Expression, rotation: Array[Float],
                      centroids: Array[Array[Float]],
                      codebooks: Array[Float], m: Int, k: Int, subDim: Int,
                      nProbe: Int)
    extends UnaryExpression {

  private val dim = m * subDim
  require(rotation.isEmpty || rotation.length == dim * dim, "rotation shape mismatch")
  require(centroids.forall(_.length == dim), "centroid dim mismatch")
  require(codebooks.length == m * k * subDim, "codebook shape mismatch")
  require(nProbe >= 1 && nProbe <= centroids.length, "nProbe out of range")

  private val cellNorm2: Array[Double] =
    centroids.map(_.map(x => x.toDouble * x.toDouble).sum)

  override def dataType: DataType = StructType(Seq(
    StructField("lut", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("qn", DoubleType, nullable = false),
    StructField("probes", ArrayType(StructType(Seq(
      StructField("cell", IntegerType, nullable = false),
      StructField("cdot", DoubleType, nullable = false))), containsNull = false),
      nullable = false)))
  override def prettyName: String = "ivf_pq_probe"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    require(x.numElements() == dim, s"vector dim ${x.numElements()} != $dim")
    val v = new Array[Float](dim)
    if (rotation.isEmpty) {
      var d = 0
      while (d < dim) { v(d) = x.getFloat(d); d += 1 }
    } else {
      var i = 0
      while (i < dim) {
        var acc = 0.0
        var j = 0
        while (j < dim) { acc += rotation(i * dim + j).toDouble * x.getFloat(j).toDouble; j += 1 }
        v(i) = acc.toFloat
        i += 1
      }
    }
    val lut = new Array[Double](m * k)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < k) {
        var acc = 0.0
        var d = 0
        while (d < subDim) {
          acc += v(j * subDim + d).toDouble * codebooks((j * k + c) * subDim + d)
          d += 1
        }
        lut(j * k + c) = acc
        c += 1
      }
      j += 1
    }
    var n2 = 0.0
    var d = 0
    while (d < dim) { n2 += v(d).toDouble * v(d).toDouble; d += 1 }
    val nc = centroids.length
    val dots = new Array[Double](nc)
    val dists = new Array[Double](nc)
    var c = 0
    while (c < nc) {
      val ctr = centroids(c)
      var acc = 0.0
      var t = 0
      while (t < dim) { acc += v(t).toDouble * ctr(t).toDouble; t += 1 }
      dots(c) = acc
      dists(c) = cellNorm2(c) - 2.0 * acc
      c += 1
    }
    // nProbe smallest by (dist, cell) — selection over ≤ a few dozen
    // cells; `used` marks already-taken cells so ties fall to the
    // next-lower id exactly like array_sort on (d, cell) structs
    val probes = new Array[Any](nProbe)
    val used = new Array[Boolean](nc)
    var p = 0
    while (p < nProbe) {
      var best = -1
      var c2 = 0
      while (c2 < nc) {
        if (!used(c2) && (best < 0 || dists(c2) < dists(best))) best = c2
        c2 += 1
      }
      used(best) = true
      probes(p) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](best, dots(best)))
      p += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      new GenericArrayData(lut), math.sqrt(n2), new GenericArrayData(probes)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rot = ctx.addReferenceObj("opqRotation", rotation, "float[]")
    val cs = ctx.addReferenceObj("ivfCentroids", centroids, "float[][]")
    val cn2 = ctx.addReferenceObj("cellNorm2", cellNorm2, "double[]")
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "float[]")
    val nc = centroids.length
    nullSafeCodeGen(ctx, ev, x => {
      val v = ctx.freshName("v"); val lut = ctx.freshName("lut")
      val n2 = ctx.freshName("n2"); val dots = ctx.freshName("dots")
      val dists = ctx.freshName("dists"); val used = ctx.freshName("used")
      val probes = ctx.freshName("probes"); val fields = ctx.freshName("fields")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val d = ctx.freshName("d")
      val acc = ctx.freshName("acc"); val ctr = ctx.freshName("ctr")
      val p = ctx.freshName("p"); val best = ctx.freshName("best")
      s"""
         |if ($x.numElements() != $dim) {
         |  throw new IllegalArgumentException("vector dim " + $x.numElements() + " != $dim");
         |}
         |final float[] $v = new float[$dim];
         |if ($rot.length == 0) {
         |  for (int $i = 0; $i < $dim; $i++) { $v[$i] = $x.getFloat($i); }
         |} else {
         |  for (int $i = 0; $i < $dim; $i++) {
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      $acc += ((double) $rot[$i * $dim + $j]) * ((double) $x.getFloat($j));
         |    }
         |    $v[$i] = (float) $acc;
         |  }
         |}
         |final double[] $lut = new double[${m * k}];
         |for (int $j = 0; $j < $m; $j++) {
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $subDim; $d++) {
         |      $acc += ((double) $v[$j * $subDim + $d])
         |        * $cb[($j * $k + $c) * $subDim + $d];
         |    }
         |    $lut[$j * $k + $c] = $acc;
         |  }
         |}
         |double $n2 = 0.0;
         |for (int $i = 0; $i < $dim; $i++) { $n2 += ((double) $v[$i]) * ((double) $v[$i]); }
         |final double[] $dots = new double[$nc];
         |final double[] $dists = new double[$nc];
         |for (int $c = 0; $c < $nc; $c++) {
         |  final float[] $ctr = $cs[$c];
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $acc += ((double) $v[$i]) * ((double) $ctr[$i]);
         |  }
         |  $dots[$c] = $acc;
         |  $dists[$c] = $cn2[$c] - 2.0 * $acc;
         |}
         |final boolean[] $used = new boolean[$nc];
         |final Object[] $probes = new Object[$nProbe];
         |for (int $p = 0; $p < $nProbe; $p++) {
         |  int $best = -1;
         |  for (int $c = 0; $c < $nc; $c++) {
         |    if (!$used[$c] && ($best < 0 || $dists[$c] < $dists[$best])) $best = $c;
         |  }
         |  $used[$best] = true;
         |  $probes[$p] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[] { $best, $dots[$best] });
         |}
         |Object[] $fields = new Object[3];
         |$fields[0] = new org.apache.spark.sql.catalyst.util.GenericArrayData($lut);
         |$fields[1] = java.lang.Math.sqrt($n2);
         |$fields[2] = new org.apache.spark.sql.catalyst.util.GenericArrayData($probes);
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow($fields);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): IvfPqProbe =
    copy(child = newChild)
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
