package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for float-vector math.
  *
  * The HOF formulation (`aggregate(zip_with(...))`) is semantically
  * right but evaluates interpreted — per element it allocates, boxes,
  * and walks an expression tree. These expressions generate a tight
  * primitive loop inside WholeStageCodegen instead: measured ~100×
  * faster on 64-dim pair joins, which is the difference between the
  * embedding-dedup/ANN queries being usable and not at scale.
  *
  * Semantics match the HOF version exactly: strict left-to-right
  * double accumulation (same IEEE result), null if either input is
  * null. Mismatched lengths raise — vectors are fixed-dim by contract.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "fvec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(y.numElements() == n, s"vector length mismatch: $n vs ${y.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  throw new IllegalArgumentException("vector length mismatch: " + $n +
         |    " vs " + $y.numElements());
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

/** sqrt(Σ xᵢ²) with the same strict fold. */
case class FloatVectorNorm(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "fvec_norm"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      val v = x.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $x.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $v = (double) $x.getFloat($i);
         |  $acc += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FloatVectorNorm =
    copy(child = newChild)
}

/** 64-bit SimHash of an array of 64-bit hashes: per-bit ±1 votes,
  * sign-packed. One pass over the array with a 64-long counter block —
  * the HOF equivalent walks a 64-element array expression per input
  * element, interpreted. */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(a: Any): Any = {
    val hs = a.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = hs.numElements()
    while (i < n) {
      val h = hs.getLong(i)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1
        k += 1
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < 64) {
      if (votes(k) > 0) sig |= (1L << k)
      k += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |final int $n = $hs.numElements();
         |final int[] $votes = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $h = $hs.getLong($i);
         |  for (int $k = 0; $k < 64; $k++) {
         |    if ((($h >>> $k) & 1L) == 1L) $votes[$k]++; else $votes[$k]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $k = 0; $k < 64; $k++) {
         |  if ($votes[$k] > 0) $sig |= (1L << $k);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Dense matrix × float-vector product with a LITERAL row-major
  * matrix: `out[i] = Σ_j M[i·cols + j] · v[j]`, accumulated in double,
  * emitted as float. Used to apply OPQ's learned orthogonal rotation
  * before product quantization — one compiled loop per row, the
  * matrix rides as a codegen reference object. */
case class MatVecFloat(child: Expression, mat: Array[Float], rows: Int, cols: Int)
    extends UnaryExpression {

  require(mat.length == rows * cols, "matrix shape mismatch")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "matvec_float"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    require(x.numElements() == cols, s"vector dim ${x.numElements()} != $cols")
    val out = new Array[Float](rows)
    var i = 0
    while (i < rows) {
      var acc = 0.0
      var j = 0
      while (j < cols) { acc += mat(i * cols + j).toDouble * x.getFloat(j).toDouble; j += 1 }
      out(i) = acc.toFloat
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("matvecMat", mat, "float[]")
    nullSafeCodeGen(ctx, ev, x => {
      val (i, j, acc, out) =
        (ctx.freshName("i"), ctx.freshName("j"), ctx.freshName("acc"), ctx.freshName("out"))
      s"""
         |if ($x.numElements() != $cols) {
         |  throw new IllegalArgumentException("vector dim " + $x.numElements() + " != $cols");
         |}
         |final float[] $out = new float[$rows];
         |for (int $i = 0; $i < $rows; $i++) {
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $cols; $j++) {
         |    $acc += ((double) $m[$i * $cols + $j]) * ((double) $x.getFloat($j));
         |  }
         |  $out[$i] = (float) $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MatVecFloat =
    copy(child = newChild)
}

/** All LSH band keys of a float vector in ONE compiled pass: project
  * onto `planes` (literal hyperplanes baked into the expression), pack
  * the sign bits into a signature, emit `bands` keys of `bitsPerBand`
  * bits. The composed spelling (an OR-reduce of 24 `when(dot…)` terms
  * referenced by 4 band structs) gets its whole 24-dot tree inlined
  * into every struct by CollapseProject — this is one loop, one sig.
  * Bit/key layout matches VectorFunctions.rhpSignature /
  * Similarity.bandedSignatures exactly (dot ≥ 0 ⇒ bit k; key j =
  * (sig >>> j·bitsPerBand) & mask), so the DuckDB oracle's literal
  * reconstruction stays valid. */
case class RhpBandKeys(child: Expression, planes: Array[Array[Float]],
                       bands: Int, bitsPerBand: Int)
    extends UnaryExpression {

  require(planes.length == bands * bitsPerBand, "need one plane per signature bit")
  require(bands * bitsPerBand <= 63, "signature must fit a long")
  require(planes.forall(_.length == planes.head.length), "planes must share one dim")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rhp_band_keys"

  private val mask = (1L << bitsPerBand) - 1
  private val dim = planes.head.length

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    // guard the declared dim against the actual vector: a mismatch
    // (e.g. a wrong `dim` arg to the SQL wrapper) would otherwise
    // read out of bounds or silently sign only a prefix
    require(x.numElements() == dim, s"vector dim ${x.numElements()} != $dim")
    var sig = 0L
    var kk = 0
    while (kk < planes.length) {
      val p = planes(kk)
      var acc = 0.0
      var d = 0
      while (d < p.length) { acc += x.getFloat(d).toDouble * p(d).toDouble; d += 1 }
      if (acc >= 0) sig |= (1L << kk)
      kk += 1
    }
    val keys = new Array[Long](bands)
    var j = 0
    while (j < bands) { keys(j) = (sig >>> (j * bitsPerBand)) & mask; j += 1 }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("rhpPlanes", planes, "float[][]")
    nullSafeCodeGen(ctx, ev, x => {
      val sig = ctx.freshName("sig")
      val kk = ctx.freshName("kk")
      val p = ctx.freshName("p")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val keys = ctx.freshName("keys")
      val j = ctx.freshName("j")
      s"""
         |if ($x.numElements() != $dim) {
         |  throw new IllegalArgumentException("vector dim " + $x.numElements() + " != $dim");
         |}
         |long $sig = 0L;
         |for (int $kk = 0; $kk < ${planes.length}; $kk++) {
         |  final float[] $p = $planesRef[$kk];
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $p.length; $d++) {
         |    $acc += ((double) $x.getFloat($d)) * ((double) $p[$d]);
         |  }
         |  if ($acc >= 0) $sig |= (1L << $kk);
         |}
         |final long[] $keys = new long[$bands];
         |for (int $j = 0; $j < $bands; $j++) {
         |  $keys[$j] = ($sig >>> ($j * $bitsPerBand)) & ${mask}L;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RhpBandKeys =
    copy(child = newChild)
}

/** Count of positions where two equal-length `array<long>` columns
  * agree — the MinHash signature-match estimator (matches/numPerm ≈
  * Jaccard). The HOF spelling `aggregate(zip_with(a, b, eq), 0, +)`
  * never enters codegen (repo rule: HOFs interpret per element); this
  * is one compiled loop. */
case class SigMatchCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sig_match_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(y.numElements() == n, s"signature length mismatch: $n vs ${y.numElements()}")
    var matches = 0
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) matches += 1
      i += 1
    }
    matches
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      s"""
         |final int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  throw new IllegalArgumentException("signature length mismatch: " + $n +
         |    " vs " + $y.numElements());
         |}
         |int $m = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.getLong($i) == $y.getLong($i)) $m++;
         |}
         |${ev.value} = $m;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SigMatchCount =
    copy(left = newLeft, right = newRight)
}

/** MinHash signature: for each (aᵢ, bᵢ) permutation pair, the minimum
  * of (aᵢ·x + bᵢ) mod P over the input hashes x (pre-reduced mod P).
  * Output: array<long> of `a.length` minima. Coefficients are literal
  * arrays baked into the expression — one tight loop instead of
  * numPerm interpreted array_min(transform(...)) passes. */
case class MinHashSignature(child: Expression, as: Array[Long], bs: Array[Long], p: Long)
    extends UnaryExpression {

  require(as.length == bs.length, "coefficient arrays must align")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(a: Any): Any = {
    val hs = a.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val out = new Array[Long](as.length)
    var j = 0
    while (j < as.length) {
      var min = Long.MaxValue
      var i = 0
      while (i < n) {
        val h = hs.getLong(i)
        val v = (as(j) * h + bs(j)) % p
        if (v < min) min = v
        i += 1
      }
      out(j) = if (min == Long.MaxValue) 0L else min
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("minhashAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, hs => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val min = ctx.freshName("min")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $hs.numElements();
         |final long[] $out = new long[${as.length}];
         |for (int $j = 0; $j < ${as.length}; $j++) {
         |  long $min = Long.MAX_VALUE;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $h = $hs.getLong($i);
         |    final long $v = ($asRef[$j] * $h + $bsRef[$j]) % ${p}L;
         |    if ($v < $min) $min = $v;
         |  }
         |  $out[$j] = ($min == Long.MAX_VALUE) ? 0L : $min;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Random-hyperplane sign-bit signature WIDER than one long: bit `i`
  * of the packed `array<long>` output (word `i / 64`, bit `i % 64`)
  * is set when `dot(vec, planes(i)) >= 0` — the estimator signature
  * for streaming embedding near-dup state, where ~16 B of bits stand
  * in for a 256 B vector and `π·hamming/nBits` estimates the angle
  * (Charikar's SimHash bound). One codegen pass, planes baked in as
  * literals; same sign convention as [[RhpBandKeys]]/rhpSignature. */
case class RhpBitSignature(child: Expression, planes: Array[Array[Float]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.forall(_.length == planes.head.length),
    "planes must share one dim")

  private val dim = planes.head.length
  private val words = (planes.length + 63) / 64

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rhp_bit_signature"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    require(x.numElements() == dim, s"vector dim ${x.numElements()} != $dim")
    val out = new Array[Long](words)
    var i = 0
    while (i < planes.length) {
      val p = planes(i)
      var acc = 0.0
      var d = 0
      while (d < dim) { acc += x.getFloat(d).toDouble * p(d).toDouble; d += 1 }
      if (acc >= 0) out(i / 64) |= (1L << (i % 64))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("rhpPlanes", planes, "float[][]")
    nullSafeCodeGen(ctx, ev, x => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |if ($x.numElements() != $dim) {
         |  throw new IllegalArgumentException("vector dim " + $x.numElements() + " != $dim");
         |}
         |final long[] $out = new long[$words];
         |for (int $i = 0; $i < ${planes.length}; $i++) {
         |  final float[] $p = $planesRef[$i];
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $dim; $d++) {
         |    $acc += ((double) $x.getFloat($d)) * ((double) $p[$d]);
         |  }
         |  if ($acc >= 0) $out[$i / 64] |= (1L << ($i % 64));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RhpBitSignature =
    copy(child = newChild)
}

/** Hamming distance between two equal-length packed-bit `array<long>`
  * signatures: `Σ bit_count(a[i] ^ b[i])` in one compiled loop (the
  * [[SigMatchCount]] of bit signatures). */
case class HammingBits(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming_bits"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(y.numElements() == n, s"signature length mismatch: $n vs ${y.numElements()}")
    var acc = 0
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  throw new IllegalArgumentException("signature length mismatch: " + $n +
         |    " vs " + $y.numElements());
         |}
         |int $acc = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Long.bitCount($x.getLong($i) ^ $y.getLong($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): HammingBits =
    copy(left = newLeft, right = newRight)
}

/** Scalar (SQ8) quantization of a float vector to one signed byte per
  * coordinate: `round(xᵢ / s)` with the per-vector scale
  * `s = max|xᵢ| / 127`, clamped to [-127, 127] (an all-zero vector
  * encodes as all-zero bytes). 4× smaller than the raw floats and
  * ~32× larger than an 8 B PQ code — the middle tier of a two-stage
  * index: coarse candidates from PQ codes, re-rank against SQ8.
  *
  * The scale is NOT stored: cosine is scale-invariant
  * (`cos(q, s·c) = cos(q, c)`), so the byte DIRECTION alone carries
  * everything a cosine re-rank needs ([[Sq8Cosine]]); magnitudes,
  * if ever needed, live in the codes table's exact `cn` norms. The
  * per-vector max-abs scale bounds the per-coordinate error at
  * `max|xᵢ|/254` — on unit-ish embedding vectors a ~0.4% relative
  * grid, far below PQ distortion (measured in RerankSpec: SQ8
  * re-rank recall tracks exact re-rank to within epsilon). */
case class Sq8Encode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "sq8_encode"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var maxAbs = 0.0f
    var i = 0
    while (i < n) {
      val v = math.abs(x.getFloat(i))
      if (v > maxAbs) maxAbs = v
      i += 1
    }
    val out = new Array[Byte](n)
    if (maxAbs > 0.0f) {
      val inv = 127.0 / maxAbs
      i = 0
      while (i < n) {
        val q = math.round(x.getFloat(i).toDouble * inv)
        out(i) = math.max(-127L, math.min(127L, q)).toByte
        i += 1
      }
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val maxAbs = ctx.freshName("maxAbs")
      val v = ctx.freshName("v")
      val inv = ctx.freshName("inv")
      val q = ctx.freshName("q")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $x.numElements();
         |float $maxAbs = 0.0f;
         |for (int $i = 0; $i < $n; $i++) {
         |  final float $v = Math.abs($x.getFloat($i));
         |  if ($v > $maxAbs) $maxAbs = $v;
         |}
         |final byte[] $out = new byte[$n];
         |if ($maxAbs > 0.0f) {
         |  final double $inv = 127.0 / $maxAbs;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $q = Math.round(((double) $x.getFloat($i)) * $inv);
         |    $out[$i] = (byte) Math.max(-127L, Math.min(127L, $q));
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Sq8Encode =
    copy(child = newChild)
}

/** Cosine between an exact float query vector and an [[Sq8Encode]]-
  * quantized corpus vector, in one compiled pass (dot + both norms
  * accumulated together — the asymmetric re-rank kernel: the query
  * stays exact, only the corpus side is quantized). The dropped SQ8
  * scale cancels out of the ratio, so this IS the cosine against the
  * dequantized vector. 0.0 when either side has zero norm. */
case class Sq8Cosine(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq8_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[Array[Byte]]
    val n = x.numElements()
    require(y.length == n, s"vector length mismatch: $n vs ${y.length}")
    var dot = 0.0
    var q2 = 0.0
    var c2 = 0.0
    var i = 0
    while (i < n) {
      val qv = x.getFloat(i).toDouble
      val cv = y(i).toDouble
      dot += qv * cv
      q2 += qv * qv
      c2 += cv * cv
      i += 1
    }
    val denom = math.sqrt(q2) * math.sqrt(c2)
    if (denom > 0.0) dot / denom else 0.0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val q2 = ctx.freshName("q2")
      val c2 = ctx.freshName("c2")
      val qv = ctx.freshName("qv")
      val cv = ctx.freshName("cv")
      val denom = ctx.freshName("denom")
      s"""
         |final int $n = $x.numElements();
         |if ($y.length != $n) {
         |  throw new IllegalArgumentException("vector length mismatch: " + $n +
         |    " vs " + $y.length);
         |}
         |double $dot = 0.0; double $q2 = 0.0; double $c2 = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $qv = (double) $x.getFloat($i);
         |  final double $cv = (double) $y[$i];
         |  $dot += $qv * $cv;
         |  $q2 += $qv * $qv;
         |  $c2 += $cv * $cv;
         |}
         |final double $denom = java.lang.Math.sqrt($q2) * java.lang.Math.sqrt($c2);
         |${ev.value} = $denom > 0.0 ? $dot / $denom : 0.0;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Sq8Cosine =
    copy(left = newLeft, right = newRight)
}
