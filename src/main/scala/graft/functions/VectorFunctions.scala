package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns via native
  * Catalyst expressions (graft.functions.expr) — tight primitive loops
  * inside WholeStageCodegen; no UDF, no MLlib Vector conversion, no
  * interpreted HOF walk (the `aggregate(zip_with(...))` formulation is
  * ~100× slower on pair joins).
  *
  * Determinism note: the codegen loop is a strict left fold in double,
  * so results are bit-reproducible and match any engine folding left
  * over the same doubles — which is what the DuckDB oracles do via
  * `list_reduce`.
  */
object VectorFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column => ofExpr, expression => toExpr}
  import graft.functions.expr.{FloatVectorDot, FloatVectorNorm}

  /** Elementwise product fold: Σ aᵢ·bᵢ in double. */
  def dot(a: Column, b: Column): Column =
    ofExpr(FloatVectorDot(toExpr(a), toExpr(b)))

  def norm(a: Column): Column = ofExpr(FloatVectorNorm(toExpr(a)))

  /** Cosine similarity; NULL when either norm is 0. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Cosine when norms are precomputed columns (pairwise joins should
    * compute each row's norm ONCE before the join, not per pair). */
  def cosinePrenormed(dotAB: Column, normA: Column, normB: Column): Column =
    dotAB / (normA * normB)

  /** Squared L2 distance via the codegen'd dot (‖a‖² + ‖b‖² − 2a·b). */
  def l2sq(a: Column, b: Column): Column =
    dot(a, a) + dot(b, b) - lit(2.0) * dot(a, b)

  /** The deterministic pseudo-random hyperplanes behind
    * [[rhpSignature]]: seed-derived, so any engine (or an oracle SQL
    * embedding them as literals) can reproduce the exact signatures. */
  def rhpPlanes(nBits: Int, dim: Int, seed: Long = 42L): Seq[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nBits)(Array.fill(dim)(rnd.nextGaussian().toFloat))
  }

  /** Random-hyperplane LSH signature: `nBits` sign bits of projections
    * onto deterministic pseudo-random hyperplanes, packed into a long.
    * Hyperplane components are derived from the seed ([[rhpPlanes]]) —
    * no stored model, identical on every executor. */
  def rhpSignature(vec: Column, nBits: Int, dim: Int, seed: Long = 42L): Column = {
    require(nBits <= 63, "signature must fit a long")
    val bits = rhpPlanes(nBits, dim, seed).zipWithIndex.map { case (plane, k) =>
      when(dot(vec, lit(plane)) >= 0, shiftleft(lit(1L), k)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }
}
