package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns as native HOF
  * expressions — codegen'd, no UDF, no MLlib Vector conversion.
  *
  * Determinism note: every fold is an explicit left fold
  * (`aggregate`), so results are bit-reproducible and match any other
  * engine that folds left over the same doubles — which is what the
  * DuckDB oracles do via `list_reduce`.
  */
object VectorFunctions {

  /** Elementwise product fold: Σ aᵢ·bᵢ in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; NULL when either norm is 0. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Cosine when norms are precomputed columns (pairwise joins should
    * compute each row's norm ONCE before the join, not per pair). */
  def cosinePrenormed(dotAB: Column, normA: Column, normB: Column): Column =
    dotAB / (normA * normB)

  /** Squared L2 distance. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, v) => acc + v)

  /** Random-hyperplane LSH signature: `nBits` sign bits of projections
    * onto deterministic pseudo-random hyperplanes, packed into a long.
    * Hyperplane components are derived per (bit, dim) from a hash —
    * no stored model, identical on every executor. */
  def rhpSignature(vec: Column, nBits: Int, dim: Int, seed: Long = 42L): Column = {
    require(nBits <= 63, "signature must fit a long")
    val rnd = new scala.util.Random(seed)
    val planes: Seq[Seq[Double]] =
      Seq.fill(nBits)(Seq.fill(dim)(rnd.nextGaussian()))
    val bits = planes.zipWithIndex.map { case (plane, k) =>
      val proj = aggregate(
        zip_with(vec, lit(plane.toArray), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), k)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }
}
