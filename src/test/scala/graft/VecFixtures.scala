package graft

/** Deterministic embedding fixtures shared by the streaming and
  * pipeline specs — ONE copy of the noise level that sets the planted
  * near-dup cosine, so tuning a margin propagates to every test. */
object VecFixtures {
  /** Seeded gaussian unit vector. */
  def unit(dim: Int, seed: Long): Array[Float] = {
    val rnd = new scala.util.Random(seed * 7919L + 13)
    val v = Array.fill(dim)(rnd.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(x => (x / n).toFloat)
  }

  /** Planted near-duplicate: cosine(v, nearDup(v)) ≈ 0.97 at the
    * 0.03/dim noise level on 64 dims. */
  def nearDup(v: Array[Float], seed: Long): Array[Float] = {
    val rnd = new scala.util.Random(seed)
    v.map(x => x + 0.03f * rnd.nextGaussian().toFloat)
  }
}
