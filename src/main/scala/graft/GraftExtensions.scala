package graft

import graft.functions.expr._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so `spark.sql` users (and JDBC/
  * Thrift clients on a cluster) can call them without the Scala API:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   SELECT fvec_dot(a.embedding, b.embedding) FROM ...
  *   SELECT word_shingles(text, 3) FROM documents
  *   SELECT topk_by_score(cosine, id, 10) FROM scored GROUP BY query_id
  * }}}
  *
  * `Sessions.builder` applies it automatically for local sessions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }
  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }
  private def boolLit(e: Expression, what: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(s"$what must be a boolean literal, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("fvec_dot"),
      info("fvec_dot", "fvec_dot(a, b) - dot product of two float vectors as double"),
      (es: Seq[Expression]) => FloatVectorDot(es(0), es(1))))

    ext.injectFunction((
      FunctionIdentifier("fvec_norm"),
      info("fvec_norm", "fvec_norm(a) - L2 norm of a float vector as double"),
      (es: Seq[Expression]) => FloatVectorNorm(es(0))))

    ext.injectFunction((
      FunctionIdentifier("fvec_cosine"),
      info("fvec_cosine", "fvec_cosine(a, b) - cosine similarity of two float vectors"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.Divide(
          FloatVectorDot(es(0), es(1)),
          org.apache.spark.sql.catalyst.expressions.Multiply(
            FloatVectorNorm(es(0)), FloatVectorNorm(es(1))))))

    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(hashes) - 64-bit simhash of an array<long> of element hashes"),
      (es: Seq[Expression]) => SimHash64(es(0))))

    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(text, k[, distinct]) - word k-shingles of a string"),
      (es: Seq[Expression]) => WordShingles(
        es(0), intLit(es(1), "k"),
        if (es.length > 2) boolLit(es(2), "distinct") else true)))

    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "minhash_signature(hashes, numPerm, seed) - minhash signature of an array<long>"),
      (es: Seq[Expression]) => {
        val numPerm = intLit(es(1), "numPerm")
        val seed = if (es.length > 2) longLit(es(2), "seed") else 42L
        val cs = graft.dedup.Dedup.coeffs(numPerm, seed)
        MinHashSignature(es(0), cs.map(_._1).toArray, cs.map(_._2).toArray,
          graft.dedup.Dedup.MinHashP)
      }))

    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      info("rolling_hash",
        "rolling_hash(text[, seed, p]) - base-31 Horner fold of the UTF-8 bytes mod p"),
      (es: Seq[Expression]) => RollingHash(es(0),
        if (es.length > 1) longLit(es(1), "seed") else 17L,
        if (es.length > 2) longLit(es(2), "p") else 1125899906842597L)))

    ext.injectFunction((
      FunctionIdentifier("sig_match_count"),
      info("sig_match_count",
        "sig_match_count(a, b) - positions where two equal-length array<long> signatures agree"),
      (es: Seq[Expression]) => SigMatchCount(es(0), es(1))))

    ext.injectFunction((
      FunctionIdentifier("rhp_band_keys"),
      info("rhp_band_keys",
        "rhp_band_keys(vec, bands, bitsPerBand, dim[, seed]) - banded random-hyperplane " +
          "LSH keys of a float vector; planes derive from the seed (default 42)"),
      (es: Seq[Expression]) => {
        // the hyperplanes themselves are not SQL-expressible as an
        // argument — this wrapper re-derives them from (seed, dim),
        // which is exactly what the Scala path does (rhpPlanes), so
        // SQL and column API produce identical keys for equal params
        val bands = intLit(es(1), "bands")
        val bits = intLit(es(2), "bitsPerBand")
        val dim = intLit(es(3), "dim")
        val seed = if (es.length > 4) longLit(es(4), "seed") else 42L
        RhpBandKeys(es(0),
          graft.functions.VectorFunctions.rhpPlanes(bands * bits, dim, seed).toArray,
          bands, bits)
      }))

    ext.injectFunction((
      FunctionIdentifier("rhp_bit_signature"),
      info("rhp_bit_signature",
        "rhp_bit_signature(vec, nBits, dim[, seed]) - packed random-hyperplane sign bits " +
          "as array<long>; planes derive from the seed (default 42)"),
      (es: Seq[Expression]) => {
        val nBits = intLit(es(1), "nBits")
        val dim = intLit(es(2), "dim")
        val seed = if (es.length > 3) longLit(es(3), "seed") else 42L
        RhpBitSignature(es(0),
          graft.functions.VectorFunctions.rhpPlanes(nBits, dim, seed).toArray)
      }))

    ext.injectFunction((
      FunctionIdentifier("hamming_bits"),
      info("hamming_bits",
        "hamming_bits(a, b) - Hamming distance of two equal-length packed-bit array<long>s"),
      (es: Seq[Expression]) => HammingBits(es(0), es(1))))

    ext.injectFunction((
      FunctionIdentifier("topk_by_score"),
      info("topk_by_score",
        "topk_by_score(score, id, k) - aggregate: top-k (score,id) pairs, score desc, id asc"),
      (es: Seq[Expression]) => TopKByScore(
        org.apache.spark.sql.catalyst.expressions.Cast(es(0), org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.catalyst.expressions.Cast(es(1), org.apache.spark.sql.types.LongType),
        intLit(es(2), "k"))))

    ext.injectFunction((
      FunctionIdentifier("mg_summary"),
      info("mg_summary",
        "mg_summary(item, k) - aggregate: Misra-Gries k-counter frequent-items summary " +
          "as struct<n bigint, items array<struct<item string, lo bigint>>>"),
      (es: Seq[Expression]) => MgSummary(
        org.apache.spark.sql.catalyst.expressions.Cast(es(0), org.apache.spark.sql.types.StringType),
        intLit(es(1), "k"))))
  }
}
