package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.expr.BpeUtil

/** BPE tokenizer TRAINING and the trained-encode column — the
  * tokenizer half a training-data pipeline needs between corpus
  * curation and sequence packing (the repo's `bpeTokens` regex is the
  * PRE-tokenizer; this learns the merges that turn pre-tokens into a
  * real subword vocabulary).
  *
  * Spark-first split of the classic Sennrich/GPT-2 algorithm: the
  * corpus-sized work — word counting — is ONE distributed scan with
  * map-side partial aggregation, and the iterative merge learning
  * runs on the DRIVER over the bounded word-frequency table (BPE
  * training only ever consumes the word histogram, never the corpus:
  * this is exactly how sentencepiece/subword-nmt train too, so the
  * driver solve is the textbook algorithm, not a shortcut). The same
  * bounded-collect pattern as the DSIR lambda fit and the
  * quality-model trainer.
  */
object Bpe {

  /** Cap on the word-frequency table the driver solve consumes.
    * 2^16 forms × ~16 B is ~1 MB — trivially collectable — while
    * Zipf means the tail beyond it is almost all singletons that
    * could never win a merge anyway. The cap is LOUD: [[train]]
    * reports the token coverage of the kept forms on stderr, so a
    * corpus whose tail actually matters (coverage ≪ 1) is visible,
    * not silently mis-trained. */
  val MaxForms = 1 << 16

  /** Pairs seen fewer than this many times stop the merge loop — a
    * merge learned from one occurrence is noise, and stopping early
    * keeps the table honest when `nMerges` exceeds what the corpus
    * supports. */
  val MinPairCount = 2L

  /** Distributed half: per-word occurrence counts, one scan. */
  def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(TextFunctions.bpeTokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Learn up to `nMerges` merges from `docs`. Returns the merge
    * list in rank order. The only corpus-sized job is the word-count
    * aggregate; the collect is bounded by [[MaxForms]] (top forms by
    * count, then word — deterministic under ties). */
  def train(docs: DataFrame, nMerges: Int, maxForms: Int = MaxForms): Array[(String, String)] = {
    val wc = wordCounts(docs).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val forms = wc.orderBy(desc("n"), asc("word")).limit(maxForms)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val totals = wc.agg(sum("n"), count(lit(1))).head()
    wc.unpersist()
    // sum over zero rows is null — surface the empty corpus by name,
    // not as an NPE (a pipeline whose select/decontaminate stages
    // dropped everything lands here)
    require(!totals.isNullAt(0),
      "bpe-train: corpus has no pre-tokens (empty or all-whitespace text)")
    val (totalTokens, totalForms) = (totals.getLong(0), totals.getLong(1))
    if (totalForms > maxForms) {
      val covered = forms.map(_._2).sum
      System.err.println(
        f"[graft] bpe-train: $totalForms word forms capped to $maxForms " +
          f"(token coverage ${covered.toDouble / totalTokens}%.4f)")
    }
    trainFromCounts(forms, nMerges)
  }

  /** The driver solve: iterative highest-count pair merging over the
    * word histogram, incremental pair-count maintenance (only words
    * CONTAINING the merged pair are re-counted — the classic
    * efficient implementation). Deterministic end to end: ties on
    * count break lexicographically on (left, right).
    *
    * DIVERGENCE FROM UPSTREAM BPE (operator-facing): any pair whose
    * concatenated OUTPUT string was already produced by an earlier
    * merge is permanently excluded from the argmax — e.g. once
    * `(ab, c)` exists, `(a, bc)` is never learned, however frequent.
    * Standard trainers (the original Sennrich code, HF tokenizers)
    * learn both and let the two merge rules share one token string;
    * this trainer trades that (slightly coarser segmentation on
    * corpora where the same surface form arises via competing merge
    * paths) for a vocab that is duplicate-free BY CONSTRUCTION —
    * the unique-id contract `vocab()`/`bpeEncodeIds` enforce. The
    * skipped merge adds no new token, so vocabulary coverage is
    * unchanged; only the segmentation of those surface forms is. */
  def trainFromCounts(forms: Array[(String, Long)], nMerges: Int): Array[(String, String)] = {
    require(nMerges >= 0, s"nMerges must be >= 0: $nMerges")
    // split by CODE POINT (BpeUtil.codePointSymbols), never by UTF-16
    // unit: a supplementary char split into surrogate halves would
    // train merges over symbols the code-point alphabet/vocab can
    // never contain (every occurrence then encodes to -1 UNK)
    val seqs: Array[Array[String]] =
      forms.map(f => BpeUtil.codePointSymbols(f._1))
    val freq: Array[Long] = forms.map(_._2)

    val pairCount = new java.util.HashMap[(String, String), Long]()
    val pairForms = new java.util.HashMap[(String, String), java.util.BitSet]()
    def addForm(fi: Int, sign: Long): Unit = {
      val s = seqs(fi)
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        pairCount.merge(p, sign * freq(fi), (a, b) => a + b)
        if (sign > 0)
          pairForms.computeIfAbsent(p, _ => new java.util.BitSet()).set(fi)
        i += 1
      }
    }
    forms.indices.foreach(addForm(_, 1L))

    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    // any pair whose OUTPUT string is already a produced token is
    // EXCLUDED from the argmax forever: a later merge can recreate an
    // earlier pair's adjacency (addForm(+1) re-inserts it after its
    // removal below), and two DISTINCT pairs can concatenate to the
    // same string ((a,bc) vs (ab,c)) — either way vocab() would see a
    // duplicate token and reject the trainer's own table. Tracking
    // outputs (not pairs) closes both paths, so the vocab is
    // duplicate-free by construction; the skipped merge adds no new
    // token, so nothing is lost
    val produced = new java.util.HashSet[String]()
    while (merges.size < nMerges && !pairCount.isEmpty) {
      // argmax by (count desc, pair asc) — an explicit total order, so
      // the table is a pure function of the histogram
      var best: (String, String) = null
      var bestN = 0L
      pairCount.forEach { (p, n) =>
        if (!produced.contains(p._1 + p._2) &&
            (n > bestN || (n == bestN && best != null &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2))))) {
          best = p; bestN = n
        }
      }
      if (best == null || bestN < MinPairCount) return merges.toArray
      merges += best
      produced.add(best._1 + best._2)
      val touched = pairForms.get(best)
      // pairForms bitsets go stale as words mutate — harmless: a
      // stale index just re-counts a word that no longer holds the
      // pair (subtract + re-add is a no-op for it)
      var fi = touched.nextSetBit(0)
      while (fi >= 0) {
        addForm(fi, -1L)
        seqs(fi) = mergePair(seqs(fi), best._1, best._2)
        addForm(fi, 1L)
        fi = touched.nextSetBit(fi + 1)
      }
      pairCount.remove(best)
      pairForms.remove(best)
    }
    merges.toArray
  }

  private def mergePair(s: Array[String], l: String, r: String): Array[String] = {
    val out = new java.util.ArrayList[String](s.length)
    var i = 0
    while (i < s.length) {
      if (i < s.length - 1 && s(i) == l && s(i + 1) == r) { out.add(l + r); i += 2 }
      else { out.add(s(i)); i += 1 }
    }
    out.toArray(new Array[String](out.size()))
  }

  /** The vocabulary a merge table induces over an alphabet: ids
    * 0..|alphabet|−1 for the sorted single characters, then one id
    * per merge OUTPUT in rank order. This is the artifact a training
    * job actually consumes (token IDS, not strings); its id layout is
    * a pure function of (alphabet, merges), so re-deriving it
    * anywhere gives the same mapping. */
  def vocab(merges: Array[(String, String)], alphabet: Seq[String]): Array[String] = {
    val chars = alphabet.distinct.sorted
    // single code POINT, not single char: alphabet() splits on code
    // points, so an emoji entry is a length-2 string and must pass
    require(chars.forall(BpeUtil.isSingleCodePoint),
      s"alphabet must be single code points: ${
        chars.filterNot(BpeUtil.isSingleCodePoint).take(5)}")
    val v = (chars ++ merges.map { case (l, r) => l + r }).toArray
    // two rank-valid merges can concatenate to the SAME string (e.g.
    // (ab,c) and (a,bc)) — trainFromCounts never emits that (learned
    // pairs are excluded from the argmax permanently, so the merge
    // list is duplicate-free by construction), but operator-supplied
    // tables can; fail here by name rather than three stages later
    // when readVocab rejects the written table
    val dup = v.groupBy(identity).collectFirst { case (t, g) if g.length > 1 => t }
    require(dup.isEmpty,
      s"vocab: duplicate token '${dup.getOrElse("")}' (two merges concatenate " +
        "to the same string, or a merge output collides with the alphabet)")
    v
  }

  /** Distinct characters across the corpus's pre-tokens — the exact
    * alphabet (not capped with the form histogram: chars outside the
    * top forms still need ids). One tiny distinct agg. */
  def alphabet(docs: DataFrame): Seq[String] = {
    import docs.sparkSession.implicits._
    docs.select(explode(split(concat_ws("", TextFunctions.bpeTokens(col("text"))), ""))
        .as("c"))
      .filter(length(col("c")) > 0).distinct().as[String].collect().toSeq.sorted
  }

  /** Vocab as the `(id, token)` table `Main bpe-encode vocab=`
    * ingests. */
  def vocabTable(spark: SparkSession, v: Array[String]): DataFrame = {
    import spark.implicits._
    v.zipWithIndex.map { case (t, i) => (i, t) }.toSeq.toDF("id", "token")
  }

  /** Vocab ingestion with the same loud-validation contract as
    * [[readMerges]]: contiguous ids from 0, unique tokens. */
  def readVocab(spark: SparkSession, path: String): Array[String] = {
    val rows = spark.read.parquet(path)
      .select(col("id").cast("int"), col("token")).collect()
    val out = new Array[String](rows.length)
    rows.foreach { r =>
      require(!r.isNullAt(0) && !r.isNullAt(1), s"vocab $path: null id/token row")
      val k = r.getInt(0)
      require(k >= 0 && k < rows.length,
        s"vocab $path: id $k outside the contiguous 0..${rows.length - 1}")
      require(out(k) == null, s"vocab $path: duplicate id $k")
      out(k) = r.getString(1)
    }
    require(out.distinct.length == out.length, s"vocab $path: duplicate token")
    out
  }

  /** Token-ID array of `text`: trained-BPE encode then vocab lookup,
    * one compiled pass ([[graft.functions.expr.BpeEncodeIds]]).
    * Tokens outside the vocab (alphabet drift between train and
    * encode corpora) map to −1, the documented UNK — a training job
    * filters or remaps them explicitly rather than silently. */
  def bpeEncodeIds(text: Column, merges: Array[(String, String)],
                   vocab: Array[String]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => ofExpr, expression => toExpr}
    ofExpr(graft.functions.expr.BpeEncodeIds(toExpr(text),
      new BpeUtil.Model(merges), vocab))
  }

  /** Merges as the `(rank, left, right)` table `Main bpe-encode
    * merges=` ingests — rank is 1-based and contiguous. */
  def mergesTable(spark: SparkSession, merges: Array[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((l, r), i) => (i + 1, l, r) }.toSeq.toDF("rank", "left", "right")
  }

  /** Merge-table ingestion with loud validation (the quality-weights
    * contract): ranks must be the contiguous 1..n, symbols non-null;
    * rank VALIDITY itself (multi-char symbols produced by earlier
    * merges) is then enforced by the [[BpeUtil.Model]] constructor. */
  def readMerges(spark: SparkSession, path: String): Array[(String, String)] = {
    val rows = spark.read.parquet(path)
      .select(col("rank").cast("int"), col("left"), col("right"))
      .collect()
    val out = new Array[(String, String)](rows.length)
    rows.foreach { r =>
      require(!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2),
        s"merges $path: null rank/left/right row")
      val k = r.getInt(0)
      require(k >= 1 && k <= rows.length,
        s"merges $path: rank $k outside the contiguous 1..${rows.length}")
      require(out(k - 1) == null, s"merges $path: duplicate rank $k")
      out(k - 1) = (r.getString(1), r.getString(2))
    }
    out
  }

  /** Trained-BPE token array of `text` under `merges` (compiled
    * scan-local [[graft.functions.expr.BpeEncode]]). */
  def bpeEncode(text: Column, merges: Array[(String, String)]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => ofExpr, expression => toExpr}
    ofExpr(graft.functions.expr.BpeEncode(toExpr(text), new BpeUtil.Model(merges)))
  }

  /** The frozen gate model: [[train]] run once over the sf0.001
    * documents table (nMerges = 40) and pinned here, the
    * LangProfiles-builtin pattern — the gate query and its DuckDB
    * oracle embed the SAME table, so the encode arithmetic is
    * oracle-checked while training itself is spec-checked
    * (BpeSpec pins [[trainFromCounts]] against hand-computed merges
    * and the train->encode round trip). Regenerate with
    * `Main bpe-train` if the testdata generator ever changes. */
  val builtin: Array[(String, String)] = Array(
    ("e", "r"),
    ("o", "r"),
    ("i", "n"),
    ("o", "w"),
    ("s", "t"),
    ("l", "u"),
    ("a", "r"),
    ("p", "ar"),
    ("m", "er"),
    ("a", "t"),
    ("a", "n"),
    ("c", "an"),
    ("s", "can"),
    ("c", "o"),
    ("co", "lu"),
    ("colu", "m"),
    ("colum", "n"),
    ("d", "ow"),
    ("in", "dow"),
    ("w", "indow"),
    ("d", "er"),
    ("or", "der"),
    ("or", "t"),
    ("s", "ort"),
    ("par", "t"),
    ("u", "p"),
    ("a", "g"),
    ("ag", "g"),
    ("a", "lu"),
    ("alu", "e"),
    ("v", "alue"),
    ("in", "e"),
    ("l", "ine"),
    ("e", "y"),
    ("k", "ey"),
    ("j", "o"),
    ("jo", "in"),
    ("g", "e"),
    ("mer", "ge"),
    ("er", "y"))
}
