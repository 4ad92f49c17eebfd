package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Trained-BPE encoding as compiled scan-local work (reference:
  * bigdata_tag_system has no tokenizer — this is part of the
  * LLM-training-data surface the brief adds on top).
  *
  * The merge table is MODEL-AS-DATA (the quality-weights /
  * lang-profiles pattern): [[graft.functions.Bpe.train]] learns it once from
  * word counts, it rides the codegen reference array here, and encode
  * is one compiled pass per row — no join, no shuffle, document text
  * never leaves its scan partition.
  */
object BpeUtil {

  /** A validated BPE merge table. Construction enforces RANK VALIDITY:
    * any multi-character symbol appearing in merge i must be the
    * output of an earlier merge. This is not pedantry — it is the
    * precondition of the greedy-equivalence argument the DuckDB
    * oracle rests on: under a valid table, merging occurrences of the
    * current lowest-rank pair can never CREATE a pair of lower rank
    * (a pair containing symbol s can only be learned after the merge
    * that created s), so "merge one leftmost occurrence at a time"
    * (the oracle's recursive CTE) and "merge all occurrences of the
    * lowest-rank pair" (this class, the GPT-2 encoder shape) reach
    * the same segmentation. An invalid table would let the two
    * diverge — so it is rejected loudly here, at model build, on both
    * the train and the parquet-ingest paths. */
  final class Model(val merges: Array[(String, String)]) extends Serializable {
    {
      val created = new java.util.HashSet[String]()
      merges.zipWithIndex.foreach { case ((l, r), i) =>
        require(l.nonEmpty && r.nonEmpty, s"BPE merge $i: empty symbol")
        require(isSingleCodePoint(l) || created.contains(l),
          s"BPE merge $i: left symbol '$l' is multi-char but not produced by an earlier merge")
        require(isSingleCodePoint(r) || created.contains(r),
          s"BPE merge $i: right symbol '$r' is multi-char but not produced by an earlier merge")
        created.add(l + r)
      }
    }

    /** pair -> rank; first (lowest) rank wins on duplicate pairs. */
    @transient lazy val pairRank: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer]()
      merges.zipWithIndex.foreach { case ((l, r), i) =>
        m.putIfAbsent(l + " " + r, Integer.valueOf(i))
      }
      m
    }
  }

  /** The BPE unit is the Unicode CODE POINT, not the UTF-16 unit: a
    * supplementary char (emoji, rare CJK) is TWO chars, and splitting
    * by char would make lone surrogates the base symbols — strings
    * that can never equal a code-point alphabet entry, so they'd
    * silently encode to −1 UNK on any real web corpus. These two
    * helpers are the one definition of "one symbol" shared by the
    * trainer, the encoder, the model validity check, and vocab(). */
  def isSingleCodePoint(s: String): Boolean = s.length match {
    case 1 => true
    case 2 => Character.isSurrogatePair(s.charAt(0), s.charAt(1))
    case _ => false
  }

  def codePointSymbols(word: String): Array[String] = {
    val out = new java.util.ArrayList[String](word.length)
    var c = 0
    while (c < word.length) {
      val n = Character.charCount(word.codePointAt(c))
      out.add(word.substring(c, c + n))
      c += n
    }
    out.toArray(new Array[String](out.size()))
  }

  /** The pre-tokenizer: identical to
    * [[graft.functions.TextFunctions.bpeTokens]]'s regex — letter
    * runs, digit runs, single other non-space symbols (Java regex
    * char classes match full code points, so an emoji is ONE
    * pre-token). BPE merges only ever apply WITHIN one pre-token. */
  private val PreTok = java.util.regex.Pattern.compile("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")

  /** Encode one pre-token: repeatedly find the lowest-rank pair
    * present and merge ALL its occurrences left-to-right (the GPT-2
    * encoder loop). Terminates: every merge shortens the sequence. */
  def encodeWord(word: String, m: Model): Array[String] = {
    if (word.length <= 1) return Array(word)
    val base = codePointSymbols(word)
    if (base.length <= 1) return Array(word)
    var syms = new java.util.ArrayList[String](base.length)
    var c = 0
    while (c < base.length) { syms.add(base(c)); c += 1 }
    while (true) {
      var best = -1
      var i = 0
      while (i < syms.size - 1) {
        val r = m.pairRank.get(syms.get(i) + " " + syms.get(i + 1))
        if (r != null && (best == -1 || r.intValue() < best)) best = r.intValue()
        i += 1
      }
      if (best == -1) return syms.toArray(new Array[String](syms.size()))
      val (l, rr) = m.merges(best)
      val out = new java.util.ArrayList[String](syms.size())
      var j = 0
      while (j < syms.size()) {
        if (j < syms.size() - 1 && syms.get(j) == l && syms.get(j + 1) == rr) {
          out.add(l + rr); j += 2
        } else { out.add(syms.get(j)); j += 1 }
      }
      syms = out
    }
    throw new IllegalStateException("unreachable")
  }

  // Per-thread word->tokens memo: natural text is Zipfian, so the
  // same few thousand word forms dominate every partition — without
  // this the merge loop re-runs per OCCURRENCE. Keyed by model
  // IDENTITY (reference equality): a new model (new query) drops the
  // cache rather than mixing segmentations. Bounded LRU so a
  // high-cardinality column (ids, hashes) can't grow it unboundedly.
  private val CacheMax = 1 << 16
  private final class Memo(val model: Model) {
    val map: java.util.LinkedHashMap[String, Array[String]] =
      new java.util.LinkedHashMap[String, Array[String]](1024, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Array[String]]): Boolean = size() > CacheMax
      }
  }
  private val memo = new ThreadLocal[Memo]()

  private def cachedEncode(word: String, m: Model): Array[String] = {
    var t = memo.get()
    if (t == null || (t.model ne m)) { t = new Memo(m); memo.set(t) }
    var r = t.map.get(word)
    if (r == null) { r = encodeWord(word, m); t.map.put(word, r) }
    r
  }

  /** One compiled pass: pre-tokenize, encode each pre-token through
    * the memo, concatenate. */
  def encode(text: UTF8String, m: Model): ArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    val matcher = PreTok.matcher(text.toString)
    while (matcher.find()) {
      val toks = cachedEncode(matcher.group(), m)
      var i = 0
      while (i < toks.length) { out.add(UTF8String.fromString(toks(i))); i += 1 }
    }
    new GenericArrayData(out.toArray[AnyRef](new Array[AnyRef](out.size())))
  }

  /** [[encode]] + vocab lookup in the same pass: token IDS, −1 = UNK
    * (token outside the vocab — alphabet drift; never silent). */
  def encodeIds(text: UTF8String, m: Model, vocab: VocabLookup): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuilder.ofInt
    out.sizeHint(64)
    val matcher = PreTok.matcher(text.toString)
    while (matcher.find()) {
      val toks = cachedEncode(matcher.group(), m)
      var i = 0
      while (i < toks.length) { out += vocab.id(toks(i)); i += 1 }
    }
    new GenericArrayData(out.result())
  }

  /** Serializable token→id map (built once per executor from the
    * broadcast-by-reference vocab array). */
  final class VocabLookup(val tokens: Array[String]) extends Serializable {
    @transient private lazy val map: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](tokens.length * 2)
      tokens.zipWithIndex.foreach { case (t, i) => m.put(t, Integer.valueOf(i)) }
      m
    }
    def id(tok: String): Int = {
      val r = map.get(tok)
      if (r == null) -1 else r.intValue()
    }
  }
}

/** `bpe_encode(text)` under a frozen merge table — returns the
  * array<string> of BPE tokens. The model rides the codegen reference
  * array (the PQ-codebook / scrub-hot-table pattern); evaluation is
  * scan-local and codegen'd, so token counting over 100 TB is one
  * pass with no exchange. */
case class BpeEncode(child: Expression, model: BpeUtil.Model) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bpe_encode"

  override protected def nullSafeEval(a: Any): Any =
    BpeUtil.encode(a.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bpeModel", model, classOf[BpeUtil.Model].getName)
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.expr.BpeUtil$$.MODULE$$.encode($x, $m);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

/** `bpe_encode_ids(text)`: [[BpeEncode]] fused with the vocab lookup —
  * array<int> of token ids, −1 = out-of-vocab (documented UNK). Same
  * scan-local codegen shape; model + vocab ride the reference array. */
case class BpeEncodeIds(child: Expression, model: BpeUtil.Model,
                        vocab: Array[String]) extends UnaryExpression {

  @transient private lazy val lookup = new BpeUtil.VocabLookup(vocab)

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType,
    containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bpe_encode_ids"

  override protected def nullSafeEval(a: Any): Any =
    BpeUtil.encodeIds(a.asInstanceOf[UTF8String], model, lookup)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bpeModel", model, classOf[BpeUtil.Model].getName)
    val v = ctx.addReferenceObj("bpeVocab", lookup,
      classOf[BpeUtil.VocabLookup].getName)
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.expr.BpeUtil$$.MODULE$$.encodeIds($x, $m, $v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeIds =
    copy(child = newChild)
}
