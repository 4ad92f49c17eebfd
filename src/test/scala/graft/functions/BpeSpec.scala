package graft.functions

import graft.SparkSpec
import graft.functions.expr.BpeUtil
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  private def model(ms: (String, String)*) = new BpeUtil.Model(ms.toArray)

  // The reference the oracle implements: merge ONE leftmost occurrence
  // of the lowest-rank applicable pair per step. The engine merges ALL
  // occurrences of the lowest-rank pair per step; rank validity makes
  // them equal, and this spec CHECKS that equality rather than
  // assuming it.
  private def refEncode(word: String, m: BpeUtil.Model): Seq[String] = {
    var syms = word.map(_.toString).toVector
    var done = false
    while (!done) {
      val ranked = syms.indices.dropRight(1).flatMap { i =>
        val r = m.pairRank.get(syms(i) + " " + syms(i + 1))
        if (r == null) None else Some((r.intValue(), i))
      }
      if (ranked.isEmpty) done = true
      else {
        val (rank, _) = ranked.minBy(t => (t._1, t._2))
        val i = ranked.filter(_._1 == rank).map(_._2).min // leftmost of lowest rank
        val (l, r) = m.merges(rank)
        syms = (syms.take(i) :+ (l + r)) ++ syms.drop(i + 2)
      }
    }
    syms
  }

  test("trainFromCounts learns the textbook merges on the Sennrich example") {
    // 'low'x5, 'lower'x2, 'newest'x6, 'widest'x3: pair counts give
    // (e,s)=9 first, then (es,t)=9, then (l,o)=7, then (lo,w)=7 ...
    val forms = Array("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = Bpe.trainFromCounts(forms, 4)
    assert(merges.toSeq == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")),
      s"got ${merges.toSeq}")
  }

  test("trainFromCounts is deterministic under count ties (lexicographic pair order)") {
    // every pair appears exactly twice -> ties everywhere
    val forms = Array("ab" -> 2L, "cd" -> 2L, "ef" -> 2L)
    val m1 = Bpe.trainFromCounts(forms, 3)
    val m2 = Bpe.trainFromCounts(forms.reverse, 3)
    assert(m1.toSeq == Seq(("a", "b"), ("c", "d"), ("e", "f")))
    assert(m1.toSeq == m2.toSeq, "input order must not matter")
  }

  test("trainFromCounts stops below the min pair count instead of learning noise") {
    val merges = Bpe.trainFromCounts(Array("abc" -> 1L, "xyz" -> 1L), 10)
    assert(merges.isEmpty, s"singleton pairs must not become merges: ${merges.toSeq}")
  }

  test("merge-all encode equals the one-occurrence-at-a-time reference on a trained model") {
    val corpusForms = Array("window" -> 20L, "windows" -> 5L, "widow" -> 3L,
      "in" -> 30L, "inner" -> 4L, "winner" -> 6L, "dow" -> 2L, "own" -> 7L)
    val m = new BpeUtil.Model(Bpe.trainFromCounts(corpusForms, 12))
    val words = corpusForms.map(_._1) ++ Array("w", "windowing", "owow", "nnnn", "dowdow")
    words.foreach { w =>
      assert(BpeUtil.encodeWord(w, m).toSeq == refEncode(w, m),
        s"'$w' under ${m.merges.toSeq}")
    }
    // and on the frozen builtin, over real corpus words
    val bm = new BpeUtil.Model(Bpe.builtin)
    Seq("window", "windows", "scan", "merge", "partition", "query", "colucolumn",
      "sort", "sorted", "value", "keykey", "x", "joinjoin").foreach { w =>
      assert(BpeUtil.encodeWord(w, bm).toSeq == refEncode(w, bm), s"builtin on '$w'")
    }
  }

  test("oracle-equivalence property: merge-all == one-at-a-time across random trained models and words") {
    // the equivalence the DuckDB oracle rests on, checked beyond the
    // fixed cases: 30 random word histograms -> trained (rank-valid
    // by construction) models -> random words over the same alphabet
    val rnd = new scala.util.Random(4242L)
    val alphabets = Seq("ab", "abc", "abcd", "abcde")
    (0 until 30).foreach { trial =>
      val alpha = alphabets(trial % alphabets.length)
      def word(len: Int) = (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val forms = Array.fill(12)(word(2 + rnd.nextInt(8)) -> (1L + rnd.nextInt(20)))
        .groupBy(_._1).map { case (w, g) => w -> g.map(_._2).sum }.toArray
      val m = new BpeUtil.Model(Bpe.trainFromCounts(forms, 2 + rnd.nextInt(10)))
      (0 until 40).foreach { _ =>
        val w = word(1 + rnd.nextInt(12))
        assert(BpeUtil.encodeWord(w, m).toSeq == refEncode(w, m),
          s"trial $trial: '$w' diverged under ${m.merges.toSeq}")
      }
      // and the segmentation is a faithful partition: concat == word
      val w = word(6)
      assert(BpeUtil.encodeWord(w, m).mkString == w)
    }
  }

  test("Model rejects rank-invalid tables loudly (the oracle-equivalence precondition)") {
    val e = intercept[IllegalArgumentException](model(("ab", "c")))
    assert(e.getMessage.contains("not produced by an earlier merge"))
    intercept[IllegalArgumentException](model(("a", "b"), ("c", "ab2")))
    // valid: multi-char symbols in creation order
    model(("a", "b"), ("ab", "c"), ("d", "abc"))
  }

  test("encode pre-tokenizes like bpeTokens and concatenates per-token encodings") {
    val s = spark
    import s.implicits._
    val m = Array(("a", "b"), ("c", "d"))
    val out = Seq((1L, "ab cd! ab99cd"), (2L, ""), (3L, "zzz"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Bpe.bpeEncode(col("text"), m).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // 'ab' merges; '!' is its own pre-token; digits split from letters
    assert(out(1L) == Seq("ab", "cd", "!", "ab", "9", "9", "cd"))
    assert(out(2L) == Seq.empty)
    assert(out(3L) == Seq("z", "z", "z"))
  }

  test("per-thread memo is model-keyed: alternating models never mix segmentations") {
    val mA = model(("a", "b"))
    val mB = model(("b", "c"))
    (1 to 3).foreach { _ =>
      assert(BpeUtil.encodeWord("abc", mA).toSeq == Seq("ab", "c"))
      assert(BpeUtil.encodeWord("abc", mB).toSeq == Seq("a", "bc"))
    }
    // the cached path (encode goes through the memo)
    import org.apache.spark.unsafe.types.UTF8String
    val gA = BpeUtil.encode(UTF8String.fromString("abc abc"), mA)
    val gB = BpeUtil.encode(UTF8String.fromString("abc abc"), mB)
    assert(gA.numElements() == 4 && gB.numElements() == 4)
    assert(gA.getUTF8String(0).toString == "ab" && gB.getUTF8String(0).toString == "a")
  }

  test("token ids: vocab lookup mirrors the string encode; out-of-vocab is -1, never silent") {
    val s = spark
    import s.implicits._
    val merges = Array(("a", "b"), ("ab", "c"))
    val v = Bpe.vocab(merges, Seq("a", "b", "c", "x"))
    // sorted alphabet first, then merge outputs in rank order
    assert(v.toSeq == Seq("a", "b", "c", "x", "ab", "abc"))
    val df = Seq((1L, "abc xa b"), (2L, "abq")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        Bpe.bpeEncode(col("text"), merges).as("toks"),
        Bpe.bpeEncodeIds(col("text"), merges, v).as("ids"))
      .collect().map(r => r.getLong(0) -> ((r.getSeq[String](1), r.getSeq[Int](2)))).toMap
    // ids are exactly the vocab indices of the string tokens
    got.foreach { case (id, (toks, ids)) =>
      assert(ids == toks.map(t => v.indexOf(t)),
        s"doc $id: $toks vs $ids (vocab ${v.toSeq})")
    }
    assert(got(1L)._2 == Seq(v.indexOf("abc"), v.indexOf("x"), v.indexOf("a"), v.indexOf("b")))
    // 'q' is outside the alphabet -> -1 (alphabet drift surfaces)
    assert(got(2L)._2.contains(-1), s"OOV must be -1: ${got(2L)}")
  }

  test("vocabTable/readVocab round-trip; validation is loud") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_bpevocab").toString
    val v = Bpe.vocab(Array(("a", "b")), Seq("b", "a"))
    Bpe.vocabTable(spark, v).write.parquet(s"$base/v")
    assert(Bpe.readVocab(spark, s"$base/v").toSeq == v.toSeq)
    Seq((0, "a"), (2, "b")).toDF("id", "token").write.parquet(s"$base/gap")
    assert(intercept[Exception](Bpe.readVocab(spark, s"$base/gap"))
      .getMessage.contains("id"))
    Seq((0, "a"), (1, "a")).toDF("id", "token").write.parquet(s"$base/dup")
    assert(intercept[Exception](Bpe.readVocab(spark, s"$base/dup"))
      .getMessage.contains("duplicate"))
  }

  test("mergesTable/readMerges round-trip; ingest validation is loud") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    val merges = Bpe.trainFromCounts(Array("window" -> 9L, "widow" -> 4L), 6)
    Bpe.mergesTable(spark, merges).write.parquet(s"$base/m")
    assert(Bpe.readMerges(spark, s"$base/m").toSeq == merges.toSeq)
    // gap in ranks
    Seq((1, "a", "b"), (3, "c", "d")).toDF("rank", "left", "right")
      .write.parquet(s"$base/gap")
    val e = intercept[Exception](Bpe.readMerges(spark, s"$base/gap"))
    assert(e.getMessage.contains("rank"), e.getMessage)
    // duplicate rank
    Seq((1, "a", "b"), (1, "c", "d")).toDF("rank", "left", "right")
      .write.parquet(s"$base/dup")
    assert(intercept[Exception](Bpe.readMerges(spark, s"$base/dup"))
      .getMessage.contains("duplicate"))
  }

  test("train end-to-end: distributed counts feed the driver solve; merges reflect corpus frequency") {
    val s = spark
    import s.implicits._
    val docs = (Seq.fill(30)("the window of the window") ++ Seq.fill(2)("zq zq"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = Bpe.train(docs, 8)
    val bm = new BpeUtil.Model(merges)
    // the dominant words must tokenize to single symbols, the rare one must not
    assert(BpeUtil.encodeWord("window", bm).length == 1,
      s"'window' should be one token: ${BpeUtil.encodeWord("window", bm).toSeq}")
    assert(BpeUtil.encodeWord("the", bm).length == 1)
    assert(BpeUtil.encodeWord("zq", bm).length == 2, "rare word stays split")
  }

  test("non-BMP text: train, vocab, and encode operate on code points, not UTF-16 units") {
    val s = spark
    import s.implicits._
    // U+1F600 is supplementary: 2 UTF-16 units, 1 code point. Before
    // the code-point normalization this crashed vocab() (length-2
    // alphabet entry) and, with the check relaxed, encoded as two
    // lone surrogates that silently mapped to -1 UNK.
    val emoji = "😀"
    val docs = Seq.fill(6)(s"smile $emoji$emoji and $emoji again").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val alpha = Bpe.alphabet(docs)
    assert(alpha.contains(emoji), s"alphabet must hold the whole emoji: $alpha")
    assert(!alpha.exists(a => a.length == 1 && Character.isSurrogate(a.charAt(0))),
      s"no lone surrogates in the alphabet: $alpha")
    // the pre-tokenizer makes each symbol its own pre-token, so corpus
    // training never pairs emoji — but the driver solve is a public
    // API and must split caller histograms by code point too: one
    // (emoji, emoji) pair, never lone-surrogate pairs
    assert(Bpe.trainFromCounts(Array(s"$emoji$emoji" -> 5L), 1).toSeq
      == Seq((emoji, emoji)))
    val merges = Bpe.train(docs, 8)
    val v = Bpe.vocab(merges, alpha)
    val ids = docs.filter(col("doc_id") === 0L)
      .select(Bpe.bpeEncodeIds(col("text"), merges, v).as("ids"))
      .head().getSeq[Int](0)
    assert(ids.nonEmpty && !ids.contains(-1),
      s"no code point of the training corpus may encode to UNK: $ids")
  }

  test("trained merge tables are duplicate-output-free by construction (vocab never rejects its own trainer)") {
    // property over random small-alphabet histograms — the adversarial
    // shape for output collisions ((a,bc) vs (ab,c)) and re-inserted
    // adjacencies, both of which vocab() rejects loudly
    val rnd = new scala.util.Random(777L)
    val alpha = "abcd"
    (1 to 40).foreach { round =>
      def word(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
      val forms = Array.fill(10)(word(2 + rnd.nextInt(6)) -> (1L + rnd.nextInt(30)))
        .groupBy(_._1).map { case (w, g) => w -> g.map(_._2).sum }.toArray
        .sortBy(_._1)
      val merges = Bpe.trainFromCounts(forms, 12)
      assert(merges.map { case (l, r) => l + r }.distinct.length == merges.length,
        s"round $round: duplicate merge output in ${merges.toSeq} for ${forms.toSeq}")
      Bpe.vocab(merges, alpha.map(_.toString)) // must not throw
    }
  }

  test("bpeFertility: a language the model learned pays fewer tokens per pre-token; token-less languages read null") {
    val s = spark
    import s.implicits._
    // rank-valid model that fully merges 'the': en text costs 1 token
    // per word, the gibberish language falls back to characters
    val m = Array("t" -> "h", "th" -> "e")
    val docs = Seq(
      (1L, "en", "the the the"),   // 3 pre / 3 tok
      (2L, "en", "the"),           // 1 pre / 1 tok
      (3L, "xx", "zqv zqv"),       // 2 pre / 6 tok
      (4L, "yy", " "),             // no pre-tokens at all
      (5L, "xx", null)             // NULL text: zero tokens, never -1
    ).toDF("doc_id", "lang", "text")
    val out = graft.queries.TextQueries.bpeFertilityDocs(docs, m)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))).toMap
    assert(out("en") == ((2L, 4L, 4L, 1.0)), s"en: ${out("en")}")
    assert(out("xx") == ((2L, 2L, 6L, 3.0)),
      s"a NULL-text row adds a doc but zero tokens (size() would say -1): ${out("xx")}")
    assert(out("yy")._1 == 1L && out("yy")._2 == 0L && out("yy")._4.isNaN,
      s"a pre-token-less language must read null, not divide by zero: ${out("yy")}")
    assert(out("xx")._4 > out("en")._4,
      "the unlearned language must pay higher fertility — the imbalance the table exists to surface")
  }
}
