package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unigram — integer log2, Viterbi segmentation (expression vs the
  * Scala twin, tie-breaks included), hard-EM training against a pure
  * driver-side brute twin, coverage/reconstruction invariants, and
  * the artifact lifecycle. q150/q151 pin the same pipeline against
  * DuckDB recursive-CTE DP on the full corpus. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("ilog2f: exact at powers of two, monotone, domain-checked") {
    for (k <- 0 to 45)
      assert(Unigram.ilog2f(1L << k) == k.toLong * 65536, s"2^$k")
    assert(Unigram.ilog2f(3) == 65536 + 65536 / 2)
    val xs = Seq(1L, 2L, 3L, 5L, 7L, 100L, 1023L, 1024L, 1025L, 1L << 40)
    xs.sliding(2).foreach { case Seq(a, b) =>
      assert(Unigram.ilog2f(a) < Unigram.ilog2f(b)) }
    intercept[IllegalArgumentException](Unigram.ilog2f(0))
    intercept[IllegalArgumentException](Unigram.ilog2f(1L << 46))
  }

  /** Pure-Scala training twin mirroring trainUnigram step for step. */
  private def bruteTrain(texts: Seq[String], vocabSize: Int,
                         maxLen: Int, seedMulti: Int,
                         emIters: Int): Seq[Unigram.Piece] = {
    val words = texts.flatMap(_.toLowerCase.trim.split("\\s+"))
      .filter(_.nonEmpty)
    val wf = words.groupBy(identity).map { case (w, ws) =>
      w -> ws.size.toLong }
    val sub = scala.collection.mutable.Map.empty[String, Long]
    wf.foreach { case (w, f) =>
      for (d <- 1 to math.min(maxLen, w.length);
           i <- 0 to w.length - d)
        sub(w.substring(i, i + d)) = sub.getOrElse(w.substring(i, i + d), 0L) + f
    }
    val chars = sub.filter(_._1.length == 1).toSeq
    if (chars.isEmpty) return Seq.empty
    val multi = sub.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(seedMulti)
    def score(cs: Seq[(String, Long)]): Seq[Unigram.Piece] = {
      val t = Unigram.ilog2f(cs.map(_._2).sum)
      cs.map { case (p, c) => Unigram.Piece(p, c, Unigram.ilog2f(c) - t) }
    }
    var vocab = score(chars ++ multi)
    for (_ <- 0 until emIters) {
      val sm = vocab.map(p => p.piece -> p.score).toMap
      val counts = scala.collection.mutable.Map.empty[String, Long]
      wf.foreach { case (w, f) =>
        Unigram.viterbiScala(w, sm, maxLen).foreach(t =>
          counts(t) = counts.getOrElse(t, 0L) + f)
      }
      vocab = score(
        vocab.filter(_.piece.length == 1)
          .map(p => p.piece -> math.max(counts.getOrElse(p.piece, 0L), 1L)) ++
        vocab.filter(_.piece.length > 1)
          .flatMap(p => counts.get(p.piece).map(p.piece -> _)))
    }
    val cs = vocab.filter(_.piece.length == 1)
    val km = vocab.filter(_.piece.length > 1)
      .sortBy(p => (-p.cnt, p.piece))
      .take(math.max(0, vocabSize - cs.length))
    score((cs ++ km).map(p => p.piece -> p.cnt)).sortBy(_.piece)
  }

  private val texts = Seq(
    "the cat sat on the mat", "the bat and the cat", "mat bat cat hat",
    "a banana and an ananas", "banana bandana", "the hat on the mat")

  test("trainUnigram: equals the pure driver-side twin, deterministic, " +
      "prunes to vocabSize keeping every character") {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = Unigram.trainUnigram(df, "text", vocabSize = 16,
      maxPieceLen = 3, seedMulti = 12, emIters = 2)
    val want = bruteTrain(texts, 16, 3, 12, 2)
    assert(got == want)
    assert(got == Unigram.trainUnigram(df, "text", vocabSize = 16,
      maxPieceLen = 3, seedMulti = 12, emIters = 2))
    val chars = texts.flatMap(_.toLowerCase.split("\\s+")).flatten.toSet
    assert(got.filter(_.piece.length == 1).map(_.piece.head).toSet == chars)
    assert(got.length <= math.max(16, chars.size))
  }

  test("trainUnigram: EM counting pass routed through the " +
      "mapPartitions twin (emExprMaxVocab=0) trains the bit-identical " +
      "vocabulary") {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val viaExpr = Unigram.trainUnigram(df, "text", vocabSize = 16,
      maxPieceLen = 3, seedMulti = 12, emIters = 2)
    spark.conf.set(Unigram.EmExprMaxVocabKey, "0")
    try {
      val viaTwin = Unigram.trainUnigram(df, "text", vocabSize = 16,
        maxPieceLen = 3, seedMulti = 12, emIters = 2)
      assert(viaTwin == viaExpr)
    } finally spark.conf.unset(Unigram.EmExprMaxVocabKey)
  }

  test("segmentation: expression path ≡ Scala twin token for token " +
      "(ties prefer the longer piece), and tokens reconstruct every " +
      "word — OOV characters included") {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val vocab = Unigram.trainUnigram(df, "text", vocabSize = 16,
      maxPieceLen = 3, seedMulti = 12, emIters = 1)
    // held-out words with unseen characters (x, z) still segment
    val held = Seq((100L, "the xyz bazaar"), (101L, "banana hat"),
      (102L, "  "), (103L, "cathatmat"))
      .toDF("id", "text")
    val ex = Unigram.withUnigramTokensExpr(held, "id", "text", vocab,
        maxPieceLen = 3)
      .as[(Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    val tw = Unigram.withUnigramTokensPartitioned(held, "id", "text",
        vocab, maxPieceLen = 3)
      .as[(Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(ex == tw)
    // reconstruction: concatenating a doc's tokens rebuilds its words
    val byDoc = ex.groupBy(_._1).view.mapValues(
      _.sortBy(_._2).map(_._3).mkString).toMap
    assert(byDoc(100L) == "thexyzbazaar")
    assert(byDoc(103L) == "cathatmat")
    assert(!byDoc.contains(102L), "a whitespace-only doc emits nothing")
  }

  test("segmentation on the real corpus: expression ≡ partitioned " +
      "twin, positions dense per doc") {
    val docs = graft.Tables.load(spark, sf(), "documents")
      .filter(col("doc_id") < 60)
    val vocab = Unigram.trainUnigram(docs, "text", vocabSize = 40,
      maxPieceLen = 4, seedMulti = 48, emIters = 1)
    val ex = Unigram.withUnigramTokensExpr(docs, "doc_id", "text", vocab)
      .as[(Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    val tw = Unigram.withUnigramTokensPartitioned(docs, "doc_id", "text",
        vocab)
      .as[(Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(ex == tw)
    ex.groupBy(_._1).foreach { case (id, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (0L until rows.size).toSeq,
        s"doc $id positions not dense")
    }
  }

  test("token-id encoding: ids are the vocabulary's surface ranks, " +
      "OOV pieces encode -1, broadcast-join resolution") {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val vocab = Unigram.trainUnigram(df, "text", vocabSize = 16,
      maxPieceLen = 3, seedMulti = 12, emIters = 1)
    val rank = vocab.map(_.piece).sorted.zipWithIndex.toMap
    val held = Seq((1L, "the xyz hat")).toDF("id", "text")
    val got = Unigram.withUnigramTokenIds(held, "id", "text", vocab,
        maxPieceLen = 3)
      .as[(Long, Long, String, Int)].collect().sortBy(_._2).toSeq
    assert(got.nonEmpty)
    got.foreach { case (_, _, tok, tid) =>
      assert(tid == rank.getOrElse(tok, -1), s"token $tok id $tid") }
    // x/y/z never occur in training: their pieces must be -1
    assert(got.exists(_._4 == -1))
    // and the id stream decodes back: rank is a bijection on vocab
    assert(rank.values.toSeq.sorted == (0 until vocab.size).toSeq)
  }

  test("supplementary-plane input: codepoint indexing keeps " +
      "expression ≡ partitioned twin, never splits surrogate pairs, " +
      "and astral single characters keep the char coverage floor") {
    // 😀 = U+1F600, 𝕏 = U+1D54F — both 2 UTF-16 code units, 1
    // codepoint (the r19 ADVICE divergence: UTF-16 String.length
    // indexing split these into invalid half-surrogate tokens and
    // misclassified them as multi-char pieces in trainUnigram)
    val astral = Seq((0L, "the 😀😀 cat 𝕏ray"),
      (1L, "😀 mat 𝕏𝕏 bat"),
      (2L, "cat😀hat mat"))
      .toDF("id", "text")
    val vocab = Unigram.trainUnigram(astral, "text", vocabSize = 24,
      maxPieceLen = 3, seedMulti = 12, emIters = 2)
    // astral chars are SINGLE characters: they must survive pruning
    // via the char coverage floor, as chars (cnt >= 1), not as
    // droppable multi-char pieces
    assert(vocab.exists(_.piece == "😀"))
    assert(vocab.exists(_.piece == "𝕏"))
    def wellFormed(s: String): Boolean = {
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (Character.isHighSurrogate(c)) {
          if (i + 1 >= s.length || !Character.isLowSurrogate(s.charAt(i + 1)))
            return false
          i += 2
        } else if (Character.isLowSurrogate(c)) return false
        else i += 1
      }
      true
    }
    vocab.foreach(p => assert(wellFormed(p.piece), s"piece '${p.piece}'"))
    val ex = Unigram.withUnigramTokensExpr(astral, "id", "text", vocab,
        maxPieceLen = 3)
      .as[(Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    val tw = Unigram.withUnigramTokensPartitioned(astral, "id", "text",
        vocab, maxPieceLen = 3)
      .as[(Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(ex == tw)
    ex.foreach { case (_, _, t) => assert(wellFormed(t), s"token '$t'") }
    // reconstruction across the astral boundary
    val byDoc = ex.groupBy(_._1).view.mapValues(
      _.sortBy(_._2).map(_._3).mkString).toMap
    assert(byDoc(2L) == "cat😀hatmat")
  }

  test("vocab artifact: save → load round-trips; duplicates fail " +
      "loudly; frozen-vocab segmentation ≡ inline") {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val vocab = Unigram.trainUnigram(df, "text", vocabSize = 16,
      maxPieceLen = 3, seedMulti = 12, emIters = 1)
    val dir = java.nio.file.Files.createTempDirectory("unigram").toString
    Unigram.saveVocab(spark, s"$dir/v", vocab)
    val back = Unigram.loadVocab(spark, s"$dir/v")
    assert(back == vocab)
    val a = Unigram.withUnigramTokens(df, "id", "text", vocab,
      maxPieceLen = 3).collect().map(_.toSeq).toSet
    val b = Unigram.withUnigramTokens(df, "id", "text", back,
      maxPieceLen = 3).collect().map(_.toSeq).toSet
    assert(a == b)
    Unigram.vocabRows(spark, vocab ++ vocab.take(1))
      .write.mode("overwrite").parquet(s"$dir/bad")
    val e = intercept[IllegalArgumentException] {
      Unigram.loadVocab(spark, s"$dir/bad")
    }
    assert(e.getMessage.contains("duplicate"))
  }
}
