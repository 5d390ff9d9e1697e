package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID heuristics, document
  * fingerprints. All pure `Column` expressions (no UDFs) so they stay
  * inside whole-stage codegen and scale linearly with input splits —
  * no shuffle is introduced by any function here.
  */
object TextOps {

  /** Whitespace tokenization. `trim` first so leading/trailing
    * whitespace doesn't produce empty tokens. */
  def words(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0L)).otherwise(size(words(c)).cast("long"))

  /** Normalized text: lowercase, whitespace collapsed, trimmed. */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Deterministic document fingerprint = md5 of normalized text.
    * Exact-dedup key; scales as a pure map + hash-groupBy. */
  def fingerprint(c: Column): Column = md5(normText(c))

  /** Word n-gram shingles of the normalized token stream; empty array
    * when the document has fewer than n tokens.
    *
    * NOTE: when `c` is a raw text column, the tokenization expression is
    * embedded in the slice lambda and — interpreted, no codegen CSE —
    * re-splits the text once PER SHINGLE POSITION: O(words²) per doc.
    * Hot paths must stage the word array first ([[withShingles]]). */
  def shingles(c: Column, n: Int): Column = {
    val w = words(lower(c))
    when(size(w) >= n,
      transform(sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", slice(w, i, lit(n)))))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** Shingles with the tokenization staged as a real column, so the
    * per-position slice lambda reads a materialized array instead of
    * re-splitting the document text each time — linear, not quadratic,
    * in document length. Adds `out` (the distinct shingle array). */
  def withShingles(df: DataFrame, textCol: String, out: String,
                   n: Int): DataFrame =
    df.withColumn("_words", words(lower(col(textCol))))
      .withColumn(out, array_distinct(
        when(size(col("_words")) >= n,
          transform(sequence(lit(1), size(col("_words")) - (n - 1)),
            i => concat_ws(" ", slice(col("_words"), i, lit(n)))))
          .otherwise(array().cast(ArrayType(StringType)))))
      .drop("_words")

  /** One minhash value over a shingle array: lexicographic min of a
    * per-seed hash. Seeds 0-3 slice disjoint 8-hex-char windows out of
    * ONE md5 per shingle — 4 independent hash functions for the price
    * of one digest (the md5 is the hot instruction in LSH banding);
    * larger seeds fall back to md5("<seed>|" + shingle). md5-hex keeps
    * the family identical across engines (reproducible in any SQL
    * oracle), while behaving like a random permutation per seed. */
  def minhash(shingleCol: Column, seed: Int): Column =
    if (seed < 4)
      array_min(transform(shingleCol, s => substring(md5(s), 1 + 8 * seed, 8)))
    else
      array_min(transform(shingleCol, s => md5(concat(lit(s"$seed|"), s))))

  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "on", "for")

  def stopwordCount(c: Column): Column =
    size(filter(words(lower(c)), w => w.isInCollection(Stopwords))).cast("long")

  /** Characters remaining after stripping whitespace. */
  def nonWsChars(c: Column): Column =
    length(regexp_replace(c, "\\s", "")).cast("long")

  def punctCount(c: Column): Column =
    (length(c) - length(regexp_replace(c, "[.,;:!?]", ""))).cast("long")

  /** Composite quality score in [0,1]-ish: favors texts with a sane
    * stopword ratio and low punctuation density (cheap heuristics in the
    * spirit of C4/Gopher quality filters). */
  def qualityScore(c: Column): Column = {
    val toks = tokenCount(c)
    val stopRatio = when(toks > 0, stopwordCount(c).cast("double") / toks).otherwise(lit(0.0))
    val punctRatio = when(length(c) > 0, punctCount(c).cast("double") / length(c)).otherwise(lit(0.0))
    round(least(lit(1.0), stopRatio * 2 + (lit(1.0) - punctRatio) * 0.5), 4)
  }

  /** [[qualityScore]] with token/stopword counts staged as columns —
    * one split + one stopword filter per doc instead of re-tokenizing
    * for the count, the guard, and the ratio separately. */
  def withQualityScore(df: DataFrame, textCol: String, out: String): DataFrame = {
    val c = col(textCol)
    df.withColumn("_qw", words(lower(c)))
      .withColumn("_qtoks",
        when(length(trim(c)) === 0, lit(0L)).otherwise(size(col("_qw")).cast("long")))
      .withColumn("_qstop",
        size(filter(col("_qw"), w => w.isInCollection(Stopwords))).cast("long"))
      .withColumn(out, {
        val stopRatio = when(col("_qtoks") > 0,
          col("_qstop").cast("double") / col("_qtoks")).otherwise(lit(0.0))
        val punctRatio = when(length(c) > 0,
          punctCount(c).cast("double") / length(c)).otherwise(lit(0.0))
        round(least(lit(1.0), stopRatio * 2 + (lit(1.0) - punctRatio) * 0.5), 4)
      })
      .drop("_qw", "_qtoks", "_qstop")
  }

  /** Tiny per-language stopword tables for the language-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "und", "die", "das", "ist"),
    "es" -> Seq("el", "y", "los", "que", "es"),
    "fr" -> Seq("le", "et", "les", "des", "est"),
    "zh" -> Seq("的", "了", "是"))

  /** N-gram/stopword language-ID heuristic: count marker hits per
    * language, argmax with a fixed tie-break order (the declaration
    * order above); zero hits everywhere → "und".
    *
    * NOTE: the argmax embeds every hit count (and the tokenization
    * under it) many times; interpreted HOFs re-evaluate per use —
    * ~30 split+filter passes per doc inline. Hot paths use
    * [[withLangId]], which stages tokens and hit counts as columns. */
  def langIdHeuristic(c: Column): Column = {
    val w = words(lower(c))
    val hits = LangMarkers.map { case (lang, ms) =>
      lang -> size(filter(w, x => x.isInCollection(ms))).cast("long")
    }
    langArgmax(hits)
  }

  private def langArgmax(hits: Seq[(String, Column)]): Column = {
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    val firstMatch = hits.foldLeft(when(best === 0, "und")) {
      case (acc, (lang, h)) => acc.when(h === best, lang)
    }
    firstMatch.otherwise("und")
  }

  /** [[langIdHeuristic]] with tokens and per-language hit counts staged
    * as real columns: ONE split + one marker filter per language per
    * document; the argmax then compares cheap attributes. */
  def withLangId(df: DataFrame, textCol: String, out: String): DataFrame = {
    val hitCols = LangMarkers.map { case (lang, _) => s"_hit_$lang" }
    val staged = df.withColumn("_lw", words(lower(col(textCol))))
    val withHits = LangMarkers.foldLeft(staged) { case (d, (lang, ms)) =>
      d.withColumn(s"_hit_$lang",
        size(filter(col("_lw"), x => x.isInCollection(ms))).cast("long"))
    }
    withHits
      .withColumn(out, langArgmax(
        LangMarkers.map { case (lang, _) => lang -> col(s"_hit_$lang") }))
      .drop("_lw")
      .drop(hitCols: _*)
  }

  /** 32-bit hash derived from the first 8 hex chars of md5 — chosen over
    * crc32/xxhash because every SQL engine with md5 can reproduce it
    * (the DuckDB oracle uses `try_cast('0x'||substring(md5(x),1,8))`). */
  def md5_32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Rolling polynomial hash over the word stream (base 31, mod 1e9+7,
    * md5-32 per word) — a cheap order-sensitive document signature,
    * complementing the order-insensitive minhash. Modular at every step
    * so the fold never overflows (and never wraps differently across
    * engines).
    *
    * This composed Column form is the REFERENCE semantics (an
    * interpreted transform + aggregate fold — any SQL oracle can
    * reproduce it); hot paths use [[rollingWordHashNative]], the
    * value-identical one-pass codegen'd expression. */
  val RollingMod = 1000000007L

  def rollingWordHash(c: Column): Column =
    aggregate(
      transform(words(lower(c)), w => md5_32(w) % RollingMod),
      lit(0L),
      (acc, h) => (acc * 31 + h) % RollingMod)

  /** [[rollingWordHash]] as ONE native codegen'd pass per document
    * (functions.RollingWordHash): tokenize + per-word md5-32 + modular
    * fold in a single JVM loop — interpreted higher-order functions are
    * CodegenFallback and can never be whole-stage-compiled
    * (TextHashSpec cross-validates the two forms on the edge corpus). */
  def rollingWordHashNative(c: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(graft.functions.RollingWordHash(bridge.expression(c)))
  }
}
