package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style line-level corpus cleaning (Raffel et al. 2020, §2.2 —
  * the rules behind the "Colossal Clean Crawled Corpus"): documents
  * are split into lines; a line survives only if it ends in terminal
  * punctuation, has enough words, and carries no code/boilerplate
  * markers; a document survives only if enough lines remain and it
  * contains no "lorem ipsum" placeholder text.
  *
  * Everything here is per-row array work over the line split —
  * `split` → higher-order `filter` → `array_join`, all codegen'd,
  * zero shuffles, zero explodes: the cleaning pass over a 100 TB
  * crawl is a pure scan-stage map, exactly like [[Pii]] and the
  * repetition metrics. (The reference engine has no text layer; this
  * extends the curation stack the brief asks for.)
  */
object C4Clean {

  /** Line ends (after right-trim) in `.`, `!`, `?`, `"` or `'` —
    * C4's "terminal punctuation" rule. */
  val TerminalPunct = "[.!?\"']$"

  /** The per-line keep predicate, as a composable Column:
    *  - terminal punctuation after rtrim,
    *  - at least `minWords` whitespace-separated words,
    *  - no `{` / `}` (code fragments),
    *  - no "javascript" in any case (boilerplate warnings). */
  def lineKeep(l: Column, minWords: Int): Column =
    regexp_like(rtrim(l), lit(TerminalPunct)) &&
      size(split(trim(l), "\\s+")) >= minWords &&
      !contains(l, lit("{")) && !contains(l, lit("}")) &&
      !contains(lower(l), lit("javascript"))

  /** Applies the line filter and the document filter. Keeps every
    * input column and adds `clean_text` (kept lines, each trimmed,
    * re-joined with `\n`), `n_lines` (before), `n_kept` (after).
    * Documents with fewer than `minLines` surviving lines, or
    * containing "lorem ipsum" anywhere, are dropped. */
  def clean(df: DataFrame, textCol: String,
            minWords: Int = 5, minLines: Int = 3): DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, l => lineKeep(l, minWords))
    df.withColumn("_kept", kept)
      .filter(size(col("_kept")) >= minLines &&
        !contains(lower(col(textCol)), lit("lorem ipsum")))
      .select(df.columns.map(col) ++ Seq(
        array_join(transform(col("_kept"), l => trim(l)), "\n")
          .as("clean_text"),
        size(split(col(textCol), "\n")).cast("long").as("n_lines"),
        size(col("_kept")).cast("long").as("n_kept")): _*)
  }

  /** Count of blocklisted WORD instances in the document — C4's
    * "bad words" page filter signal (the published pipeline drops any
    * page with a blocklist hit; the list itself is corpus policy, so
    * it is a parameter here). Exact tokenized match on the lowercased
    * whitespace words — substring matching would false-positive
    * ("class" vs "ass"), which is the documented failure mode of the
    * original list. Pure per-row HOF, zero shuffle. */
  def badWordCount(textCol: Column, blocklist: Seq[String]): Column = {
    require(blocklist.nonEmpty, "empty blocklist")
    val bl = blocklist.map(_.toLowerCase)
    size(filter(TextOps.words(lower(textCol)),
      w => w.isInCollection(bl))).cast("long")
  }

  /** Per-document blocklist report: every input column plus `n_bad`
    * and `has_bad` — the report-first shape (audit what WOULD drop
    * before dropping; reasons matter in production curation). */
  def withBadWordFlags(df: DataFrame, textCol: String,
                       blocklist: Seq[String]): DataFrame = {
    val n = badWordCount(col(textCol), blocklist)
    df.withColumn("n_bad", n).withColumn("has_bad", n > 0)
  }

  /** The C4 page rule itself: drop every document containing ANY
    * blocklisted word. One codegen'd scan predicate, no shuffle. */
  def dropBadWordDocs(df: DataFrame, textCol: String,
                      blocklist: Seq[String]): DataFrame =
    df.filter(badWordCount(col(textCol), blocklist) === 0)
}
