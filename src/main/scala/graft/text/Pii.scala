package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction for training corpora — the standard scrub pass that
  * replaces personally-identifying spans with typed placeholder
  * tokens before text reaches a training set. Pure codegen'd
  * `regexp_replace` chain: a narrow map with no shuffle, linear over
  * a 100 TB corpus like every other scan-stage transform.
  *
  * The patterns use only the regex subset shared by Java's engine
  * (Spark) and RE2 (DuckDB, Go tooling): character classes, bounded
  * repetition, `\d`, ASCII `\b` — no lookaround, no backreferences —
  * so an external SQL engine reproduces the redaction byte-for-byte
  * and the redaction decision is auditable outside the JVM.
  *
  * Redaction applies the families IN DECLARED ORDER (email, then
  * phone, then IPv4): later patterns see earlier replacements, so a
  * dotted-digit span inside an already-redacted email is not
  * re-matched. The per-family COUNT columns are computed on the
  * ORIGINAL text independently per family (the audit number a
  * compliance report wants), which can differ from the number of
  * chain replacements when families overlap in the raw text.
  */
object Pii {

  /** (family, pattern, replacement) in application order. */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b", "<PHONE>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"))

  /** The redacted text: every PII family replaced by its placeholder,
    * families applied in [[Patterns]] order. */
  def redact(c: Column): Column =
    Patterns.foldLeft(c) { case (acc, (_, pat, rep)) =>
      regexp_replace(acc, pat, rep)
    }

  /** Per-family match count over the original text. */
  def countMatches(c: Column, family: String): Column = {
    val pat = Patterns.collectFirst { case (f, p, _) if f == family => p }
      .getOrElse(throw new IllegalArgumentException(
        s"unknown PII family '$family' (known: ${Patterns.map(_._1).mkString(", ")})"))
    regexp_count(c, lit(pat))
  }

  /** Adds `outCol` (the redacted text) plus `n_email` / `n_phone` /
    * `n_ipv4` audit counts — one pass, all codegen'd, no shuffle. */
  def withRedaction(df: DataFrame, textCol: String,
                    outCol: String): DataFrame = {
    val counts = Patterns.map { case (f, p, _) =>
      regexp_count(col(textCol), lit(p)).cast("long").as(s"n_$f")
    }
    df.select(df.columns.map(col) ++
      (redact(col(textCol)).as(outCol) +: counts): _*)
  }
}
