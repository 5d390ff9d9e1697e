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

  // ------------------------------------------------- extended families

  /** US SSN shape: 3-2-4 digit groups (disjoint from the 3-3-4 phone
    * shape above, so the two families cannot shadow each other). */
  val SsnPat = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** IBAN shape: 2-letter country, 2 check digits, 11-30 alphanumeric
    * BBAN chars (the printed range across all IBAN registries). */
  val IbanPat = "\\b[A-Z]{2}\\d{2}[A-Z0-9]{11,30}\\b"

  /** Payment-card shape: four 4-digit groups, optional `-`/space
    * separators. The shape alone matches any 16-digit run, so
    * redaction is gated on the Luhn checksum ([[luhnValid]]) — the
    * distinction that keeps order numbers and log ids out of the
    * scrub while catching every real PAN. */
  val CcPat = "\\b\\d{4}[- ]?\\d{4}[- ]?\\d{4}[- ]?\\d{4}\\b"

  /** The candidate's characters as a 1-char-string array — split on
    * the empty pattern keeps Java's trailing empty token, filtered
    * here so a `cast("int")` downstream can never see `''` → NULL. */
  private def charArray(c: Column): Column =
    filter(split(c, ""), ch => ch =!= "")

  /** Luhn checksum (ISO/IEC 7812) as a pure codegen'd expression:
    * strip separators, then from the RIGHT double every second digit
    * (subtracting 9 on overflow) and require the sum ≡ 0 (mod 10).
    * A higher-order `transform` + `aggregate` over the digit array —
    * no UDF, no shuffle, evaluable per-row inside `filter()` lambdas
    * at scan stage. */
  def luhnValid(cand: Column): Column = {
    val arr = charArray(regexp_replace(cand, "[- ]", ""))
    val n = size(arr)
    val summed = aggregate(
      transform(arr, (ch, i) => {
        val d = ch.cast("int")
        when((n - 1 - i) % 2 === 1,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
      }),
      lit(0), (acc, x) => acc + x)
    summed % 10 === 0
  }

  /** IBAN mod-97 check (ISO 7064) as a pure expression: move the
    * first four chars to the end, expand letters to their two-digit
    * values (A=10 … Z=35; the replacements insert only digits, so
    * the 26 literal replaces cannot cascade), then fold the digit
    * string through `acc = (acc*10 + d) mod 97` — the standard
    * piecewise remainder that never overflows — and require 1. */
  def ibanValid(cand: Column): Column = {
    val rearr = concat(cand.substr(lit(5), length(cand)),
      cand.substr(lit(1), lit(4)))
    val digits = ('A' to 'Z').foldLeft(rearr)((acc, ch) =>
      replace(acc, lit(ch.toString), lit((ch - 'A' + 10).toString)))
    aggregate(charArray(digits), lit(0L),
      (acc, x) => (acc * 10 + x.cast("long")) % 97) === 1
  }

  /** Extended scrub: Luhn-valid card numbers (literal replace of each
    * verified candidate — shape-only 16-digit runs survive), then
    * IBAN and SSN shapes by regex. Applied in that order so the
    * inserted `<CC>`/`<IBAN>` placeholders are never re-matched.
    * Adds `n_ssn` / `n_iban` / `n_iban_valid` / `n_cc` / `n_cc_valid`
    * audit counts over the ORIGINAL text (shape hits vs
    * checksum-verified hits — the pair a compliance report wants).
    * Everything is codegen'd per-row expression work: linear over a
    * 100 TB corpus, no shuffle, no UDF. */
  def withExtendedRedaction(df: DataFrame, textCol: String,
                            outCol: String): DataFrame = {
    val t = col(textCol)
    val ccAll = regexp_extract_all(t, lit(CcPat), lit(0))
    val ccOk = filter(ccAll, luhnValid _)
    val ibanAll = regexp_extract_all(t, lit(IbanPat), lit(0))
    val afterCc = aggregate(ccOk, t, (acc, x) => replace(acc, x, lit("<CC>")))
    val red = regexp_replace(regexp_replace(afterCc, IbanPat, "<IBAN>"),
      SsnPat, "<SSN>")
    df.select(df.columns.map(col) ++ Seq(
      red.as(outCol),
      regexp_count(t, lit(SsnPat)).cast("long").as("n_ssn"),
      size(ibanAll).cast("long").as("n_iban"),
      size(filter(ibanAll, ibanValid _)).cast("long").as("n_iban_valid"),
      size(ccAll).cast("long").as("n_cc"),
      size(ccOk).cast("long").as("n_cc_valid")): _*)
  }
}
