package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-wide line-level exact deduplication — C4's third dedup
  * granularity (Raffel et al. 2020 keep ONE occurrence of every
  * repeated three-sentence span; the unit here is the line, matching
  * [[C4Clean]]'s line structure). Sits between document-level exact
  * dedup (whole-text fingerprints) and [[SpanDedup]]'s n-gram spans:
  * exact repeated UNITS (navigation chrome, cookie banners, footers)
  * are removed everywhere except their first occurrence, without the
  * span machinery's position expansion.
  *
  * Keep-first is deterministic: per duplicated line content, the
  * occurrence with the smallest `(id, pos)` survives — stable under
  * repartitioning, reproducible run to run.
  *
  * Distributed shape at 100 TB: ONE positioned line explode hashed
  * AT the explode (shuffles carry fixed-width md5 + two ints, never
  * line text... except the rebuild, which is doc-keyed); the
  * hash-keyed aggregate computes the distinct-doc count AND the
  * keep-first winner in the SAME pass; the per-line verdict is a
  * join back on the hash; the rebuild is one doc-keyed aggregate
  * with an in-row `array_sort` (collect_list alone is
  * order-nondeterministic). Three shuffles total, all keyed on
  * hashes or ids. Documents whose every line was someone else's
  * duplicate disappear (same convention as [[SpanDedup]] removal).
  */
object LineDedup {

  /** Removes every duplicated unit except its keep-first winner.
    * Units compare TRIMMED; the rebuilt `clean_text` carries the
    * trimmed units re-joined with `sep`, plus `n_kept`. A unit's
    * content must appear in at least `minDocs` DISTINCT documents to
    * count as duplicated (within-document repeats alone are kept —
    * the cross-document signal is what marks boilerplate). `sep`
    * picks the granularity: `"\n"` = C4 lines (the default),
    * `"\n\n"` = paragraphs ([[removeDuplicatedParagraphs]]) — same
    * three-shuffle hash-keyed plan either way. */
  def removeDuplicatedLines(df: DataFrame, idCol: String,
                            textCol: String,
                            minDocs: Int = 2,
                            sep: String = "\n"): DataFrame = {
    val ls = df.select(col(idCol).as("_id"),
        posexplode(split(col(textCol),
          java.util.regex.Pattern.quote(sep))).as(Seq("pos", "raw")))
      .select(col("_id"), col("pos"), trim(col("raw")).as("ln"))
      .withColumn("h", md5(col("ln")))
    val g = ls.groupBy(col("h")).agg(
      countDistinct(col("_id")).as("nd"),
      min(struct(col("_id").as("d"), col("pos").as("p"))).as("w"))
    val kept = ls.join(g, Seq("h"))
      .filter(col("nd") < minDocs ||
        (col("w.d") === col("_id") && col("w.p") === col("pos")))
    rebuild(kept, idCol, sep)
  }

  /** [[removeDuplicatedLines]] at PARAGRAPH granularity (blank-line
    * separated) — the other C4-family dedup unit. */
  def removeDuplicatedParagraphs(df: DataFrame, idCol: String,
                                 textCol: String,
                                 minDocs: Int = 2): DataFrame =
    removeDuplicatedLines(df, idCol, textCol, minDocs, sep = "\n\n")

  /** The A-vs-B incremental form (same convention as
    * [[SpanDedup.removeDuplicatedSpansAgainst]]): batch lines whose
    * trimmed content exists ANYWHERE in the standing corpus are
    * removed; batch-INTERNAL duplicates do not count — they are the
    * next full run's concern, keeping daily cost ∝ batch. The corpus
    * side distills to the HIT set under the
    * [[graft.ops.ProbeGuard.standingHits]] tiered contract: the batch
    * line hashes are counted, and the corpus line stream is then
    * scanned — broadcast-probed in the probe tier, Bloom-filtered
    * over it — so its distinct aggregation exchanges ~batch-matching
    * rows, not every distinct corpus line; only beyond the Bloom cap
    * does the full corpus-distinct sort-merge run, loudly. (The guard
    * count and the hit probe each evaluate the batch explode once —
    * batch-scale by the same contract.) Fully-covered batch documents
    * disappear. */
  def removeDuplicatedLinesAgainst(batch: DataFrame, corpus: DataFrame,
                                   idCol: String,
                                   textCol: String,
                                   sep: String = "\n"): DataFrame = {
    val sepRe = java.util.regex.Pattern.quote(sep)
    val corpusLines = corpus
      .select(explode(split(col(textCol), sepRe)).as("raw"))
      .select(md5(trim(col("raw"))).as("h"))
    val ls = batch.select(col(idCol).as("_id"),
        posexplode(split(col(textCol), sepRe)).as(Seq("pos", "raw")))
      .select(col("_id"), col("pos"), trim(col("raw")).as("ln"))
      .withColumn("h", md5(col("ln")))
    val hits = graft.ops.ProbeGuard.standingHits(corpusLines,
      ls.select(col("h")).distinct(), Seq("h"),
      "LineDedup.removeDuplicatedLinesAgainst")
    rebuild(ls.join(hits, Seq("h"), "left_anti"), idCol, sep)
  }

  /** Shared tail: position-ordered rebuild of the kept units. */
  private def rebuild(kept: DataFrame, idCol: String,
                      sep: String): DataFrame =
    kept.groupBy(col("_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("ln")))),
          s => s.getField("ln")), sep).as("clean_text"),
        count("*").as("n_kept"))
      .select(col("_id").as(idCol), col("clean_text"), col("n_kept"))
}
