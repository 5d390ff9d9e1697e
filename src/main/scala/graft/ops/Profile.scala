package graft.ops

import graft.text.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus profile — the "dataset card" numbers every training-data
  * release ships with (composition by source/language, token and
  * character volumes, document-length distribution): one map-side-
  * combined aggregate pass over the corpus plus a broadcast of the
  * one-row totals, so the card costs a single scan at any corpus
  * size. Counts are integers and shares are single integer-derived
  * divisions rounded to 6dp — hash-exact across engines.
  */
object Profile {

  /** Per-(source, lang) dataset card: `(source, lang, n_docs,
    * n_tokens, n_chars, doc_share, token_share)` — shares against the
    * whole-corpus totals (broadcast one-row frame, no second scan of
    * the corpus). */
  def datasetCard(docs: DataFrame, sourceCol: String, langCol: String,
                  textCol: String): DataFrame = {
    val perGroup = docs
      .select(col(sourceCol), col(langCol),
        TextOps.tokenCount(col(textCol)).as("_nt"),
        length(col(textCol)).cast("long").as("_nc"))
      .groupBy(col(sourceCol), col(langCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_nt")).as("n_tokens"),
        sum(col("_nc")).as("n_chars"))
    val totals = perGroup
      .agg(sum(col("n_docs")).as("_td"), sum(col("n_tokens")).as("_tt"))
    perGroup.crossJoin(broadcast(totals))
      .select(col(sourceCol), col(langCol),
        col("n_docs"), col("n_tokens"), col("n_chars"),
        round(col("n_docs").cast("double") / col("_td"), 6)
          .as("doc_share"),
        round(col("n_tokens").cast("double") / col("_tt"), 6)
          .as("token_share"))
  }

  /** Document-length histogram on power-of-two token buckets:
    * `(bucket_lo, n_docs)` where bucket_lo = the highest power of two
    * <= the doc's token count (0 for empty docs) — the
    * length-distribution panel of the card. The exponent comes from
    * the BINARY DIGIT COUNT (`conv` base conversion — exact integer
    * math), never floor(log2(…)): float log2 of an exact power of two
    * can land a hair under the integer and flip the bucket, and it
    * does so differently per engine. */
  def lengthHistogram(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(TextOps.tokenCount(col(textCol)).as("_nt"))
      .withColumn("_bits",
        length(conv(col("_nt").cast("string"), 10, 2)).cast("int"))
      .withColumn("bucket_lo",
        when(col("_nt") <= 0, lit(0L))
          // functions.shiftleft only takes a literal bit count — the
          // SQL form accepts a column
          .otherwise(expr("CAST(shiftleft(CAST(1 AS BIGINT), _bits - 1) AS BIGINT)")))
      .groupBy(col("bucket_lo"))
      .agg(count(lit(1)).as("n_docs"))
}
