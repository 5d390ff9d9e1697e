package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed document-filter POLICY — the decision endpoint a
  * Gopher-style curation pipeline runs after computing its signals
  * (Rae et al. 2021 appendix A, public knowledge): token-count
  * bounds, mean-word-length bounds, minimum stopword count,
  * repetition caps. Every signal is computed in the same staged
  * single pass over the token array (no re-tokenization per rule),
  * the repetition fractions arrive from [[TextOps.repetitionStats]]'s
  * doc-keyed aggregate, and the verdict is the FIRST failing rule in
  * a fixed order — so a rejected document says why, the way a
  * production pipeline logs drop reasons.
  *
  * Output is hash-exact across engines: the published floats
  * (fractions, means) stay INTERNAL to the threshold comparisons —
  * rationals of integers compared to shared literals, deterministic
  * in IEEE doubles — and only integers, booleans and the reason
  * string leave the operator. */
object FilterPolicy {

  /** Gopher's published bounds (scaled token minimum: the reference
    * corpus documents are 10-100 tokens, so the 50-token paper floor
    * is taken at 30). */
  val MinTokens = 30
  val MaxTokens = 100000
  val MinMeanWordLen = 3.0
  val MaxMeanWordLen = 10.0
  val MinStopwords = 2

  /** `(<idCol>, n_tokens, n_stop, keep, reason)` — reason ∈
    * {'n_tokens', 'word_len', 'stopwords', 'repetition', 'ok'}, the
    * first failing rule in that fixed order. One narrow signal pass +
    * the repetition aggregate joined back on the id. */
  def apply(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sig = df
      .withColumn("_fw",
        filter(TextOps.words(lower(col(textCol))), w => length(w) > 0))
      .withColumn("_nt", size(col("_fw")).cast("long"))
      .withColumn("_alpha",
        aggregate(col("_fw"), lit(0L), (acc, w) => acc + length(w)))
      .withColumn("_nstop",
        size(filter(col("_fw"),
          w => w.isInCollection(TextOps.Stopwords))).cast("long"))
      .select(col(idCol), col("_nt"), col("_alpha"), col("_nstop"))
    val rep = TextOps.repetitionStats(df, idCol, textCol)
    val mwl = col("_alpha").cast("double") / col("_nt")
    sig.join(rep, Seq(idCol))
      .withColumn("reason",
        when(col("_nt") < MinTokens || col("_nt") > MaxTokens,
          lit("n_tokens"))
        .when(mwl < MinMeanWordLen || mwl > MaxMeanWordLen,
          lit("word_len"))
        .when(col("_nstop") < MinStopwords, lit("stopwords"))
        .when(col("top2_frac") > TextOps.RepTop2Max ||
              col("dup5_frac") > TextOps.RepDup5Max, lit("repetition"))
        .otherwise(lit("ok")))
      .select(col(idCol), col("_nt").as("n_tokens"),
        col("_nstop").as("n_stop"),
        (col("reason") === "ok").as("keep"), col("reason"))
  }
}
