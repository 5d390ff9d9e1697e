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

  /** The first-failing-rule verdict over staged signal columns —
    * shared by the batch and per-row variants so the two can never
    * disagree on rule order or thresholds. */
  private def reasonExpr(nt: org.apache.spark.sql.Column,
                         alpha: org.apache.spark.sql.Column,
                         nstop: org.apache.spark.sql.Column,
                         top2: org.apache.spark.sql.Column,
                         dup5: org.apache.spark.sql.Column) = {
    val mwl = alpha.cast("double") / nt
    when(nt < MinTokens || nt > MaxTokens, lit("n_tokens"))
      .when(mwl < MinMeanWordLen || mwl > MaxMeanWordLen, lit("word_len"))
      .when(nstop < MinStopwords, lit("stopwords"))
      .when(top2 > TextOps.RepTop2Max || dup5 > TextOps.RepDup5Max,
        lit("repetition"))
      .otherwise(lit("ok"))
  }

  private def withSignals(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("_fw",
        filter(TextOps.words(lower(col(textCol))), w => length(w) > 0))
      .withColumn("_nt", size(col("_fw")).cast("long"))
      .withColumn("_alpha",
        aggregate(col("_fw"), lit(0L), (acc, w) => acc + length(w)))
      .withColumn("_nstop",
        size(filter(col("_fw"),
          w => w.isInCollection(TextOps.Stopwords))).cast("long"))

  /** `(<idCol>, n_tokens, n_stop, keep, reason)` — reason ∈
    * {'n_tokens', 'word_len', 'stopwords', 'repetition', 'ok'}, the
    * first failing rule in that fixed order. One narrow signal pass +
    * the repetition aggregate joined back on the id. */
  def apply(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sig = withSignals(df, textCol)
      .select(col(idCol), col("_nt"), col("_alpha"), col("_nstop"))
    val rep = TextOps.repetitionStats(df, idCol, textCol)
    sig.join(rep, Seq(idCol))
      .withColumn("reason", reasonExpr(col("_nt"), col("_alpha"),
        col("_nstop"), col("top2_frac"), col("dup5_frac")))
      .select(col(idCol), col("_nt").as("n_tokens"),
        col("_nstop").as("n_stop"),
        (col("reason") === "ok").as("keep"), col("reason"))
  }

  /** [[apply]] as PURE per-row expressions — the repetition metrics
    * come from [[TextOps.withRepetitionCols]] instead of the doc-keyed
    * aggregate, so there is no shuffle and no state anywhere: the
    * policy runs unchanged inside a Structured Streaming
    * `readStream → filter → writeStream` (quality-filter documents as
    * they are crawled, no watermark needed). Identical verdicts to
    * the batch form — the rule expression is literally shared. */
  def withDecision(df: DataFrame, idCol: String,
                   textCol: String): DataFrame =
    TextOps.withRepetitionCols(withSignals(df, textCol), textCol,
        "_t2f", "_d5f")
      .withColumn("reason", reasonExpr(col("_nt"), col("_alpha"),
        col("_nstop"), col("_t2f"), col("_d5f")))
      .select(col(idCol), col("_nt").as("n_tokens"),
        col("_nstop").as("n_stop"),
        (col("reason") === "ok").as("keep"), col("reason"))
}
