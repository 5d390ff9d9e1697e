package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tunable thresholds for [[FilterPolicy]] — a policy someone tuned
  * for one corpus must ship WITH that corpus, so the config is a
  * first-class artifact ([[FilterPolicy.savePolicy]] /
  * [[FilterPolicy.loadPolicy]], the `saveTokenizer`/`saveParams`
  * idiom): a one-row parquet that travels next to the curated data
  * and reproduces the exact keep/drop decisions later or elsewhere. */
case class PolicyConfig(minTokens: Long, maxTokens: Long,
                        minMeanWordLen: Double, maxMeanWordLen: Double,
                        minStopwords: Long,
                        maxTop2Frac: Double, maxDup5Frac: Double)

object PolicyConfig {
  /** Gopher's published bounds (Rae et al. 2021 appendix A; scaled
    * token minimum — the reference corpus documents are 10-100
    * tokens, so the 50-token paper floor is taken at 30). */
  val Gopher: PolicyConfig = PolicyConfig(
    minTokens = 30, maxTokens = 100000,
    minMeanWordLen = 3.0, maxMeanWordLen = 10.0,
    minStopwords = 2,
    maxTop2Frac = TextOps.RepTop2Max, maxDup5Frac = TextOps.RepDup5Max)
}

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

  /** The default bounds (kept as fields for source compatibility —
    * [[PolicyConfig.Gopher]] is the structured form). */
  val MinTokens = 30
  val MaxTokens = 100000
  val MinMeanWordLen = 3.0
  val MaxMeanWordLen = 10.0
  val MinStopwords = 2

  /** The first-failing-rule verdict over staged signal columns —
    * shared by the batch and per-row variants so the two can never
    * disagree on rule order or thresholds. */
  private def reasonExpr(cfg: PolicyConfig)(
                         nt: org.apache.spark.sql.Column,
                         alpha: org.apache.spark.sql.Column,
                         nstop: org.apache.spark.sql.Column,
                         top2: org.apache.spark.sql.Column,
                         dup5: org.apache.spark.sql.Column) = {
    val mwl = alpha.cast("double") / nt
    when(nt < cfg.minTokens || nt > cfg.maxTokens, lit("n_tokens"))
      .when(mwl < cfg.minMeanWordLen || mwl > cfg.maxMeanWordLen,
        lit("word_len"))
      .when(nstop < cfg.minStopwords, lit("stopwords"))
      .when(top2 > cfg.maxTop2Frac || dup5 > cfg.maxDup5Frac,
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
  def apply(df: DataFrame, idCol: String, textCol: String,
            config: PolicyConfig = PolicyConfig.Gopher): DataFrame = {
    val sig = withSignals(df, textCol)
      .select(col(idCol), col("_nt"), col("_alpha"), col("_nstop"))
    val rep = TextOps.repetitionStats(df, idCol, textCol)
    sig.join(rep, Seq(idCol))
      .withColumn("reason", reasonExpr(config)(col("_nt"), col("_alpha"),
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
  def withDecision(df: DataFrame, idCol: String, textCol: String,
                   config: PolicyConfig = PolicyConfig.Gopher): DataFrame =
    TextOps.withRepetitionCols(withSignals(df, textCol), textCol,
        "_t2f", "_d5f")
      .withColumn("reason", reasonExpr(config)(col("_nt"), col("_alpha"),
        col("_nstop"), col("_t2f"), col("_d5f")))
      .select(col(idCol), col("_nt").as("n_tokens"),
        col("_nstop").as("n_stop"),
        (col("reason") === "ok").as("keep"), col("reason"))

  /** Persist a [[PolicyConfig]] as a one-row parquet artifact. */
  def savePolicy(spark: SparkSession, config: PolicyConfig,
                 path: String): Unit = {
    import spark.implicits._
    Seq(config).toDS().toDF()
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[savePolicy]] artifact; fails loudly on anything that is
    * not exactly one row of the seven threshold columns. */
  def loadPolicy(spark: SparkSession, path: String): PolicyConfig = {
    import spark.implicits._
    val df = spark.read.parquet(path)
    val want = Set("minTokens", "maxTokens", "minMeanWordLen",
      "maxMeanWordLen", "minStopwords", "maxTop2Frac", "maxDup5Frac")
    require(df.columns.toSet == want,
      s"not a policy artifact: ${df.columns.mkString(",")}")
    val rows = df.as[PolicyConfig].collect()
    require(rows.length == 1,
      s"policy artifact must be exactly one row, got ${rows.length}")
    rows.head
  }
}
