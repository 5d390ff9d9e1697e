package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram language-model scoring for corpus curation — the CCNet-style
  * quality signal (Wenzek et al. 2020, public knowledge): score every
  * document by the perplexity of a small LM trained on a reference
  * corpus, then filter/bucket on the score. A full KenLM doesn't fit a
  * JVM-only container, so the model here is an add-alpha-smoothed
  * BIGRAM model — the same pipeline shape (train counts on a reference
  * split, join-score the corpus) at the smallest order that exercises
  * it.
  *
  * Scale shape: the MODEL IS A DATAFRAME, never driver state — at
  * 100 TB the distinct-bigram table is itself huge (billions of rows),
  * so scoring is a plain shuffle join on (w1, w2) between two
  * corpus-scale relations, with map-side-combined counts on both
  * sides; nothing is collected or broadcast. Per-document aggregation
  * is one more doc-keyed shuffle. Everything before the joins is a
  * narrow explode of in-document adjacency — no cross-document work.
  */
object LangModel {

  /** One row per in-document word adjacency: `(<idCol>, w1, w2)` over
    * the whitespace-normalized lowercase token stream. Narrow —
    * explode only. */
  def bigrams(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = TextOps.words(lower(col(textCol)))
    val pairTy = "array<struct<w1:string,w2:string>>"
    val pairs = when(size(col("_w")) >= 2,
      transform(sequence(lit(1), size(col("_w")) - 1),
        i => struct(element_at(col("_w"), i).as("w1"),
                    element_at(col("_w"), i + 1).as("w2"))))
      .otherwise(array().cast(pairTy))
    df.select(col(idCol), w.as("_w"))
      .select(col(idCol), explode(pairs).as("_p"))
      .select(col(idCol), col("_p.w1").as("w1"), col("_p.w2").as("w2"))
  }

  /** The trained model: bigram context counts. `counts` is
    * `(w1, w2, c12)`; context totals `c1 = Σ_w2 c12` derive from it at
    * scoring time (consistent by construction — a word's context count
    * excludes its appearances in final position). `vocabSize` is the
    * distinct-word count of the training corpus — the only driver
    * scalar, used by the smoothing denominator. */
  final case class BigramModel(counts: DataFrame, vocabSize: Long)

  def trainBigrams(df: DataFrame, textCol: String): BigramModel = {
    val counts = bigrams(df.select(lit(0L).as("_id"), col(textCol)),
        "_id", textCol = textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val vocab = df.select(explode(TextOps.words(lower(col(textCol))))
        .as("w"))
      .filter(length(col("w")) > 0)
      .select(countDistinct(col("w")))
      .head().getLong(0)
    BigramModel(counts, vocab)
  }

  /** Per-document bigram cross-entropy under the model, add-alpha
    * smoothed: P(w2|w1) = (c12 + α) / (c1 + α·V). Output one row per
    * document that HAS at least one bigram: `(<idCol>, n_bigrams,
    * ppl_bits)` where `ppl_bits = round(avg(-log2 P), 4)` — the
    * quality score a curation pipeline thresholds on (lower = more
    * reference-like). Two shuffle joins against the model (bigram,
    * then context totals) + one doc-keyed aggregate. */
  def scorePerplexity(df: DataFrame, idCol: String, textCol: String,
                      model: BigramModel, alpha: Double = 0.5): DataFrame = {
    val ctx = model.counts.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val denomV = lit(alpha) * lit(model.vocabSize.toDouble)
    bigrams(df, idCol, textCol)
      .join(model.counts, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .withColumn("_p",
        (coalesce(col("c12"), lit(0L)).cast("double") + lit(alpha)) /
          (coalesce(col("c1"), lit(0L)).cast("double") + denomV))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(-log2(col("_p"))), 4).as("ppl_bits"))
  }

  /** Integer-exact novelty vs the training corpus: how many of a
    * document's bigrams the model has seen. `(<idCol>, n_bigrams,
    * n_seen)` — the memorization/contamination-risk signal next to
    * [[graft.text.Decontaminate]]'s exact n-gram hits. One shuffle
    * join + one doc-keyed aggregate. */
  def bigramNovelty(df: DataFrame, idCol: String, textCol: String,
                    model: BigramModel): DataFrame =
    bigrams(df, idCol, textCol)
      .join(model.counts, Seq("w1", "w2"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c12").isNotNull, 1L).otherwise(0L)).as("n_seen"))
}
