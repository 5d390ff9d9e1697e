package graft.text

import graft.ops.TopK
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction per document — the classic salience
  * score (sklearn's smoothed formulation:
  * `tf · (ln((N+1)/(df+1)) + 1)`), used in curation pipelines for
  * topic tagging, near-boilerplate detection, and cheap keyword
  * indexes over a crawl.
  *
  * Distributed shape at 100 TB: ONE tokenize-explode pass →
  * map-side-combined `(doc, term)` counts (the only corpus-sized
  * shuffle) → term-keyed doc-frequency aggregate over the already
  * distilled tf table (vocabulary-sized, far smaller than the
  * corpus) → join back on term → bounded-heap top-k per doc via the
  * custom [[graft.plans.TopKPerGroup]] operator (O(n log k), no full
  * per-doc sort, reusing the tf shuffle's doc co-location is left to
  * AQE). The corpus N rides a broadcast 1-row frame — nothing is
  * collected to the driver.
  *
  * Determinism across engines: tf/df/N are integers; the score is
  * one `ln` + one multiply on integer-derived doubles, rounded to 6
  * decimals BEFORE ranking on (score DESC, term ASC). Equal-math
  * scores only arise from equal (tf, df) pairs (Baker's theorem —
  * distinct rational log arguments cannot coincide), which produce
  * bit-identical doubles in each engine, so the term tie-break makes
  * the ranking engine-independent.
  */
object TfIdf {

  /** Top-k terms per document: `(id, rank, term, tf, df, score)`. */
  def topKTerms(df: DataFrame, idCol: String, textCol: String,
                k: Int): DataFrame = {
    val w = df.select(col(idCol),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
    val tf = w.groupBy(col(idCol), col("term"))
      .agg(count("*").as("tf"))
    val dfq = tf.groupBy(col("term")).agg(count("*").as("df"))
    val n = df.agg(count("*").cast("double").as("n_docs"))
    val scored = tf.join(dfq, "term").crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") *
          (log((col("n_docs") + 1.0) / (col("df") + 1.0)) + 1.0), 6))
    TopK.topKPerGroup(scored, Seq(idCol),
        Seq(("score", false), ("term", true)), k, "rank")
      .select(col(idCol), col("rank"), col("term"), col("tf"),
        col("df"), col("score"))
  }
}
