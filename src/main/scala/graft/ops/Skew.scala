package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for joins whose key distribution has hot
  * keys (SURVEY §7: "skewed keys → salting or AQE skew-join"). AQE's
  * skew-join splitting handles moderate skew at runtime; explicit
  * salting is for the pathological case — a handful of keys carrying a
  * large share of rows — where even a split partition re-skews.
  */
object Skew {

  /** Salted equi-join: the skewed (large) side gets a random salt in
    * [0, buckets); the small side is EXPLODED across every salt value,
    * so each (key, salt) bucket joins independently — a hot key's rows
    * spread over `buckets` reducers instead of one.
    *
    * Cost model: small side inflates x buckets (broadcast-sized tables
    * only); large side adds one int column. Use when one key ≫ the
    * per-reducer budget; otherwise a plain join + AQE is better. */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val salted = skewed.withColumn("_salt",
      (rand(42) * buckets).cast("int"))
    val exploded = small.withColumn("_salt",
      explode(array((0 until buckets).map(lit): _*)))
    salted.join(exploded, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Top-N heavy keys with their share — the diagnostic to decide
    * between plain join, AQE, and salting. One hash-agg + TakeOrdered. */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .withColumn("share",
        round(col("cnt") / sum(col("cnt")).over(Window.partitionBy()), 6))
      .orderBy(col("cnt").desc, col(key))
      .limit(topN)
  }
}
