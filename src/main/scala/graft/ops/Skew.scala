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
    * per-reducer budget; otherwise a plain join + AQE is better.
    *
    * Only skewed-side-preserving join types are salt-safe: the small
    * side is replicated `buckets` times, so right/full outer would emit
    * each unmatched small-side row once PER SALT (wrong results). */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val saltSafe = Set("inner", "left", "leftouter", "leftsemi", "leftanti",
      "semi", "anti")
    require(saltSafe.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin: join type '$joinType' is not salt-safe (the exploded " +
        "small side would duplicate unmatched rows); use inner/left/" +
        "left_semi/left_anti")
    val salted = skewed.withColumn("_salt",
      (rand(42) * buckets).cast("int"))
    val exploded = small.withColumn("_salt",
      explode(array((0 until buckets).map(lit): _*)))
    salted.join(exploded, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Top-N heavy keys with their share — the diagnostic to decide
    * between plain join, AQE, and salting.
    *
    * The total is a broadcast scalar agg, NOT an empty-frame window: a
    * global `sum().over(Window.partitionBy())` would funnel every
    * distinct key through one partition — the exact failure mode this
    * helper exists to diagnose on a high-cardinality key. */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame = {
    val total = df.agg(count(lit(1)).cast("double").as("_total"))
    df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .withColumn("share", round(col("cnt") / col("_total"), 6))
      .drop("_total")
      .orderBy(col("cnt").desc, col(key))
      .limit(topN)
  }
}
