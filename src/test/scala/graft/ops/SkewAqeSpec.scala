package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the claim in [[Skew]]'s scaladoc that AQE's skew-join splitting
  * handles moderate skew at runtime — a deliberately skewed sort-merge
  * join must come back with `skew=true` partitions in the FINAL
  * adaptive plan, not just in a comment. */
class SkewAqeSpec extends SparkSpec {

  test("AQE splits the hot partition: final plan shows skew=true") {
    val confs = Map(
      // force a shuffle join and make the skew detector fire at test scale
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.keys.map(k =>
      k -> scala.util.Try(spark.conf.get(k)).toOption).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 95% of the big side lands on key 0; payload fattens the bytes
      val big = spark.range(200000).select(
        when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
        concat(lit("x"), lpad(col("id").cast("string"), 64, "0")).as("payload"))
      val dim = spark.range(200001).select(col("id").as("k"), col("id").as("v"))
      val joined = big.join(dim, "k")
      // collect() drives THIS dataset's QueryExecution, so its adaptive
      // plan finalizes (count() would spawn a separate execution)
      assert(joined.collect().length == 200000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE must have split the hot key-0 partition:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
