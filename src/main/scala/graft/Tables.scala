package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Access to the driver-provided TPC-H-ish parquet test tables
  * (see TESTDATA.md). At cluster scale these would be catalog tables;
  * here they are raw parquet directories keyed by scale-factor dir.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects (PARQUET_TYPE_ILLEGAL). Read the raw int64 nanos
      // and convert with integer division — double division would lose
      // precision above 2^53 ns (~year 1970+104 days... i.e. any modern
      // epoch), so `DIV` it is. Truncation matches DuckDB's ns→us cast.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
    widen(spark, df)
  }

  /** The test tables are single-row-group parquet files, which scan as
    * ONE task no matter the core count — every downstream map runs
    * single-threaded until the first shuffle. Round-robin repartition
    * when the scan is narrower than the session's parallelism; on real
    * cluster data (many splits) this is a no-op, and filters/pruning
    * still push through Repartition into the scan. */
  private def widen(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < math.max(2, target / 2)) df.repartition(target)
    else df
  }

  /** Register every table as a temp view so `spark.sql` surfaces work
    * against the same names the DuckDB oracle uses. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
