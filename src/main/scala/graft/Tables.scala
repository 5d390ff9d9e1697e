package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
      // The driver has regenerated events.parquet with DIFFERENT physical
      // types for `ts` across rounds: TIMESTAMP(NANOS) (rounds ≤8, which
      // Spark's vectorized reader rejects outright without the nanosAsLong
      // escape hatch) and TIMESTAMP_MICROS NTZ (round 9+). Hardcoding
      // either shape broke 7 gates when the file changed under us, so
      // branch on what the file actually contains.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventsTs(spark.read.parquet(s"$dir/$name.parquet"))
    } else if (name == "embeddings") {
      normalizeEmbedding(spark.read.parquet(s"$dir/$name.parquet"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
    widen(spark, df)
  }

  /** The similarity/ANN stack contracts on `embedding: array<float>`.
    * Parquet written as list<double> (a plausible future testdata
    * regeneration, same class of silent break as the events `ts`
    * flip) narrows here — cheap insurance at the one load site. */
  private[graft] def normalizeEmbedding(raw: DataFrame): DataFrame =
    raw.schema("embedding").dataType match {
      case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, _) =>
        raw.withColumn("embedding", col("embedding").cast("array<float>"))
      case _ => raw
    }

  /** Make `ts` a session-TZ TimestampType whatever the parquet carried:
    *  - LongType: raw int64 nanos (nanosAsLong reading of TIMESTAMP(NANOS)).
    *    Integer `DIV` — double division loses precision above 2^53 ns,
    *    i.e. any modern epoch; truncation matches DuckDB's ns→us cast.
    *  - TIMESTAMP_NTZ: wall-clock micros; reinterpret in the session TZ
    *    (UTC for all graft sessions) so downstream date/window functions
    *    behave identically to the nanos era and to the DuckDB oracle.
    *  - TimestampType: already what we want. */
  private[graft] def normalizeEventsTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
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
