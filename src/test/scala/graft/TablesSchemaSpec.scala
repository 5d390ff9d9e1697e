package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.types._

/** The driver regenerates /root/testdata between rounds and has already
  * shipped events.ts under TWO different parquet types: TIMESTAMP(NANOS)
  * (read as raw int64 under nanosAsLong) and TIMESTAMP_MICROS NTZ.
  * Round 9 lost 7 green gates because the loader hardcoded one shape.
  * This spec pins `Tables.normalizeEventsTs` on every variant and does a
  * real parquet round trip for the two shapes Spark can itself write, so
  * the NEXT regeneration fails here — in CI — not in the driver's gate.
  */
class TablesSchemaSpec extends SparkSpec {
  import spark.implicits._

  private val microsOfRef = 1700000000123456L // 2023-11-14T22:13:20.123456Z

  test("long nanos variant converts with integer DIV (no double precision loss)") {
    val nanos = microsOfRef * 1000L + 789L // sub-microsecond residue truncates
    val df = Seq((1L, nanos)).toDF("event_id", "ts")
    val out = Tables.normalizeEventsTs(df)
    assert(out.schema("ts").dataType === TimestampType)
    val got = out.select(col("ts")).as[Timestamp].head()
    assert(got.getTime === microsOfRef / 1000L)
    assert(got.getNanos === (microsOfRef % 1000000L).toInt * 1000)
  }

  test("TIMESTAMP_NTZ variant casts to session-TZ timestamp, same instant under UTC") {
    val df = Seq((1L, microsOfRef)).toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    assert(df.schema("ts").dataType === TimestampNTZType)
    val out = Tables.normalizeEventsTs(df)
    assert(out.schema("ts").dataType === TimestampType)
    assert(out.select(col("ts").cast(LongType)).as[Long].head() === microsOfRef / 1000000L)
  }

  test("already-TimestampType variant passes through untouched") {
    val df = Seq((1L, new Timestamp(microsOfRef / 1000L))).toDF("event_id", "ts")
    val out = Tables.normalizeEventsTs(df)
    assert(out.schema("ts").dataType === TimestampType)
    assert(out.select(col("ts")).as[Timestamp].head().getTime === microsOfRef / 1000L)
  }

  private def roundTrip(write: String => Unit): StructType = {
    val dir = Files.createTempDirectory("graft-events-schema").toFile
    dir.deleteOnExit()
    write(s"${dir.getAbsolutePath}/events.parquet")
    Tables.load(spark, dir.getAbsolutePath, "events").schema
  }

  test("parquet round trip: NTZ micros file loads and analyzes") {
    val schema = roundTrip { path =>
      Seq((1L, microsOfRef)).toDF("event_id", "us")
        .select(col("event_id"),
          timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
        .write.parquet(path)
    }
    assert(schema("ts").dataType === TimestampType)
  }

  test("parquet round trip: UTC-adjusted micros file loads and analyzes") {
    val schema = roundTrip { path =>
      Seq((1L, new Timestamp(microsOfRef / 1000L))).toDF("event_id", "ts")
        .write.parquet(path)
    }
    assert(schema("ts").dataType === TimestampType)
  }

  test("embeddings written as list<double> narrow to array<float> on load") {
    val dir = Files.createTempDirectory("graft-emb-schema").toFile
    dir.deleteOnExit()
    Seq((1L, Array(0.25, 0.5), 0)).toDF("vec_id", "embedding", "label")
      .write.parquet(s"${dir.getAbsolutePath}/embeddings.parquet")
    val df = Tables.load(spark, dir.getAbsolutePath, "embeddings")
    assert(df.schema("embedding").dataType ===
      ArrayType(FloatType, containsNull = true))
    assert(df.select(col("embedding")).as[Array[Float]].head().toSeq
      === Seq(0.25f, 0.5f))
  }

  test("driver testdata embeddings load with the array<float> contract") {
    val df = Tables.load(spark, sf(), "embeddings")
    assert(df.schema("embedding").dataType.isInstanceOf[ArrayType])
    assert(df.schema("embedding").dataType.asInstanceOf[ArrayType]
      .elementType === FloatType)
  }

  test("driver testdata events loads, has TimestampType ts, and is queryable") {
    val df = Tables.load(spark, sf(), "events")
    assert(df.schema("ts").dataType === TimestampType)
    // the exact expression shape that failed analysis in round 9
    assert(df.selectExpr("date_trunc('hour', ts) AS h").limit(1).count() === 1)
  }
}
