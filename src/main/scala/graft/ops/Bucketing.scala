package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed, co-located joins — the shuffle-elimination path for the
  * big repeated joins (brief: "bucketing for co-located joins").
  *
  * Writing both sides bucketed by the join key into the session catalog
  * means every subsequent equi-join on that key runs WITHOUT a shuffle
  * exchange on either side: each task zips bucket i with bucket i. At
  * 100 TB this converts the fact-fact join (lineitem ⋈ orders) from the
  * dominant network cost into a local merge — the one-time bucketing
  * write amortizes over every downstream query. */
object Bucketing {

  /** Write `df` as a bucketed+sorted catalog table (parquet). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — produces a
    * shuffle-free sort-merge join when both are bucketed the same. */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
