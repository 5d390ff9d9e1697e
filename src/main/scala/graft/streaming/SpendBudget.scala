package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The spend-registry budget discipline [[CurateStream]] introduced
  * for tokens, factored for the media (bytes) and embedding (vector
  * count) streams: cumulative spend lives in a `spend/` state
  * registry (one row per batch, per-batch-subdir overwrites +
  * id-excluded reads ⇒ replays never double-count), each trigger
  * admits its measure-richest acceptance prefix into the REMAINING
  * headroom, and the registry compacts with the other state dirs
  * (readers SUM rows, so folding preserves the total). */
private[streaming] object SpendBudget {

  /** Cumulative spend recorded BEFORE this batch (id-excluded — a
    * replayed batch never sees its own previous write). */
  def spent(spark: SparkSession, stateDir: String, batchId: Long): Long =
    StreamState.read(spark, s"$stateDir/spend", batchId)
      .map(_.agg(coalesce(sum(col("spend")), lit(0L))).head().getLong(0))
      .getOrElse(0L)

  /** Record this batch's spend — one row, overwritten per subdir like
    * every other state write, so the running total is exactly-once
    * under replay. */
  def record(spark: SparkSession, stateDir: String, batchId: Long,
             spendNow: Long): Unit = {
    import spark.implicits._
    Seq(spendNow).toDF("spend").coalesce(1)
      .write.mode("overwrite").parquet(s"$stateDir/spend/b$batchId")
  }

  /** Admit `accepted0`'s measure-richest (measure DESC, id ASC)
    * prefix into `headroom` ([[graft.ops.Sampling.tokenBudgetSelect]]
    * — scan-side cutoff filter, no global sort). Returns the
    * admitted frame (measure column dropped), this batch's spend
    * (summed off the column the admission already computed — the
    * measure evaluates once), and the [[graft.ops.StageCut]] ROOT the
    * caller must release after its state writes. */
  def admit(accepted0: DataFrame, idCol: String, measure: Column,
            headroom: Long): (DataFrame, Long, DataFrame) = {
    val withM = accepted0.withColumn("_n_spend", measure.cast("long"))
    val admitted0 = graft.ops.StageCut(
      if (headroom <= 0L) withM.filter(lit(false))
      else graft.ops.Sampling.tokenBudgetSelect(withM, idCol,
        "_n_spend", "_n_spend", headroom, log = _ => ()))
    val now = admitted0.agg(coalesce(sum(col("_n_spend")), lit(0L)))
      .head().getLong(0)
    (admitted0.drop("_n_spend"), now, admitted0)
  }

  /** Ledger rows for accepted-but-not-admitted ids:
    * `(idCol, 'quota', reason, NULL winner)` — the text stream's
    * `(quota, token_budget)` shape with a per-stream reason. */
  def drops(accepted0: DataFrame, admitted: DataFrame, idCol: String,
            reason: String,
            idType: org.apache.spark.sql.types.DataType): DataFrame =
    accepted0.select(col(idCol))
      .join(admitted.select(col(idCol)), Seq(idCol), "left_anti")
      .select(col(idCol), lit("quota").as("stage"),
        lit(reason).as("reason"), lit(null).cast(idType).as("winner_id"))

  /** The budget paths ride [[graft.ops.Sampling.tokenBudgetSelect]],
    * which needs integral unique ids — fail at stream START, not in
    * trigger N. */
  def requireIntegralId(df: DataFrame, idCol: String,
                        budgetName: String): Unit =
    require(Set("long", "int", "integer", "short", "byte")
        .contains(df.schema(idCol).dataType.typeName),
      s"$budgetName needs an integral $idCol (the budget cutoff " +
        s"narrows on id ranges), got ${df.schema(idCol).dataType.typeName}")
}
