package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** tokenBudgetSelect / tokenBudgetByGroup at stress scale: 300k rows
  * with a fat score-tie mass and a tight `maxLocal`, so the driver-side
  * narrowing runs REAL multi-level descents (score buckets, then the
  * id axis inside the tie) rather than the single bounded window the
  * unit fixtures allow. The expected set is the brute-force prefix
  * computed driver-side — 300k rows sort in milliseconds on the JVM,
  * so the oracle stays exact. */
class BudgetStressSpec extends SparkSpec {
  import spark.implicits._

  // deterministic synthetic corpus: ~30% of rows share score 50.0 (the
  // tie mass the cutoff lands in for mid budgets), the rest spread over
  // 1..99; tokens cycle 1..10
  private val n = 300000L
  private def scoreOf(i: Long): Double =
    if (i % 10 < 3) 50.0 else ((i * 37) % 99 + 1).toDouble
  private def tokOf(i: Long): Long = i % 10 + 1

  private lazy val df = spark.range(0, n).select(
    col("id"),
    when(col("id") % 10 < 3, 50.0)
      .otherwise((col("id") * 37 % 99 + 1).cast("double")).as("score"),
    (col("id") % 10 + 1).as("tok"))

  private def brute(budget: Long): Set[Long] = {
    var acc = 0L
    (0L until n).map(i => (i, scoreOf(i), tokOf(i)))
      .sortBy { case (id, s, _) => (-s, id) }
      .takeWhile { case (_, _, t) => { acc += t; acc <= budget } }
      .map(_._1).toSet
  }

  test("tokenBudgetSelect: 300k rows, maxLocal 2000 — multi-level " +
      "score + tie narrowing matches the brute prefix, and the cutoff " +
      "lands inside the tie mass") {
    val total = (0L until n).map(tokOf).sum
    // ~55% budget: high scores (51..99) plus part of the 50.0 tie mass
    val budget = total * 11 / 20
    val logs = scala.collection.mutable.ArrayBuffer.empty[String]
    val got = Sampling.tokenBudgetSelect(df, "id", "score", "tok",
        budget, buckets = 64, maxLocal = 2000L,
        log = m => logs.synchronized { logs += m })
      .select("id").as[Long].collect().toSet
    val expect = brute(budget)
    assert(got.size == expect.size && got == expect,
      s"stress divergence: got ${got.size}, expected ${expect.size}")
    // the 90k-row tie at 50.0 far exceeds maxLocal, so the log must
    // show the id-axis levels running
    assert(logs.exists(_.contains("tie at score 50.0")),
      s"expected id-axis narrowing in the logs, got: $logs")
  }

  test("tokenBudgetByGroup: 10 groups x 30k rows, per-group budgets — " +
      "every group's prefix matches brute force") {
    val g = df.withColumn("grp", concat(lit("g"), col("id") % 10))
    val rows = (0L until n).map(i =>
      (i, s"g${i % 10}", scoreOf(i), tokOf(i)))
    val budgets = (0 until 10)
      .map(k => s"g$k" -> (3000L + 7000L * k)).toMap
    val got = Sampling.tokenBudgetByGroup(g, "id", "grp", "score",
        "tok", budgets, buckets = 32, maxLocal = 1500L, log = _ => ())
      .select("id").as[Long].collect().toSet
    val expect = rows.groupBy(_._2).flatMap { case (grp, rs) =>
      var acc = 0L
      rs.sortBy { case (id, _, s, _) => (-s, id) }
        .takeWhile { case (_, _, _, t) => { acc += t; acc <= budgets(grp) } }
        .map(_._1)
    }.toSet
    assert(got.size == expect.size && got == expect,
      s"group stress divergence: got ${got.size}, expected ${expect.size}")
  }
}
