package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The approximate operators' error CONTRACTS, checked against the
  * exact forms at sf0.1 (the largest local corpus — sketch error is
  * scale-dependent, so the bound is asserted where it is hardest). */
class ApproxSpec extends SparkSpec {

  private lazy val orders = graft.Tables.load(spark, sf("sf0.1"), "orders")

  test("approxCardinality: relative error within 3*rsd vs exact, at sf0.1") {
    val exact = orders.agg(
      countDistinct(col("o_custkey")).as("c"),
      countDistinct(col("o_orderkey")).as("k")).head()
    val approx = Approx.approxCardinality(orders,
      Seq("o_custkey", "o_orderkey"), rsd = 0.05).head()
    Seq(0, 1).foreach { i =>
      val (e, a) = (exact.getLong(i).toDouble, approx.getLong(i).toDouble)
      val rel = math.abs(a - e) / e
      assert(rel <= 0.15, s"col $i: approx $a vs exact $e — rel err $rel > 3*rsd")
    }
  }

  test("approxCardinality flags: low-cardinality columns are HLL-exact") {
    // 5 distinct priorities / 3 statuses: the sketch counts them exactly,
    // so the gate flags cannot flap on data growth
    val row = Approx.approxCardinalityCheck(orders,
      Seq("o_orderpriority", "o_orderstatus"), rsd = 0.05, tol = 0.0).head()
    assert(row.getBoolean(row.fieldIndex("o_orderpriority_ok")))
    assert(row.getBoolean(row.fieldIndex("o_orderstatus_ok")))
  }

  test("approxPercentiles: value error within 1% of exact at sf0.1") {
    val exact = orders.agg(
      expr("percentile(o_totalprice, 0.5)").as("p50"),
      expr("percentile(o_totalprice, 0.99)").as("p99")).head()
    val approx = Approx.approxPercentiles(orders, "o_totalprice",
      Seq(0.5, 0.99), accuracy = 10000).head()
    Seq(0, 1).foreach { i =>
      val (e, a) = (exact.getDouble(i), approx.getDouble(i))
      val rel = math.abs(a - e) / math.abs(e)
      assert(rel <= 0.01, s"prob $i: approx $a vs exact $e — rel err $rel")
    }
  }

  test("flags survive degenerate inputs: all-NULL column, sub-percent probs") {
    import spark.implicits._
    // all-NULL column: exact distinct = 0 — a perfect approx (also 0)
    // must flag TRUE, not NaN-false
    val nulls = Seq.fill(10)(Tuple1(null: java.lang.Long)).toDF("v")
    val r = Approx.approxCardinalityCheck(nulls, Seq("v")).head()
    assert(r.getLong(0) == 0L && r.getBoolean(1), s"all-NULL must flag ok: $r")
    // 0.999 vs 1.0 must not collapse onto one "p100" column
    val d = Approx.approxPercentilesCheck(
      (1 to 1000).map(_.toDouble).toDF("x"), "x", Seq(0.999, 1.0))
    assert(d.columns.toSeq == Seq("p99_9", "p99_9_ok", "p100", "p100_ok"))
    val row = d.head()
    assert(row.getBoolean(1) && row.getBoolean(3))
  }

  test("check frames expose exact values + flags only (gate contract)") {
    val d = Approx.approxPercentilesCheck(orders, "o_totalprice", Seq(0.5, 0.9))
    assert(d.columns.toSeq == Seq("p50", "p50_ok", "p90", "p90_ok"))
    val c = Approx.approxCardinalityCheck(orders, Seq("o_custkey"))
    assert(c.columns.toSeq == Seq("o_custkey", "o_custkey_ok"))
    assert(c.head().getBoolean(1), "flag must hold at sf0.1")
  }
}
