package graft

/** Plan-quality regression guards: the physical plans the engine is
  * DESIGNED to produce (pushdown, pruning, broadcast, top-k without
  * full sort) must not silently degrade. Checks the explain output of
  * representative gate queries. */
class PlanQualitySpec extends SparkSpec {

  private def plan(name: String): String = {
    val qe = SparkEntry.queries(name)(spark, sf("sf0.01")).queryExecution
    qe.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q01: filter pushed to parquet scan + pruned read schema") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      "shipdate filter must reach the scan")
    assert(!p.contains("l_tax"), "untouched columns must be pruned from the read")
  }

  test("q06: all three predicates pushed, aggregate-only projection") {
    val p = plan("q06_revenue_forecast")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"))
    assert(p.contains("LessThan(l_quantity,24.0)"))
    assert(!p.contains("l_returnflag"), "only filter/agg columns read")
  }

  test("q03: dimension sides broadcast, top-10 is TakeOrdered not full sort") {
    val p = plan("q03_shipping_priority")
    assert(p.contains("BroadcastHashJoin"), "customer/orders side must broadcast")
    assert(p.contains("TakeOrderedAndProject"), "LIMIT 10 must not global-sort")
  }

  test("q07: anti-join stays a hash anti-join") {
    val p = plan("q07_customers_without_orders")
    assert(p.contains("LeftAnti"), "new-rows detection must be an anti-join")
  }

  test("q31: native dot product expression is in the plan (not zip_with)") {
    val p = plan("q31_cosine_topk")
    assert(p.contains("graft_dot"), "similarity must use the native expression")
    assert(p.contains("TakeOrderedAndProject"), "top-k must not global-sort")
  }

  private def explainOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("keyHistogram: share total is a broadcast scalar, not a global window") {
    val df = spark.read.parquet(sf("sf0.01") + "/lineitem.parquet")
    val p = explainOf(graft.ops.Skew.keyHistogram(df, "l_suppkey"))
    // an empty-frame Window would funnel every distinct key through one task
    assert(!p.contains("Window"), "no single-partition window allowed:\n" + p)
    assert(p.contains("BroadcastExchange"), "total must broadcast")
  }

  test("table-cardinality summary reads the table ONCE (no per-column scans)") {
    val df = spark.read.parquet(sf("sf0.01") + "/nation.parquet")
    val p = explainOf(graft.apps.TableCardinality.summary(df))
    // count node-detail entries "(n) Scan parquet" — one per scan node
    val scans = p.linesIterator.count(_.trim.matches("""\(\d+\) Scan parquet\s*.*"""))
    assert(scans == 1, s"expected a single scan, plan has $scans:\n" + p)
    assert(!p.contains("Union"), "summary must not union per-column jobs")
    assert(!p.contains("Window"))
  }
}
