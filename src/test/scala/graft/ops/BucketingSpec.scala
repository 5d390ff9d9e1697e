package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.ExplainMode

class BucketingSpec extends SparkSpec {

  test("co-located join of bucketed tables has no shuffle exchange") {
    val ord = graft.Tables.load(spark, sf(), "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val li = graft.Tables.load(spark, sf(), "lineitem")
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Bucketing.writeBucketed(ord, "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(li, "b_lineitem", "o_orderkey", 4)

    // disable auto-broadcast so the join strategy decision is about
    // bucketing, not table size
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(plan.contains("SortMergeJoin"))
      // the only acceptable exchanges are none on the join inputs:
      // formatted plan for a bucketed SMJ shows no Exchange operators
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // and it must still produce correct results
      val n = joined.count()
      val li0 = graft.Tables.load(spark, sf(), "lineitem")
      val ord0 = graft.Tables.load(spark, sf(), "orders")
      val expected = li0.join(ord0, li0("l_orderkey") === ord0("o_orderkey")).count()
      assert(n == expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
