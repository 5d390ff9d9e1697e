package graft

/** Benchmark main: runs every gate query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Each query runs twice and reports the MIN —
  * run 1 pays per-query codegen compilation (a one-time cost a resident
  * engine amortizes); min-of-2 is the steady-state number and halves
  * run-to-run variance on a shared machine. A generic warm-up covers
  * the common operator shapes before timing starts. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build("graft-bench", s"local[$cpus]")
    spark.sparkContext.setLogLevel("WARN")
    locally { // untimed warm-up: scan/agg/join/window/sort codegen
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val a = spark.range(100000).select(col("id"), (col("id") % 97).as("k"),
        rand(7).as("v"))
      val b = spark.range(1000).select(col("id").as("k"))
      a.join(b, a("k") === b("k")).groupBy(a("k")).agg(sum("v").as("s"))
        .withColumn("rn", row_number().over(Window.orderBy(col("s"))))
        .orderBy(col("s").desc).limit(10).count()
    }
    def one(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t1 = one(fn)
      val t2 = one(fn)
      name -> (if (t1 < 0 || t2 < 0) -1.0 else math.min(t1, t2))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
