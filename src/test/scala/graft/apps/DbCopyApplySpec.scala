package graft.apps

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** db-copy modes APPLIED end-to-end on a parquet target — final table
  * state per mode must match the reference's loop semantics
  * (`lwetl/programs/db_copy/main.py:296-316` upsert, `:362-391` sync
  * delete): a mutated source row must land (update/sync), an
  * orphaned target row must survive insert/update but die under sync,
  * and a fresh source row must always be inserted. */
class DbCopyApplySpec extends SparkSpec {
  import spark.implicits._

  // target starts with pk 1..3; row 4 is a target-only orphan
  private def trgRows: DataFrame = Seq(
    (1, "alpha", 10), (2, "beta", 20), (3, "gamma", 30), (4, "orphan", 40))
    .toDF("pk", "name", "qty")

  // source: pk 2 mutated, pk 3 unchanged, pk 5 brand new, pk 4 absent
  private def srcRows: DataFrame = Seq(
    (1, "alpha", 10), (2, "beta2", 99), (3, "gamma", 30), (5, "new", 50))
    .toDF("pk", "name", "qty")

  private def freshTarget(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graftcopy").toString
    val p = s"$dir/t.parquet"
    trgRows.write.parquet(p)
    p
  }

  private def state(p: String): Map[Int, (String, Int)] =
    spark.read.parquet(p).collect()
      .map(r => r.getInt(0) -> (r.getString(1), r.getInt(2))).toMap

  test("insert mode: appends new rows only; mutation ignored, orphan kept") {
    val p = freshTarget()
    val res = DbCopy.applyParquet(spark, srcRows, p, "pk", DbCopy.Insert)
    assert(res == DbCopy.ApplyResult(1, 0, 0))
    val s = state(p)
    assert(s(2) == ("beta", 20), "insert mode must NOT apply the mutation")
    assert(s(4) == ("orphan", 40))
    assert(s(5) == ("new", 50))
    assert(s.size == 5)
  }

  test("update mode: upserts (mutation applied, new row in, orphan kept)") {
    val p = freshTarget()
    val res = DbCopy.applyParquet(spark, srcRows, p, "pk", DbCopy.Update)
    assert(res == DbCopy.ApplyResult(1, 3, 0))
    val s = state(p)
    assert(s(2) == ("beta2", 99), "update mode must apply the mutation")
    assert(s(4) == ("orphan", 40), "update mode keeps orphans")
    assert(s(5) == ("new", 50))
    assert(s.size == 5)
  }

  test("sync mode: upsert + orphan delete → target converges to source") {
    val p = freshTarget()
    val res = DbCopy.applyParquet(spark, srcRows, p, "pk", DbCopy.Sync)
    assert(res == DbCopy.ApplyResult(1, 3, 1))
    val s = state(p)
    assert(s(2) == ("beta2", 99))
    assert(!s.contains(4), "sync mode must delete the orphan")
    assert(s(5) == ("new", 50))
    assert(s.size == 4)
    // convergence: re-running sync is a no-op
    val res2 = DbCopy.applyParquet(spark, srcRows, p, "pk", DbCopy.Sync)
    assert(res2 == DbCopy.ApplyResult(0, 4, 0))
  }

  test("DbCopyMain end-to-end: update mode mutates the target through the CLI") {
    Mains.keepSessionForTests = true
    val trgDir = java.nio.file.Files.createTempDirectory("graftmain").toString
    // seed the target with a full copy, then mutate the target's nation
    // table so only an applied update/sync can converge it back
    DbCopyMain.main(Array(sf(), trgDir, "insert"))
    val p = s"$trgDir/nation.parquet"
    val mutated = spark.read.parquet(p)
      .withColumn("n_name",
        org.apache.spark.sql.functions.when(col("n_nationkey") === 0,
          org.apache.spark.sql.functions.lit("MUTATED"))
          .otherwise(col("n_name")))
    val tmp = p + ".mut"
    mutated.write.parquet(tmp)
    DbCopy.applyParquet(spark, spark.read.parquet(tmp), p, "n_nationkey", DbCopy.Sync)

    // insert mode must NOT repair the mutation...
    DbCopyMain.main(Array(sf(), trgDir, "insert"))
    val afterInsert = spark.read.parquet(p)
      .filter(col("n_nationkey") === 0).head().getAs[String]("n_name")
    assert(afterInsert == "MUTATED", "insert mode leaves existing rows alone")

    // ...update mode must
    DbCopyMain.main(Array(sf(), trgDir, "update"))
    val afterUpdate = spark.read.parquet(p)
      .filter(col("n_nationkey") === 0).head().getAs[String]("n_name")
    assert(afterUpdate != "MUTATED", "update mode must apply source values")
    assert(spark.read.parquet(p).count() == 25)
  }

  test("missing target: full copy regardless of mode") {
    val dir = java.nio.file.Files.createTempDirectory("graftcopy").toString
    val p = s"$dir/t.parquet"
    val res = DbCopy.applyParquet(spark, srcRows, p, "pk", DbCopy.Sync)
    assert(res == DbCopy.ApplyResult(4, 0, 0))
    assert(state(p).size == 4)
  }
}
