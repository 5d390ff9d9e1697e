package graft.apps

import graft.SparkSpec
import graft.io.Config
import org.apache.spark.sql.functions._

/** End-to-end db-copy against a LIVE JDBC target (embedded Derby) —
  * the reference's actual workflow: read target PKs, anti-join new
  * source rows, batched JDBC append, re-run → converged. */
class DbCopyJdbcSpec extends SparkSpec {
  import spark.implicits._

  test("copy parquet source → JDBC target, incremental convergence") {
    val dbDir = java.nio.file.Files.createTempDirectory("graftdb2")
    val cfg = Config.Conf(
      drivers = Map("derby" -> Config.Driver("jdbc:derby:")),
      servers = Map("trg" -> Config.Server("derby", s"$dbDir/db;create=true")))
    val r = Config.parseLogin(cfg, "trg")

    val nation = graft.Tables.load(spark, sf(), "nation")

    // initial full copy
    Config.writeJdbc(nation, r, "NATION")
    val trg1 = Config.readJdbc(spark, r, "NATION")
    assert(trg1.count() == 25)

    // re-run: plan yields zero new rows (converged)
    val plan1 = DbCopy.plan(nation, trg1.select(col("n_nationkey")), "n_nationkey", DbCopy.Insert)
    assert(plan1.toInsert.count() == 0)

    // source grows → only the delta is appended
    val grown = nation.unionByName(
      Seq((90, "ATLANTIS", 0), (91, "LEMURIA", 1))
        .toDF("n_nationkey", "n_name", "n_regionkey"))
    val plan2 = DbCopy.plan(grown, Config.readJdbc(spark, r, "NATION")
      .select(col("n_nationkey")), "n_nationkey", DbCopy.Insert)
    assert(plan2.toInsert.count() == 2)
    Config.writeJdbc(plan2.toInsert, r, "NATION")
    assert(Config.readJdbc(spark, r, "NATION").count() == 27)

    // sync mode sees the orphans if the source shrinks back
    val plan3 = DbCopy.plan(nation, Config.readJdbc(spark, r, "NATION")
      .select(col("n_nationkey")), "n_nationkey", DbCopy.Sync)
    assert(plan3.toDelete.get.count() == 2)
  }
}
