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

  test("DbCopyMain with a jdbc: target runs the full FK-ordered live copy") {
    graft.apps.Mains.keepSessionForTests = true
    val dbDir = java.nio.file.Files.createTempDirectory("graftdbmain")
    val url = s"jdbc:derby:$dbDir/db;create=true"
    // first run: creates + full-copies every table
    DbCopyMain.main(Array(sf(), url, "insert"))
    val cfg = Config.Conf(
      drivers = Map("derby" -> Config.Driver("jdbc:derby:")),
      servers = Map("t" -> Config.Server("derby", s"$dbDir/db")))
    val r = Config.parseLogin(cfg, "t")
    assert(Config.readJdbc(spark, r, "NATION").count() == 25)
    assert(Config.readJdbc(spark, r, "REGION").count() == 5)
    // second run converges: no new rows anywhere
    DbCopyMain.main(Array(sf(), url, "insert"))
    assert(Config.readJdbc(spark, r, "NATION").count() == 25)
    // sync applies a live UPDATE when the target drifts
    val st = java.sql.DriverManager.getConnection(url).createStatement()
    st.execute("UPDATE NATION SET N_NAME = 'DRIFTED' WHERE N_NATIONKEY = 0")
    st.close()
    DbCopyMain.main(Array(sf(), url, "sync"))
    val n0 = Config.readJdbc(spark, r,
      "SELECT N_NAME FROM NATION WHERE N_NATIONKEY = 0").head().getString(0)
    assert(n0 != "DRIFTED", "sync must repair the drifted row")
  }

  test("composite-key update keeps sibling rows distinct (lineitem shape)") {
    val dbDir = java.nio.file.Files.createTempDirectory("graftdbck")
    val cfg = Config.Conf(
      drivers = Map("derby" -> Config.Driver("jdbc:derby:")),
      servers = Map("t" -> Config.Server("derby", s"$dbDir/db;create=true")))
    val r = Config.parseLogin(cfg, "t")
    // two line items of the same order: keying on OK alone would make
    // each UPDATE hit BOTH rows and the last statement win
    val trg0 = graft.ops.Relational.upperCaseColumns(Seq(
      (1, 1, 10.0), (1, 2, 20.0), (2, 1, 30.0)).toDF("ok", "ln", "qty"))
    Config.writeJdbc(trg0, r, "LITEMS")
    val src = graft.ops.Relational.upperCaseColumns(Seq(
      (1, 1, 11.0), (1, 2, 22.0), (2, 1, 30.0)).toDF("ok", "ln", "qty"))
    val res = DbCopy.applyJdbc(spark, src, r, "LITEMS", Seq("OK", "LN"),
      DbCopy.Update, graft.io.SqlRender.Ansi, skipUnchanged = false)
    assert(res.inserted == 0 && res.updated == 3)
    val got = Config.readJdbc(spark, r, "LITEMS").collect()
      .map(row => (row.getInt(0), row.getInt(1)) -> row.getDouble(2)).toMap
    assert(got == Map((1, 1) -> 11.0, (1, 2) -> 22.0, (2, 1) -> 30.0),
      s"sibling rows must keep their own values: $got")
  }

  test("partitioned-range JDBC read driven by live PK metadata (parallel scan)") {
    val dbDir = java.nio.file.Files.createTempDirectory("graftdb4")
    val url = s"jdbc:derby:$dbDir/db;create=true"
    val cfg = Config.Conf(
      drivers = Map("derby" -> Config.Driver("jdbc:derby:")),
      servers = Map("src" -> Config.Server("derby", s"$dbDir/db;create=true")))
    val r = Config.parseLogin(cfg, "src")

    // seed a real-size table (orders, ~1.5k rows at sf0.001)
    val orders = graft.Tables.load(spark, sf(), "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    Config.writeJdbc(graft.ops.Relational.upperCaseColumns(orders), r, "ORDERS_SRC")

    // PK discovered from LIVE driver metadata, not hardcoded — the
    // reference's single ordered cursor becomes N parallel range scans
    val cat = CatalogQueries.fromJdbcMetadata(url)
    // Spark's JDBC writer creates the table without a PK constraint, so
    // metadata yields no PK → fall back the way db-copy would: first
    // column of the table. Both paths exercise fromJdbcMetadata.
    val pk = cat.pk.getOrElse("ORDERS_SRC", "O_ORDERKEY")

    val bounds = Config.readJdbc(spark, r,
      s"SELECT MIN($pk) AS LO, MAX($pk) AS HI FROM ORDERS_SRC").head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    assert(hi > lo)

    val partitioned = Config.readJdbc(spark, r, "ORDERS_SRC",
      partitionOn = Some((pk, lo, hi, 4)))
    assert(partitioned.rdd.getNumPartitions == 4,
      "range read must split into parallel JDBC partitions")
    assert(partitioned.count() == orders.count())
    // identical contents: checksum both sides
    val srcSum = orders.agg(sum(col("o_orderkey"))).head().getLong(0)
    assert(partitioned.agg(sum(col("O_ORDERKEY"))).head().getLong(0) == srcSum)

    // and db-copy converges off the partitioned read
    val plan = DbCopy.plan(
      graft.ops.Relational.upperCaseColumns(orders), partitioned,
      "O_ORDERKEY", DbCopy.Insert)
    assert(plan.toInsert.count() == 0)
  }

  test("update/sync modes APPLIED against live Derby (mutation + orphan)") {
    val dbDir = java.nio.file.Files.createTempDirectory("graftdb3")
    val cfg = Config.Conf(
      drivers = Map("derby" -> Config.Driver("jdbc:derby:")),
      servers = Map("trg" -> Config.Server("derby", s"$dbDir/db;create=true")))
    val r = Config.parseLogin(cfg, "trg")

    // uppercase column policy (the reference's default — jdbc.py:105-107):
    // Spark's JDBC writer quotes identifiers at CREATE, so uppercase
    // frames make them match the unquoted names in rendered DML
    val trg0 = graft.ops.Relational.upperCaseColumns(
      Seq((1, "alpha", 10), (2, "beta", 20), (4, "orphan", 40))
        .toDF("pk", "name", "qty"))
    Config.writeJdbc(trg0, r, "COPYT")

    // source: pk 2 mutated, pk 3 new, pk 4 absent (orphan)
    val src = graft.ops.Relational.upperCaseColumns(
      Seq((1, "alpha", 10), (2, "beta2", 99), (3, "new", 30))
        .toDF("pk", "name", "qty"))

    // update mode: mutation lands, new row in, orphan survives
    val res1 = DbCopy.applyJdbc(spark, src, r, "COPYT", "PK", DbCopy.Update)
    assert(res1.inserted == 1 && res1.updated == 2 && res1.deleted == 0)
    val afterUpd = Config.readJdbc(spark, r, "COPYT").collect()
      .map(row => row.getInt(0) -> (row.getString(1), row.getInt(2))).toMap
    assert(afterUpd(2) == ("beta2", 99), "UPDATE statement must be executed")
    assert(afterUpd(3) == ("new", 30))
    assert(afterUpd(4) == ("orphan", 40), "update mode keeps the orphan")
    assert(afterUpd.size == 4)

    // sync mode: orphan deleted, target converges to source
    val res2 = DbCopy.applyJdbc(spark, src, r, "COPYT", "PK", DbCopy.Sync)
    assert(res2.inserted == 0 && res2.updated == 3 && res2.deleted == 1)
    val afterSync = Config.readJdbc(spark, r, "COPYT").collect()
      .map(row => row.getInt(0)).toSet
    assert(afterSync == Set(1, 2, 3), "sync must delete the orphan")

    // skipUnchanged: the target now equals the source, so a content-
    // diffed update executes ZERO statements (the reference would
    // rewrite all three rows; this is the at-scale narrowing)
    val res3 = DbCopy.applyJdbc(spark, src, r, "COPYT", "PK", DbCopy.Update,
      skipUnchanged = true)
    assert(res3 == DbCopy.ApplyResult(0, 0, 0), s"converged: $res3")
    // mutate one row at the source → exactly one UPDATE executes
    val src2 = graft.ops.Relational.upperCaseColumns(
      Seq((1, "alpha", 10), (2, "beta3", 77), (3, "new", 30))
        .toDF("pk", "name", "qty"))
    val res4 = DbCopy.applyJdbc(spark, src2, r, "COPYT", "PK", DbCopy.Update,
      skipUnchanged = true)
    assert(res4 == DbCopy.ApplyResult(0, 1, 0), s"one changed row: $res4")
    val after = Config.readJdbc(spark, r, "COPYT").collect()
      .map(row => row.getInt(0) -> row.getString(1)).toMap
    assert(after(2) == "beta3")
  }
}
