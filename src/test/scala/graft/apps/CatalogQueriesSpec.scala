package graft.apps

import graft.SparkSpec
import graft.io.Config

class CatalogQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("every dialect template declares the normalized result shape") {
    // sqlite's catalog only lists tables (reference queries.py:202-203)
    for ((d, sql) <- CatalogQueries.contentQueries if d != "sqlite") {
      val lower = sql.toLowerCase
      CatalogQueries.ContentColumns.foreach { c =>
        assert(lower.contains(c), s"dialect $d must alias/select $c")
      }
    }
    assert(CatalogQueries.contentQueries("sqlite").toLowerCase.contains("table_name"))
    assert(CatalogQueries.tableCountQueries.keySet ==
      CatalogQueries.contentQueries.keySet)
  }

  test("@SCHEMA@ substitution and unknown-dialect rejection") {
    val q = CatalogQueries.contentQuery("mysql", "SALESDB")
    assert(q.contains("'SALESDB'") && !q.contains("@SCHEMA@"))
    assert(CatalogQueries.contentQuery("postgresql", "salesdb").contains("'salesdb'"))
    intercept[IllegalArgumentException] { CatalogQueries.contentQuery("db2") }
  }

  test("parseContent builds the FK/PK maps that drive topoOrder") {
    // a result set in the templates' declared shape: CUSTOMER → NATION
    // → REGION star, listed deliberately in anti-topological order
    val rows = Seq(
      ("CUSTOMER", "C_CUSTKEY", "PK", "bigint", 8L, "N", null, null, "PK_CUST"),
      ("CUSTOMER", "C_NATIONKEY", "FK", "bigint", 8L, "Y", "NATION", "N_NATIONKEY", "FK_CUST_NAT"),
      ("CUSTOMER", "C_NAME", null, "varchar", 25L, "Y", null, null, null),
      ("NATION", "N_NATIONKEY", "PK", "bigint", 8L, "N", null, null, "PK_NAT"),
      ("NATION", "N_REGIONKEY", "FK", "bigint", 8L, "Y", "REGION", "R_REGIONKEY", "FK_NAT_REG"),
      ("REGION", "R_REGIONKEY", "PK", "bigint", 8L, "N", null, null, "PK_REG"))
      .toDF(CatalogQueries.ContentColumns: _*)
    val info = CatalogQueries.parseContent(rows)
    assert(info.pk == Map("CUSTOMER" -> "C_CUSTKEY", "NATION" -> "N_NATIONKEY",
      "REGION" -> "R_REGIONKEY"))
    assert(info.fkRefs("CUSTOMER") ==
      Map("C_NATIONKEY" -> ("NATION", "FK_CUST_NAT")))
    assert(info.referring == Map(
      "CUSTOMER" -> Set("NATION"), "NATION" -> Set("REGION"),
      "REGION" -> Set.empty[String]))
    val order = DbCopy.topoOrder(info.referring)
    assert(order.indexOf("REGION") < order.indexOf("NATION"))
    assert(order.indexOf("NATION") < order.indexOf("CUSTOMER"))
  }

  test("live Derby: getMetaData FKs drive an FK-ordered end-to-end copy") {
    val dbDir = java.nio.file.Files.createTempDirectory("graftfk")
    val url = s"jdbc:derby:$dbDir/db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE REGION (R_REGIONKEY BIGINT PRIMARY KEY, R_NAME VARCHAR(32))")
    st.execute("CREATE TABLE NATION (N_NATIONKEY BIGINT PRIMARY KEY, " +
      "N_NAME VARCHAR(32), N_REGIONKEY BIGINT REFERENCES REGION)")
    st.execute("CREATE TABLE CUSTOMER (C_CUSTKEY BIGINT PRIMARY KEY, " +
      "C_NATIONKEY BIGINT REFERENCES NATION)")
    st.close(); conn.close()

    // real driver metadata → the same maps the dialect templates yield
    val info = CatalogQueries.fromJdbcMetadata(url)
    assert(info.pk("NATION") == "N_NATIONKEY")
    assert(info.fkRefs("NATION").values.map(_._1).toSet == Set("REGION"))
    assert(info.fkRefs("CUSTOMER").values.map(_._1).toSet == Set("NATION"))
    val order = DbCopy.topoOrder(info.referring)
    assert(order == Seq("REGION", "NATION", "CUSTOMER"))

    // copying in that order satisfies the live FK constraints
    val cfg = Config.Conf(
      drivers = Map("derby" -> Config.Driver("jdbc:derby:")),
      servers = Map("trg" -> Config.Server("derby", s"$dbDir/db")))
    val r = Config.parseLogin(cfg, "trg")
    val data = Map(
      "REGION" -> Seq((0L, "AFRICA"), (1L, "ASIA")).toDF("R_REGIONKEY", "R_NAME"),
      "NATION" -> Seq((0L, "KENYA", 0L), (1L, "JAPAN", 1L))
        .toDF("N_NATIONKEY", "N_NAME", "N_REGIONKEY"),
      "CUSTOMER" -> Seq((100L, 0L), (101L, 1L)).toDF("C_CUSTKEY", "C_NATIONKEY"))
    order.foreach(t => Config.writeJdbc(data(t), r, t))
    assert(Config.readJdbc(spark, r, "CUSTOMER").count() == 2)
    // the reverse order would violate the FK — prove the constraint is live
    val e = intercept[Exception] {
      Config.writeJdbc(Seq((999L, 77L)).toDF("C_CUSTKEY", "C_NATIONKEY"), r, "CUSTOMER")
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.toString +: chain(t.getCause)
    assert(chain(e).mkString.toUpperCase.contains("FOREIGN KEY"), chain(e).mkString)
  }
}
