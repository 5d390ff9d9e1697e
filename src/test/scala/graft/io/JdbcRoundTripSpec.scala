package graft.io

import java.sql.DriverManager

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** LIVE JDBC coverage using embedded Derby (ships with Spark): the
  * read/write path (`Config.readJdbc/writeJdbc`) and — critically —
  * the DML renderers executed against a REAL database: every INSERT /
  * UPDATE / DELETE string `SqlRender` emits must be valid SQL that a
  * JDBC engine accepts and that produces the intended rows. */
class JdbcRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dbDir = java.nio.file.Files.createTempDirectory("graftdb")
  private lazy val cfg = Config.Conf(
    drivers = Map("derby" -> Config.Driver("jdbc:derby:")),
    servers = Map("testdb" -> Config.Server("derby", s"$dbDir/db;create=true")),
    aliases = Map("scott" -> "testdb"))
  private lazy val resolved = Config.parseLogin(cfg, "scott")

  test("writeJdbc → readJdbc round-trip (embedded Derby)") {
    val df = Seq((1L, "BIKE", 99.95), (2L, "CAR", 10000.0), (3L, "O'Neil", 0.5))
      .toDF("ID", "NAME", "PRICE")
    Config.writeJdbc(df, resolved, "PRODUCTS")
    val back = Config.readJdbc(spark, resolved, "PRODUCTS")
    assert(back.count() == 3)
    assert(back.filter(col("ID") === 3).select("NAME").as[String].collect().head == "O'Neil")

    // partitioned parallel read: same rows, N range scans
    val part = Config.readJdbc(spark, resolved, "PRODUCTS",
      partitionOn = Some(("ID", 0L, 4L, 2)))
    assert(part.rdd.getNumPartitions == 2)
    assert(part.select("ID").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("rendered INSERT/UPDATE/DELETE statements execute on a real database") {
    val conn = DriverManager.getConnection(resolved.url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE T (ID BIGINT, NAME VARCHAR(64), PRICE DOUBLE, TS TIMESTAMP)")

      val df = Seq(
        (1L, Some("O'Neil"), Some(10000.0), Some(java.sql.Timestamp.valueOf("2020-01-02 03:04:05.678"))),
        (2L, None, Some(99.95), None))
        .toDF("ID", "NAME", "PRICE", "TS")
      SqlRender.insertStatements(df, "T").as[String].collect()
        .foreach(sql => st.execute(sql))

      val rs = st.executeQuery("SELECT NAME, PRICE FROM T WHERE ID = 1")
      assert(rs.next())
      assert(rs.getString(1) == "O'Neil" && rs.getDouble(2) == 10000.0)

      // UPDATE rendered from a frame, keyed on ID
      SqlRender.updateStatements(
          Seq((1L, "RENAMED", 1.25)).toDF("ID", "NAME", "PRICE")
            .withColumn("TS", lit(null).cast("timestamp")),
          "T", Seq("ID")).as[String].collect()
        .foreach(sql => st.execute(sql))
      val rs2 = st.executeQuery("SELECT NAME, PRICE FROM T WHERE ID = 1")
      assert(rs2.next() && rs2.getString(1) == "RENAMED")

      // DELETE rendered per key
      SqlRender.deleteStatements(Seq(Tuple1(2L)).toDF("ID"), "T", Seq("ID"))
        .as[String].collect().foreach(sql => st.execute(sql))
      val rs3 = st.executeQuery("SELECT count(*) FROM T")
      rs3.next()
      assert(rs3.getInt(1) == 1)
    } finally conn.close()
  }

  test("Uploader pipe → execute against Derby (the reference's pipe mode)") {
    val conn = DriverManager.getConnection(resolved.url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE U (ID BIGINT, V VARCHAR(16))")
      val r = Uploader.insert(Seq((7L, "x")).toDF("ID", "V"), "U", Uploader.Pipe)
      r.sql.get.as[String].collect().foreach(sql => st.execute(sql))
      val rs = st.executeQuery("SELECT V FROM U WHERE ID = 7")
      assert(rs.next() && rs.getString(1) == "x")
    } finally conn.close()
  }
}
