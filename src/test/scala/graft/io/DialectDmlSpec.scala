package graft.io

import graft.SparkSpec
import graft.io.SqlRender._
import org.apache.spark.sql.functions._

/** Execute every dialect's rendered DML against a live engine where one
  * exists in this container, and parser-check the rest:
  *
  *   - ANSI      → executed on embedded Derby (live JDBC)
  *   - sqlite    → executed on a REAL sqlite engine (the python3 stdlib
  *                 sqlite3 module — present in every container; no JDBC
  *                 jar for it exists in this zero-egress sandbox, so the
  *                 subprocess route is how a second dialect gets a live
  *                 engine at all)
  *   - postgres  → executed in DuckDB, whose SQL surface is
  *                 postgres-flavored (via the container's python3)
  *   - oracle    → the TO_TIMESTAMP text is parsed back with the
  *                 equivalent strptime mask — text/mask agreement is the
  *                 actual risk in a dialect string nobody executes
  *   - mysql/sqlserver → identifier escaping is mechanically de-escaped
  *                 (`x` / [x] → "x") and the statement must then parse
  *                 and execute — isolating the only non-ANSI syntax the
  *                 renderer emits for those dialects
  */
class DialectDmlSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "BIKE", 99.95, java.sql.Timestamp.valueOf("2020-01-02 03:04:05.678")),
    (2L, "o'kane", 10000.0, java.sql.Timestamp.valueOf("2021-12-31 23:59:59.001")))
    .toDF("ID", "NAME", "PRICE", "TS")

  private def stmts(d: Dialect, escape: Boolean = false): Seq[String] =
    insertStatements(df, "LWETL_PRODUCT", d, escape = escape)
      .as[String].collect().toSeq

  /** Run a python3+duckdb script, return stdout (the container ships
    * duckdb for the oracle gate; tests may shell out to it the same
    * way scripts/check.py does). */
  private def duckdb(script: String): String = {
    val f = java.nio.file.Files.createTempFile("ddb", ".py")
    java.nio.file.Files.write(f, script.getBytes("UTF-8"))
    import scala.sys.process._
    val out = new StringBuilder
    val code = Seq("python3", f.toString) ! ProcessLogger(out ++= _ += '\n', out ++= _ += '\n')
    assert(code == 0, s"duckdb script failed:\n$out")
    out.toString
  }

  test("ANSI DML executes end-to-end on live Derby") {
    val dbDir = java.nio.file.Files.createTempDirectory("graftdml")
    val conn = java.sql.DriverManager.getConnection(s"jdbc:derby:$dbDir/db;create=true")
    val st = conn.createStatement()
    st.execute("CREATE TABLE LWETL_PRODUCT (ID BIGINT, NAME VARCHAR(32), " +
      "PRICE DOUBLE, TS TIMESTAMP)")
    stmts(Ansi).foreach(st.execute)

    val upd = updateStatements(
      Seq((1L, "TRIKE")).toDF("ID", "NAME"), "LWETL_PRODUCT", Seq("ID"), Ansi)
      .as[String].collect()
    upd.foreach(st.execute)
    val del = deleteStatements(
      Seq(Tuple1(2L)).toDF("ID"), "LWETL_PRODUCT", Seq("ID"), Ansi)
      .as[String].collect()
    del.foreach(st.execute)

    val rs = st.executeQuery(
      "SELECT ID, NAME, PRICE, TS FROM LWETL_PRODUCT ORDER BY ID")
    assert(rs.next())
    assert(rs.getLong(1) == 1L && rs.getString(2) == "TRIKE")
    assert(rs.getDouble(3) == 99.95)
    assert(rs.getTimestamp(4) == java.sql.Timestamp.valueOf("2020-01-02 03:04:05.678"))
    assert(!rs.next(), "row 2 must be deleted")
    rs.close(); st.close(); conn.close()
  }

  test("sqlite DML executes end-to-end on the real sqlite engine") {
    val ins = stmts(Sqlite)
    val upd = updateStatements(
      Seq((1L, "TRIKE")).toDF("ID", "NAME"), "LWETL_PRODUCT", Seq("ID"), Sqlite)
      .as[String].collect().toSeq
    val del = deleteStatements(
      Seq(Tuple1(2L)).toDF("ID"), "LWETL_PRODUCT", Seq("ID"), Sqlite)
      .as[String].collect().toSeq
    val script =
      s"""import sqlite3
         |con = sqlite3.connect(':memory:')
         |con.execute('CREATE TABLE LWETL_PRODUCT '
         |            '(ID INTEGER, NAME TEXT, PRICE REAL, TS TEXT)')
         |${(ins ++ upd ++ del).map(s => s"con.execute(${pyStr(s)})").mkString("\n")}
         |for r in con.execute('SELECT ID, NAME, PRICE, TS FROM LWETL_PRODUCT ORDER BY ID'):
         |    print(r)
         |""".stripMargin
    val out = duckdb(script)
    // sqlite has no native timestamp type: the renderer's quoted
    // 'yyyy-MM-dd HH:mm:ss.SSS000' text is the stored value, update and
    // delete really applied, '' doubling parsed by a second real engine
    assert(out.contains("(1, 'TRIKE', 99.95, '2020-01-02 03:04:05.678000')"), out)
    assert(!out.contains("o'kane") && !out.contains("10000"),
      s"row 2 must be deleted: $out")
  }

  test("postgresql DML executes in DuckDB (postgres-flavored engine)") {
    val rendered = stmts(Postgres, escape = true) // "quoted" identifiers
    val script =
      s"""import duckdb
         |con = duckdb.connect()
         |con.execute('CREATE TABLE LWETL_PRODUCT ("ID" BIGINT, "NAME" VARCHAR, '
         |            '"PRICE" DOUBLE, "TS" TIMESTAMP)')
         |${rendered.map(s => s"con.execute(${pyStr(s)})").mkString("\n")}
         |for r in con.execute('SELECT "ID","NAME","PRICE","TS" FROM LWETL_PRODUCT ORDER BY "ID"').fetchall():
         |    print(r)
         |""".stripMargin
    val out = duckdb(script)
    assert(out.contains("(1, 'BIKE', 99.95, datetime.datetime(2020, 1, 2, 3, 4, 5, 678000))"), out)
    assert(out.contains("o'kane"), "'' doubling must survive a real parser")
    assert(out.contains("10000.0"), out)
  }

  test("oracle TO_TIMESTAMP literal text agrees with its format mask") {
    val oracle = stmts(Oracle)
    val Re = """TO_TIMESTAMP\('([^']+)','YYYY-MM-DD HH24:MI:SS\.FF3'\)""".r
    val texts = oracle.flatMap(s => Re.findAllMatchIn(s).map(_.group(1)))
    assert(texts.size == 2, s"both rows must render TO_TIMESTAMP: $oracle")
    // parse each text with the strptime equivalent of the oracle mask —
    // if text and mask drift apart, this is what a live Oracle would hit
    val script =
      s"""import duckdb
         |con = duckdb.connect()
         |for t in ${texts.map(pyStr).mkString("[", ",", "]")}:
         |    r = con.execute("SELECT strftime(strptime(?, '%Y-%m-%d %H:%M:%S.%g'), '%Y-%m-%d %H:%M:%S.%g')", [t]).fetchone()[0]
         |    print('OK' if r == t else 'MISMATCH ' + t + ' -> ' + r)
         |""".stripMargin
    val out = duckdb(script)
    assert(out.linesIterator.count(_ == "OK") == 2, out)
  }

  test("mysql/sqlserver statements parse+execute after identifier de-escape") {
    val mysql = stmts(MySql, escape = true)
    assert(mysql.head.contains("`ID`") && mysql.head.contains("`NAME`"))
    val sqlserver = stmts(SqlServer, escape = true)
    assert(sqlserver.head.contains("[ID]") && sqlserver.head.contains("[NAME]"))
    // the ONLY non-ANSI bit those dialects emit is the identifier quote:
    // translate it and the statement must run on a strict parser
    val deEscaped =
      mysql.map(_.replace("`", "\"")) ++
        sqlserver.map(s => s.replace("[", "\"").replace("]", "\""))
    val script =
      s"""import duckdb
         |con = duckdb.connect()
         |con.execute('CREATE TABLE LWETL_PRODUCT ("ID" BIGINT, "NAME" VARCHAR, '
         |            '"PRICE" DOUBLE, "TS" TIMESTAMP)')
         |${deEscaped.map(s => s"con.execute(${pyStr(s)})").mkString("\n")}
         |print(con.execute('SELECT count(*) FROM LWETL_PRODUCT').fetchone()[0])
         |""".stripMargin
    val out = duckdb(script)
    assert(out.trim.endsWith("4"), out)
  }

  /** Python string literal with safe escaping. */
  private def pyStr(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
}
