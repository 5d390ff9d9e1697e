package graft.apps

import graft.SparkSpec

/** The sql-query CLI's dispatch table (`sql_query/main.py:62-80,
  * 280-313`): every routing branch of the reference, pinned. */
class SqlQueryRoutingSpec extends SparkSpec {
  import SqlQuery._

  private def tmpFile(name: String, bytes: Array[Byte]): String = {
    val f = java.nio.file.Files.createTempFile("route_" + name, "." + name.split('.').last)
    java.nio.file.Files.write(f, bytes)
    f.toString
  }

  test("route: keywords, file, bare table probe, inline SQL, stdin") {
    graft.Tables.load(spark, sf(), "nation").createOrReplaceTempView("nation")
    assert(route(spark, "") == StdInScript)
    assert(route(spark, "  ") == StdInScript)
    assert(route(spark, "jdbc_info") == JdbcInfo)
    assert(route(spark, "TABLE_INFO") == TableInfo) // reference lowercases
    val script = tmpFile("s.sql", "SELECT 1".getBytes)
    assert(route(spark, script) == ScriptFile(script))
    // bare token probed via SELECT * WHERE 0=1 (`main.py:292-307`)
    assert(route(spark, "nation") == TableSelect("nation"))
    // a failed probe leaves sql unset → stdin, like the reference
    // (`main.py:292-313`; a bare token is never treated as SQL)
    assert(route(spark, "no_such_table_xyz") == StdInScript)
    assert(route(spark, "SELECT * FROM nation") == SqlText("SELECT * FROM nation"))
  }

  test("route: explicit csv/xlsx CLI format beats sniffing on upload") {
    graft.Tables.load(spark, sf(), "nation").createOrReplaceTempView("nation")
    // a .dat file sniffs to csv, but an explicit xlsx format must win
    // (`main.py:62-66` only sniffs when args.format is neither)
    val dat = tmpFile("u.dat", "A;B\n1;2\n".getBytes)
    assert(route(spark, "nation", Some(dat), Some("xlsx")) ==
      TableUpload("nation", dat, "xlsx"))
    assert(route(spark, "nation", Some(dat), Some("csv")) ==
      TableUpload("nation", dat, "csv"))
    // a non-upload CLI format (e.g. the default text) falls back to sniff
    assert(route(spark, "nation", Some(dat), Some("text")) ==
      TableUpload("nation", dat, "csv"))
  }

  test("route: bare table + input file ⇒ upload; missing file ⇒ error") {
    graft.Tables.load(spark, sf(), "nation").createOrReplaceTempView("nation")
    val csv = tmpFile("u.csv", "A;B\n1;2\n".getBytes)
    assert(route(spark, "nation", Some(csv)) == TableUpload("nation", csv, "csv"))
    intercept[IllegalArgumentException] {
      route(spark, "nation", Some("/no/such/file.csv"))
    }
    // a table name with no file stays a plain select even when fileName
    // is None — and a NON-table first arg ignores the file
    assert(route(spark, "SELECT 1", Some(csv)) == SqlText("SELECT 1"))
  }

  test("sniffFormat: extension first, then binary-content heuristic") {
    assert(sniffFormat("report.XLSX") == "xlsx")
    assert(sniffFormat("data.csv") == "csv")
    assert(sniffFormat("data.dat") == "csv")
    assert(sniffFormat("data.txt") == "csv")
    // extensionless text → csv
    val text = tmpFile("plain", "ID\tNAME\n1\tBIKE\n".getBytes)
    assert(sniffFormat(text) == "csv")
    // zip magic + control bytes → binary → xlsx (`main.py:71-80`)
    val bin = tmpFile("blob", Array[Byte](0x50, 0x4b, 0x03, 0x04, 0x00, 0x01, 0x02))
    assert(sniffFormat(bin) == "xlsx")
  }

  test("readStdIn consumes the whole stream as a script") {
    val in = new java.io.ByteArrayInputStream(
      "SELECT 1;\nSELECT 2;\n".getBytes("UTF-8"))
    assert(readStdIn(in) == "SELECT 1;\nSELECT 2;\n")
  }

  test("importFile reads the sniffed format (csv round trip)") {
    val csv = tmpFile("imp.txt", "ID\tNAME\n1\tBIKE\n2\tCAR\n".getBytes)
    val df = importFile(spark, csv, sniffFormat(csv))
    assert(df.count() == 2 && df.columns.toSeq == Seq("ID", "NAME"))
    intercept[IllegalArgumentException] { importFile(spark, csv, "pdf") }
  }

  test("two-SELECT script → ONE csv, second result appended with its header") {
    graft.Tables.registerAll(spark, sf())
    val p = java.nio.file.Files.createTempFile("multi", ".csv").toString
    val stmts = SqlQuery.run(spark,
      "SELECT r_regionkey FROM region ORDER BY 1;\n" +
        "SELECT n_name FROM nation WHERE n_nationkey < 2 ORDER BY 1;",
      Csv, p)
    assert(stmts.length == 2)
    val lines = scala.io.Source.fromFile(p).getLines().toSeq
    // section 1: header + 5 regions; section 2: header + 2 nations —
    // appended into the SAME file (`main.py:171-173` close/reopen 'a'),
    // each with its own header (`f.header()` runs per cursor)
    assert(lines.length == 9)
    assert(lines.head == "r_regionkey")
    assert(lines(6) == "n_name")
    assert(!new java.io.File(p + ".0").exists(), "no numbered side files")
    assert(!new java.io.File(p + ".1").exists())
  }

  test("two-SELECT script → ONE xlsx with two sheets (next_sheet parity)") {
    graft.Tables.registerAll(spark, sf())
    val p = java.nio.file.Files.createTempFile("multi", ".xlsx").toString
    SqlQuery.run(spark,
      "SELECT r_regionkey FROM region ORDER BY 1;\n" +
        "SELECT n_name FROM nation WHERE n_nationkey < 2 ORDER BY 1;",
      XlsxFmt, p)
    assert(graft.io.Xlsx.read(spark, p, Some("Sheet1")).count() == 5)
    assert(graft.io.Xlsx.read(spark, p, Some("Sheet2")).count() == 2)
  }

  test("two-SELECT script → ONE xml document with two worksheets") {
    graft.Tables.registerAll(spark, sf())
    val p = java.nio.file.Files.createTempFile("multi", ".xml").toString
    SqlQuery.run(spark,
      "SELECT r_regionkey FROM region ORDER BY 1;\n" +
        "SELECT n_name FROM nation WHERE n_nationkey < 2 ORDER BY 1;",
      XmlExcel, p)
    val xml = scala.io.Source.fromFile(p).mkString
    assert(xml.contains("ss:Name=\"Sheet1\"") && xml.contains("ss:Name=\"Sheet2\""))
    // well-formed single document: one Workbook open + close
    assert(xml.indexOf("<Workbook") == xml.lastIndexOf("<Workbook"))
    assert(xml.trim.endsWith("</Workbook>"))
    assert(scala.xml.XML.loadString(xml) != null)
  }

  test("-m flag truncates output; -n parsed; flags mix with positionals") {
    val (pos, m, n) = SqlQueryMain.parseFlags(
      Array("/dir", "-m", "10", "SELECT 1", "csv", "-n", "5", "/tmp/o"))
    assert(pos.toSeq == Seq("/dir", "SELECT 1", "csv", "/tmp/o"))
    assert(m.contains(10) && n == 5)
    // -m <= 0 means all rows (`cmdline.py:74-78`)
    assert(SqlQueryMain.parseFlags(Array("-m", "0"))._2.isEmpty)

    graft.Tables.registerAll(spark, sf())
    val p = java.nio.file.Files.createTempFile("maxrows", ".csv").toString
    SqlQuery.run(spark, "SELECT n_nationkey FROM nation ORDER BY 1;", Csv, p,
      maxRows = Some(10))
    val lines = scala.io.Source.fromFile(p).getLines().toSeq
    assert(lines.length == 11, "header + 10 capped rows")
  }

  test("tableColumns dumps the catalog in the normalized shape") {
    graft.Tables.load(spark, sf(), "nation").createOrReplaceTempView("nation")
    val info = Introspect.tableColumns(spark)
    assert(info.columns.toSeq ==
      Seq("table_name", "column_name", "data_type", "nullable"))
    val nation = info.filter(org.apache.spark.sql.functions.col("table_name") === "nation")
    assert(nation.count() >= 3)
  }
}
