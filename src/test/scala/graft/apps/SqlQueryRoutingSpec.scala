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
    assert(route(spark, "no_such_table_xyz") == SqlText("no_such_table_xyz"))
    assert(route(spark, "SELECT * FROM nation") == SqlText("SELECT * FROM nation"))
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

  test("tableColumns dumps the catalog in the normalized shape") {
    graft.Tables.load(spark, sf(), "nation").createOrReplaceTempView("nation")
    val info = Introspect.tableColumns(spark)
    assert(info.columns.toSeq ==
      Seq("table_name", "column_name", "data_type", "nullable"))
    val nation = info.filter(org.apache.spark.sql.functions.col("table_name") === "nation")
    assert(nation.count() >= 3)
  }
}
