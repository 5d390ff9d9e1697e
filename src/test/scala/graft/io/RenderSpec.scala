package graft.io

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SqlRenderSpec extends SparkSpec {
  import SqlRender._

  test("insert literals: integral-float normalization, quoting, NULL-dropping") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("O'Neil"), Some(10000.0)),
      (2L, None, Some(99.95)),
      (3L, Some("  "), None), // blank string ≡ empty → dropped
    ).toDF("ID", "NAME", "PRICE")
    val stmts = insertStatements(df, "T").as[String].collect().toSet
    assert(stmts == Set(
      "INSERT INTO T (ID,NAME,PRICE) VALUES (1,'O''Neil',10000)",
      "INSERT INTO T (ID,PRICE) VALUES (2,99.95)",
      "INSERT INTO T (ID) VALUES (3)"))
  }

  test("oracle timestamps render as TO_TIMESTAMP") {
    import spark.implicits._
    val df = Seq((1L, Timestamp.valueOf("2020-01-02 03:04:05.678")))
      .toDF("ID", "TS")
    val s = insertStatements(df, "T", Oracle).as[String].collect().head
    assert(s == "INSERT INTO T (ID,TS) VALUES (1," +
      "TO_TIMESTAMP('2020-01-02 03:04:05.678','YYYY-MM-DD HH24:MI:SS.FF3'))")
    val a = insertStatements(df, "T", Ansi).as[String].collect().head
    assert(a == "INSERT INTO T (ID,TS) VALUES (1,'2020-01-02 03:04:05.678000')")
  }

  test("identifier escaping per dialect") {
    assert(escapeIdent("C", MySql, escape = true) == "`C`")
    assert(escapeIdent("C", SqlServer, escape = true) == "[C]")
    assert(escapeIdent("C", Oracle, escape = true) == "\"C\"")
    assert(escapeIdent("C", Ansi, escape = true) == "C")
    assert(escapeIdent("C", MySql, escape = false) == "C")
  }

  test("where-DSL string parse (uploader._split_where_value)") {
    // values are parsed TYPED: quoted → unquoted String, numeric → number
    // (so whereToSql never double-quotes an already-quoted literal)
    assert(parseWhereString("LIKE 'ABC%'") == OpVal("LIKE", "ABC%"))
    assert(parseWhereString(">= 5") == OpVal(">=", 5L))
    assert(parseWhereString("plain value") == OpVal("=", "plain value"))
    assert(parseWhereString("solo") == OpVal("=", "solo"))
    assert(parseWhereString("IS NULL") == OpVal("IS", "NULL"))
    assert(parseWhereString("IS NOT NULL") == OpVal("IS", "NOT NULL"))
  }

  test("string-form where-DSL composes with whereToSql/whereToColumn") {
    // the full round trip the advisor flagged: parse → render
    assert(whereToSql(Seq("C" -> parseWhereString("IS NULL"))) == "WHERE C IS NULL")
    assert(whereToSql(Seq("C" -> parseWhereString("IS NOT NULL"))) == "WHERE C IS NOT NULL")
    assert(whereToSql(Seq("C" -> parseWhereString("LIKE 'ABC%'"))) == "WHERE C LIKE 'ABC%'")
    assert(whereToSql(Seq("C" -> parseWhereString("= 'o''k'"))) == "WHERE C = 'o''k'")
    assert(whereToSql(Seq("C" -> parseWhereString("> 7"))) == "WHERE C > 7")
    import spark.implicits._
    val df = Seq((1, Some("x")), (2, None)).toDF("ID", "S")
    assert(df.filter(whereToColumn(Seq("S" -> parseWhereString("IS NULL"))))
      .select("ID").as[Int].collect().toSeq == Seq(2))
    assert(df.filter(whereToColumn(Seq("S" -> parseWhereString("IS NOT NULL"))))
      .select("ID").as[Int].collect().toSeq == Seq(1))
  }

  test("NaN/Infinity/huge doubles render without throwing (ANSI-safe)") {
    import spark.implicits._
    val df = Seq(Double.NaN, Double.PositiveInfinity, 1.0e300, 2.5, 3.0)
      .toDF("V")
    // a plain cast("long") would THROW under ANSI mode on the first three
    val stmts = insertStatements(df, "T", Ansi).as[String].collect()
    assert(stmts.exists(_.contains("(2.5)")))
    assert(stmts.exists(_.contains("(3)")), "integral double still normalizes")
    assert(stmts.length == 5)
  }

  test("where-DSL → SQL text: empty ⇒ IS NULL, AND-combined") {
    val sql = whereToSql(Seq(
      "A" -> Raw(5), "B" -> Raw(null), "C" -> OpVal("LIKE", "x%"),
      "D" -> Raw("o'k")))
    assert(sql == "WHERE A = 5 AND B IS NULL AND C LIKE 'x%' AND D = 'o''k'")
  }

  test("where-DSL → Column filters a frame like the SQL would") {
    import spark.implicits._
    val df = Seq((1, "ab", Some(5)), (2, "zz", None), (3, "ax", Some(9)))
      .toDF("ID", "S", "V")
    val got = df.filter(whereToColumn(Seq(
      "S" -> OpVal("LIKE", "a%"), "V" -> OpVal(">", 4))))
      .select("ID").as[Int].collect().toSet
    assert(got == Set(1, 3))
    assert(df.filter(whereToColumn(Seq("V" -> Raw(null))))
      .select("ID").as[Int].collect().toSeq == Seq(2))
  }

  test("update/delete statements render with key where-clauses") {
    import spark.implicits._
    val df = Seq((1L, "BIKE", 99.95)).toDF("ID", "NAME", "PRICE")
    val u = updateStatements(df, "T", Seq("ID")).as[String].collect().head
    assert(u == "UPDATE T SET NAME = 'BIKE', PRICE = 99.95 WHERE ID = 1")
    val d = deleteStatements(df, "T", Seq("ID")).as[String].collect().head
    assert(d == "DELETE FROM T WHERE ID = 1")
  }

  test("update SETs empty values to NULL (ParameterUploader :594-595)") {
    import spark.implicits._
    val df = Seq((1L, "", Option.empty[Double])).toDF("ID", "NAME", "PRICE")
    val u = updateStatements(df, "T", Seq("ID")).as[String].collect().head
    assert(u == "UPDATE T SET NAME = NULL, PRICE = NULL WHERE ID = 1")
  }
}

class SinksSpec extends SparkSpec {
  test("fixed-width: right-aligned numbers, truncation, binary suppressed") {
    import spark.implicits._
    val df = Seq(
      (42L, "short", "this string is definitely longer than twenty chars"),
    ).toDF("N", "A", "B")
    val line = Sinks.fixedWidthLines(df).as[String].collect().head
    val cells = line.split(" \\| ")
    assert(cells(0) == " " * 18 + "42")
    assert(cells(1) == "short" + " " * 15)
    assert(cells(2) == "this string is de...")
  }

  test("fixed-width header pads and truncates column names") {
    import spark.implicits._
    val df = Seq((1, 2)).toDF("SHORT", "A_VERY_LONG_COLUMN_NAME_INDEED")
    val h = Sinks.fixedWidthHeader(df)
    assert(h == "SHORT" + " " * 15 + " | " + "A_VERY_LONG_COLUM...")
  }

  test("binary columns render as the suppression marker") {
    import spark.implicits._
    val df = Seq((1, Array[Byte](1, 2, 3))).toDF("ID", "BLOB")
    val line = Sinks.fixedWidthLines(df).as[String].collect().head
    assert(line.contains("Binary data suppr...")) // truncated to 17+'...'
    val csv = Sinks.csvLine(df, ";").as[String].collect().head
    assert(csv == "1;Binary data suppressed.")
  }

  test("csv lines quote when needed") {
    import spark.implicits._
    val df = Seq(("a;b", "plain", "say \"hi\"")).toDF("X", "Y", "Z")
    val line = Sinks.csvLine(df, ";").as[String].collect().head
    assert(line == "\"a;b\";plain;\"say \"\"hi\"\"\"")
  }

  test("xml renders escape entities and mark empty cells") {
    import spark.implicits._
    val df = Seq((Some("a<b&c"), Option.empty[String])).toDF("X", "Y")
    val excel = Sinks.xmlRowLines(df, "excel").as[String].collect().head
    assert(excel == "<Row><Cell><Data>a&lt;b&amp;c</Data></Cell><Cell /></Row>")
    val plain = Sinks.xmlRowLines(df, "plain").as[String].collect().head
    assert(plain == "<Row><X>a&lt;b&amp;c</X><Y /></Row>")
    val value = Sinks.xmlRowLines(df, "value").as[String].collect().head
    assert(value == "<Row><X value=\"a&lt;b&amp;c\" /><Y value=\"\" /></Row>")
  }

  test("writeFramed produces a single framed file") {
    import spark.implicits._
    val df = Seq(("r1"), ("r2")).toDF("line")
    val p = java.nio.file.Files.createTempFile("graft", ".xml").toString
    Sinks.writeFramed(df, p, Some("<open>"), Some("</close>"))
    val content = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)))
    assert(content == "<open>\nr1\nr2\n</close>\n")
  }
}
