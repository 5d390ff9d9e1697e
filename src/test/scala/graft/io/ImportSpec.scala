package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.SparkSpec

class NamingSpec extends SparkSpec {
  test("uniqueColumnName normalizes, generates, and dedups") {
    assert(Naming.uniqueColumnNames(Seq("name", "Price")) == Seq("NAME", "PRICE"))
    assert(Naming.uniqueColumnNames(Seq("", "x ", null)) == Seq("C1", "X", "C3"))
    assert(Naming.uniqueColumnNames(Seq("A", "a", "A")) == Seq("A", "A1", "A2"))
    // invalid leading char → positional name (reference RE_START_WITH_CHAR)
    assert(Naming.uniqueColumnNames(Seq("1col", "_ok")) == Seq("C1", "_OK"))
  }
}

class NamingPropertySpec extends SparkSpec {
  test("property: normalized headers are always unique and uppercase (500 random)") {
    val rnd = new scala.util.Random(42)
    (1 to 50).foreach { _ =>
      val raw = Seq.fill(10)(rnd.nextInt(4) match {
        case 0 => null
        case 1 => ""
        case 2 => "col" + rnd.nextInt(3) // forced collisions
        case _ => rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString
      })
      val names = Naming.uniqueColumnNames(raw)
      assert(names.length == raw.length)
      assert(names.distinct.length == names.length, s"dups in $names")
      assert(names.forall(n => n == n.toUpperCase))
      assert(names.forall(_.nonEmpty))
    }
  }
}

class CsvImportSpec extends SparkSpec {
  private def tmp(content: String, suffix: String = ".csv"): String = {
    val f = Files.createTempFile("graft", suffix)
    Files.write(f, content.getBytes(StandardCharsets.UTF_8))
    f.toString
  }

  test("TAB-delimited with header, empty values → NULL, blank rows dropped") {
    val p = tmp("NAME\tPRICE\nBIKE\t99.95\nCAR\t10000.00\n\t\nTRIKE\t\n")
    val df = CsvImport.read(spark, p)
    assert(df.columns.toSeq == Seq("NAME", "PRICE"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSet == Set(("BIKE", "99.95"), ("CAR", "10000.00"), ("TRIKE", null)))
  }

  test("dynamic widening: rows wider than the header get C<n> columns") {
    val p = tmp("A;B\n1;2\n3;4;5;6\n", ".csv")
    val df = CsvImport.read(spark, p, delimiter = ";")
    assert(df.columns.toSeq == Seq("A", "B", "C3", "C4"))
    val wide = df.collect().find(_.getString(0) == "3").get
    assert(wide.getString(2) == "5" && wide.getString(3) == "6")
  }

  test("quoted separators don't inflate the width pass") {
    val p = tmp("A;B\n\"x;y\";2\n", ".csv")
    val df = CsvImport.read(spark, p, delimiter = ";")
    assert(df.columns.toSeq == Seq("A", "B"))
    assert(df.collect().head.getString(0) == "x;y")
  }

  test("CRLF line endings parse like LF") {
    val p = tmp("A;B\r\n1;2\r\n3;4\r\n", ".csv")
    val df = CsvImport.read(spark, p, delimiter = ";")
    assert(df.columns.toSeq == Seq("A", "B"))
    assert(df.count() == 2)
  }

  test("sink → source round trip: writeCsv output re-imports identically") {
    val nation = graft.Tables.load(spark, sf(), "nation")
    val dir = java.nio.file.Files.createTempDirectory("graft").toString + "/n"
    Sinks.writeCsv(nation, dir)
    // Spark writes part files; feed one merged file to the importer
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".csv"))
    val merged = java.nio.file.Files.createTempFile("graft", ".csv")
    val lines = part.flatMap(f => scala.io.Source.fromFile(f).getLines().toSeq)
    // header appears once per part file; keep the first, drop repeats
    val (hdr, data) = (lines.head, lines.filterNot(_ == lines.head))
    java.nio.file.Files.write(merged, (hdr +: data).mkString("\n").getBytes)
    val back = CsvImport.read(spark, merged.toString, delimiter = ";")
    assert(back.count() == 25)
    assert(back.columns.toSeq == Seq("N_NATIONKEY", "N_NAME", "N_REGIONKEY"))
    val names = back.select("N_NAME").collect().map(_.getString(0)).toSet
    assert(names == nation.select("n_name").collect().map(_.getString(0)).toSet)
  }

  test("header-cell splitter honors quotes") {
    assert(CsvImport.splitCsvLine("a;\"b;c\";d", ';') == Seq("a", "b;c", "d"))
    assert(CsvImport.splitCsvLine("\"he said \"\"hi\"\"\";x", ';') ==
      Seq("he said \"hi\"", "x"))
  }
}

class LdifImportSpec extends SparkSpec {
  private val sample =
    """dn: cn=John E Doe, o=University of Higher Learning, c=US
      |cn: John E Doe
      |cn: John Doe
      |objectclass: person
      |sn: Doe
      |
      |dn: cn=Bjorn L Doe, o=University of Higher
      |  Learning, c=US
      |cn: Bjorn L Doe
      |objectclass: person
      |sn: Doe
      |price: 10.5
      |b64:: aGVsbG8gd29ybGQ=
      |""".stripMargin

  private def tmp(content: String): String = {
    val f = Files.createTempFile("graft", ".ldif")
    Files.write(f, content.getBytes(StandardCharsets.UTF_8))
    f.toString
  }

  test("records parse: continuation, base64, repeated attrs") {
    val df = LdifImport.read(spark, tmp(sample))
    assert(df.columns.toSeq == Seq("dn", "cn", "objectclass", "sn", "price", "b64"))
    val rows = df.collect()
    assert(rows.length == 2)
    val john = rows.find(_.getString(0).contains("John")).get
    // repeated cn → array column
    assert(john.getSeq[String](1) == Seq("John E Doe", "John Doe"))
    val bjorn = rows.find(r => Option(r.getString(0)).exists(_.contains("Bjorn"))).get
    // continuation line folds into dn (leading space dropped)
    assert(bjorn.getString(0) == "cn=Bjorn L Doe, o=University of Higher Learning, c=US")
    // single cn still lands in the array-typed column as a 1-element list
    assert(bjorn.getSeq[String](1) == Seq("Bjorn L Doe"))
    assert(bjorn.getString(5) == "hello world") // base64-decoded
  }

  test("separator joins multi-values instead of arrays") {
    val df = LdifImport.read(spark, tmp(sample), separator = Some("; "))
    val john = df.collect().find(_.getString(0).contains("John")).get
    assert(john.getString(1) == "John E Doe; John Doe")
  }

  test("non-UTF8 base64 stays encoded and round-trips via binaryColumn") {
    val payload = Array[Byte](-1, -40, -1, -32, 0, 1) // JPEG-ish, not UTF-8
    val b64 = java.util.Base64.getEncoder.encodeToString(payload)
    val df = LdifImport.read(spark, tmp(s"dn: x\nphoto:: $b64\n"))
    val decoded = LdifImport.binaryColumn(df, "photo").collect().head
    assert(decoded.getAs[Array[Byte]]("photo").toSeq == payload.toSeq)
  }
}

class SqlScriptSpec extends SparkSpec {
  test("splits on terminator at EOL only") {
    val stmts = SqlScript.split(
      "SELECT 1;\nSELECT a\nFROM t WHERE x = ';';\n\nSELECT 2;")
    assert(stmts == Seq("SELECT 1", "SELECT a\nFROM t WHERE x = ';'", "SELECT 2"))
  }

  test("trailing statement without terminator is kept") {
    assert(SqlScript.split("SELECT 1;\nSELECT 2") == Seq("SELECT 1", "SELECT 2"))
  }

  test("runs against registered views") {
    graft.Tables.registerAll(spark, sf())
    val out = SqlScript.runLast(spark,
      "SELECT count(*) AS n FROM nation;").get.collect()
    assert(out.head.getLong(0) == 25L)
  }

  test("custom terminator (GO) and CRLF input") {
    val stmts = SqlScript.split("SELECT 1 GO\r\nSELECT 2\r\nGO\r\n", "GO")
    assert(stmts == Seq("SELECT 1", "SELECT 2"))
  }
}

class XlsxSpec extends SparkSpec {
  test("write → read round-trip, types as display strings") {
    import spark.implicits._
    val df = Seq((1L, "BIKE", 99.95), (2L, "CAR", 10000.0), (3L, null, 0.5))
      .toDF("ID", "NAME", "PRICE")
    val p = Files.createTempFile("graft", ".xlsx").toString
    Xlsx.write(Seq("Sheet1" -> df), p)
    val back = Xlsx.read(spark, p)
    assert(back.columns.toSeq == Seq("ID", "NAME", "PRICE"))
    val rows = back.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSet == Set(("1", "BIKE", "99.95"), ("2", "CAR", "10000.0"), ("3", null, "0.5")))
  }

  test("multi-sheet: read by name") {
    import spark.implicits._
    val a = Seq(("x")).toDF("A")
    val b = Seq(("y")).toDF("B")
    val p = Files.createTempFile("graft", ".xlsx").toString
    Xlsx.write(Seq("first" -> a, "second" -> b), p)
    assert(Xlsx.read(spark, p, Some("second")).collect().head.getString(0) == "y")
    assert(Xlsx.read(spark, p).columns.toSeq == Seq("A"))
  }

  test("pretty pass: styles part, bold header, column widths (formatter.py:44-94)") {
    import spark.implicits._
    val df = Seq((1L, "BIKE", "a-rather-long-product-description-cell"),
      (2L, "CAR", "x")).toDF("ID", "NAME", "DESCRIPTION_HEADER")
    val p = Files.createTempFile("graft", ".xlsx").toString
    Xlsx.write(Seq("Sheet1" -> df), p, pretty = true)

    val zf = new java.util.zip.ZipFile(p)
    try {
      def part(n: String): String = {
        val e = zf.getEntry(n)
        assert(e != null, s"workbook must carry $n")
        new String(zf.getInputStream(e).readAllBytes(), "UTF-8")
      }
      val styles = part("xl/styles.xml")
      assert(styles.contains("<b/>"), "header font must be bold")
      assert(styles.contains("00CCCCCC"), "header fill color")
      assert(styles.contains("double"), "double header border")
      val sheet = part("xl/worksheets/sheet1.xml")
      assert(sheet.contains("<cols>") && sheet.contains("customWidth=\"1\""))
      assert(sheet.contains("""s="1""""), "header cells must use the style")
      // widths follow the rule: max(5, data, 1.25*header) cap 50, +2
      val widths = Xlsx.columnWidths(df)
      assert(widths == Seq(5 + 2, 5 + 2, (38 max (1.25 * 18).toInt) + 2))
      assert(part("[Content_Types].xml").contains("/xl/styles.xml"))
      assert(part("xl/_rels/workbook.xml.rels").contains("styles.xml"))
    } finally zf.close()

    // the reader still round-trips a pretty workbook
    val back = Xlsx.read(spark, p)
    assert(back.columns.toSeq == Seq("ID", "NAME", "DESCRIPTION_HEADER"))
    assert(back.count() == 2)
  }

  test("colIndex decodes A1 refs") {
    assert(Xlsx.colIndex("A1") == 0)
    assert(Xlsx.colIndex("Z9") == 25)
    assert(Xlsx.colIndex("AA12") == 26)
  }

  test("native date cells: serial + date numFmt, read back as datetimes") {
    import spark.implicits._
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2020-01-02 03:04:05"),
        java.sql.Date.valueOf("2021-06-15")),
      (2L, java.sql.Timestamp.valueOf("1970-01-01 00:00:00"),
        java.sql.Date.valueOf("1899-12-31")))
      .toDF("ID", "TS", "D")
    val p = Files.createTempFile("graft", ".xlsx").toString
    Xlsx.write(Seq("Sheet1" -> df), p)

    // the sheet must carry NUMERIC serials styled with a date numFmt —
    // not inline strings (`formatter.py:489-496` native date cells)
    val zf = new java.util.zip.ZipFile(p)
    try {
      val sheet = new String(zf.getInputStream(
        zf.getEntry("xl/worksheets/sheet1.xml")).readAllBytes(), "UTF-8")
      assert(sheet.contains("""<c s="2"><v>"""), "timestamp cells must be styled serials")
      assert(sheet.contains("""<c s="3"><v>"""), "date cells must be styled serials")
      assert(!sheet.contains("2020-01-02"), "no inline-string timestamps")
      // independently computed serials: 2020-01-02 03:04:05 UTC and
      // 1970-01-01 (epoch = serial 25569); 1899-12-31 = serial 1
      val expected = 25569.0 + (java.sql.Timestamp.valueOf("2020-01-02 03:04:05")
        .getTime / 86400000.0)
      assert(sheet.contains(java.math.BigDecimal.valueOf(expected).toPlainString))
      assert(sheet.contains("<c s=\"2\"><v>25569</v></c>"))
      assert(sheet.contains("<c s=\"3\"><v>1</v></c>"))
      val styles = new String(zf.getInputStream(
        zf.getEntry("xl/styles.xml")).readAllBytes(), "UTF-8")
      assert(styles.contains("numFmtId=\"164\"") && styles.contains("hh:mm:ss"))
    } finally zf.close()

    // read-back converts the serials to datetime/date strings
    val back = Xlsx.read(spark, p).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(back("1") == ("2020-01-02 03:04:05", "2021-06-15"))
    assert(back("2") == ("1970-01-01", "1899-12-31"))
  }

  test("red-negative custom numFmt is NOT a date style (bracket sections stripped)") {
    // build a workbook whose styles carry '#,##0;[Red]-#,##0' (the 'd'
    // in [Red] must not classify it as a date) at cellXf index 1 and a
    // real date format at index 2; numeric cells styled 1 stay numbers
    val p = Files.createTempFile("graft", ".xlsx").toString
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(p))
    def entry(n: String, c: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(n))
      zos.write(c.getBytes("UTF-8")); zos.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>""")
    entry("_rels/.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
    entry("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""")
    entry("xl/styles.xml",
      """<?xml version="1.0"?><styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><numFmts count="2"><numFmt numFmtId="164" formatCode="#,##0;[Red]\-#,##0"/><numFmt numFmtId="165" formatCode="yyyy\-mm\-dd"/></numFmts><cellXfs count="3"><xf numFmtId="0"/><xf numFmtId="164" applyNumberFormat="1"/><xf numFmtId="165" applyNumberFormat="1"/></cellXfs></styleSheet>""")
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData><row><c t="inlineStr"><is><t>N</t></is></c><c t="inlineStr"><is><t>D</t></is></c></row><row><c s="1"><v>1234</v></c><c s="2"><v>25569</v></c></row></sheetData></worksheet>""")
    zos.close()
    val row = Xlsx.read(spark, p).collect().head
    assert(row.getString(0) == "1234", "red-negative styled number must stay a number")
    assert(row.getString(1) == "1970-01-01", "the real date style still converts")
  }

  test("property: excel serials round-trip random timestamps to the ms (500)") {
    val rnd = new scala.util.Random(13)
    (1 to 500).foreach { _ =>
      // 1900..2100, millisecond precision
      val ms = -2208988800000L + math.abs(rnd.nextLong() % (200L * 365 * 86400000L))
      val ts = new java.sql.Timestamp(ms - ms % 1L)
      val back = Xlsx.serialToString(Xlsx.dateSerial(ts))
      val ldt = java.time.LocalDateTime.ofInstant(
        java.time.Instant.ofEpochMilli(ts.getTime), java.time.ZoneOffset.UTC)
      val expect =
        if (ts.getTime % 86400000L == 0) ldt.toLocalDate.toString
        else if (ts.getTime % 1000L == 0)
          ldt.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
        else
          ldt.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
      assert(back == expect, s"ms=$ms")
    }
  }

  test("serial helpers: round-trip through ms precision") {
    val ts = java.sql.Timestamp.valueOf("2024-02-29 23:59:59.123")
    val s = Xlsx.dateSerial(ts)
    assert(Xlsx.serialToString(s) == "2024-02-29 23:59:59.123")
    assert(Xlsx.serialToString(Xlsx.dateSerial(java.sql.Date.valueOf("2000-01-01")))
      == "2000-01-01")
  }
}
