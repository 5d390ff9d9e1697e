package graft.io

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's formatter sinks (SURVEY.md §2.2) re-expressed
  * Spark-first: each formatter becomes (a) a distributed ROW RENDER —
  * pure `Column` string expressions producing one line per row, which
  * scales to any size via `df.write.text` — and (b) a thin driver-side
  * WRITE wrapper that adds header/footer framing for the single-file
  * outputs the reference produces (`toLocalIterator`, so the driver
  * never holds more than a partition at a time).
  *
  * Binary cells render as the literal 'Binary data suppressed.'
  * (`lwetl/formatter.py:181`).
  */
object Sinks {

  val BinarySuppressed = "Binary data suppressed."

  private def displayValue(f: StructField): Column = f.dataType match {
    case _: BinaryType => when(col(f.name).isNotNull, lit(BinarySuppressed))
    case _: DoubleType | _: FloatType =>
      // match Python str(float): integral doubles show as "10000.0"
      when(col(f.name).cast("double") === col(f.name).cast("long").cast("double"),
        concat(col(f.name).cast("long").cast("string"), lit(".0")))
        .otherwise(col(f.name).cast("string"))
    case _: TimestampType | _: TimestampNTZType =>
      date_format(col(f.name), "yyyy-MM-dd HH:mm:ss")
    case _ => col(f.name).cast("string")
  }

  // ------------------------------------------------------------- csv

  /** CsvFormatter parity (`lwetl/formatter.py:257-290`): `;` separator,
    * header, excel-style quoting — Spark's csv writer matches when
    * configured with these options. Distributed multi-part output. */
  def writeCsv(df: DataFrame, path: String, sep: String = ";",
               header: Boolean = true, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .option("header", header.toString).option("sep", sep)
      .option("quoteAll", "false").option("emptyValue", "")
      .csv(path)

  /** One CSV line per row as a Column render (for tests/oracles and for
    * piping CSV text through other operators). Quotes a field iff it
    * contains the separator, a quote, or a newline (excel dialect). */
  def csvLine(df: DataFrame, sep: String = ";"): DataFrame = {
    val cells = df.schema.fields.map { f =>
      val v = coalesce(displayValue(f), lit(""))
      val needsQuote = v.contains(sep) || v.contains("\"") || v.contains("\n")
      when(needsQuote,
        concat(lit("\""), regexp_replace(v, "\"", "\"\""), lit("\"")))
        .otherwise(v)
    }
    df.select(concat_ws(sep, cells.toIndexedSeq: _*).as("line"))
  }

  // ----------------------------------------------------- fixed width

  /** TextFormatter cell semantics (`lwetl/formatter.py:226-253`):
    * null/blank → width spaces; ints/decimals right-aligned (never
    * truncated); everything else left-aligned, truncated to width-3
    * + '...' when too long. */
  private def fixedCell(f: StructField, width: Int): Column = {
    val numeric = f.dataType match {
      case _: IntegerType | _: LongType | _: ShortType | _: ByteType |
           _: DecimalType => true
      case _ => false
    }
    val s = displayValue(f)
    val blank = lit(" " * width)
    if (numeric)
      when(col(f.name).isNull, blank)
        .otherwise(when(length(s) > width, s).otherwise(lpad(s, width, " ")))
    else
      when(s.isNull || trim(s) === "", blank)
        .otherwise(when(length(s) > width,
          concat(substring(s, 1, width - 3), lit("...")))
          .otherwise(rpad(s, width, " ")))
  }

  /** Fixed-width row render, ' | ' separated (TextFormatter parity).
    * Width clamps at min 5 like `_set_column_width`. */
  def fixedWidthLines(df: DataFrame, columnWidth: Int = 20): DataFrame = {
    val w = math.max(columnWidth, 5)
    val cells = df.schema.fields.map(f => fixedCell(f, w))
    df.select(concat_ws(" | ", cells.toIndexedSeq: _*).as("line"))
  }

  /** Header line for the fixed-width format. */
  def fixedWidthHeader(df: DataFrame, columnWidth: Int = 20): String = {
    val w = math.max(columnWidth, 5)
    df.columns.map { c =>
      if (c.length > w) c.substring(0, w - 3) + "..." else c.padTo(w, ' ')
    }.mkString(" | ")
  }

  // -------------------------------------------------------------- xml

  def xmlEscape(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      "&", "&amp;"), "<", "&lt;"), ">", "&gt;")

  private def xmlAttrEscape(c: Column): Column =
    regexp_replace(xmlEscape(c), "\"", "&quot;")

  /** XmlFormatter row renders for the three dialects
    * (`lwetl/formatter.py:294-438`). Framing (Document/Workbook open +
    * close tags, header row) comes from [[xmlDocOpen]]/[[xmlTableOpen]]
    * and their close counterparts. */
  def xmlRowLines(df: DataFrame, dialect: String = "excel"): DataFrame = {
    val fields = df.schema.fields
    val row: Column = dialect match {
      case "plain" =>
        val cells = fields.map { f =>
          val v = displayValue(f)
          when(v.isNull || trim(v) === "", lit(s"<${f.name} />"))
            .otherwise(concat(lit(s"<${f.name}>"), xmlEscape(v), lit(s"</${f.name}>")))
        }
        concat(lit("<Row>"), concat(cells.toIndexedSeq: _*), lit("</Row>"))
      case "value" =>
        val cells = fields.map { f =>
          concat(lit(s"""<${f.name} value=""""),
            xmlAttrEscape(coalesce(displayValue(f), lit(""))), lit("\" />"))
        }
        concat(lit("<Row>"), concat(cells.toIndexedSeq: _*), lit("</Row>"))
      case _ => // excel SpreadsheetML
        val cells = fields.map { f =>
          val v = displayValue(f)
          when(v.isNull || trim(v) === "", lit("<Cell />"))
            .otherwise(concat(lit("<Cell><Data>"), xmlEscape(v), lit("</Data></Cell>")))
        }
        concat(lit("<Row>"), concat(cells.toIndexedSeq: _*), lit("</Row>"))
    }
    df.select(row.as("line"))
  }

  /** Document-level open tag — written once per file even when a
    * multi-statement script adds several tables/worksheets
    * (`formatter.py:375-385` next_sheet). */
  def xmlDocOpen(dialect: String = "excel"): String = dialect match {
    case "plain" | "value" => "<Document>"
    case _ =>
      "<Workbook xmlns=\"urn:schemas-microsoft-com:office:spreadsheet\" " +
        "xmlns:o=\"urn:schemas-microsoft-com:office:office\" " +
        "xmlns:x=\"urn:schemas-microsoft-com:office:excel\" " +
        "xmlns:ss=\"urn:schemas-microsoft-com:office:spreadsheet\" " +
        "xmlns:html=\"http://www.w3.org/TR/REC-html40\">" +
        "<DocumentProperties xmlns=\"urn:schemas-microsoft-com:office:office\" />"
  }

  /** Per-result table/worksheet open + header row (next_sheet parity:
    * excel gets a named Worksheet per statement, plain/value a new
    * Table in the same Document). */
  def xmlTableOpen(df: DataFrame, dialect: String = "excel",
                   sheetName: String = "Sheet1"): String = dialect match {
    case "plain" =>
      val hdr = df.columns.map(c => s"<$c>$c</$c>").mkString
      s"<Table><Row>$hdr</Row>"
    case "value" =>
      val hdr = df.columns.map(c => s"""<$c value="$c" />""").mkString
      s"<Table><Row>$hdr</Row>"
    case _ =>
      val hdr = df.columns.map(c => s"<Cell><Data>$c</Data></Cell>").mkString
      s"""<ss:Worksheet ss:Name="$sheetName"><Table><Row>$hdr</Row>"""
  }

  def xmlTableClose(dialect: String = "excel"): String = dialect match {
    case "plain" | "value" => "</Table>"
    case _ => "</Table></ss:Worksheet>"
  }

  def xmlDocClose(dialect: String = "excel"): String = dialect match {
    case "plain" | "value" => "</Document>"
    case _ => "</Workbook>"
  }

  // -------------------------------------------------- framed writer

  /** Write a rendered single-column frame as ONE text file with optional
    * header/footer framing — the reference's single-stream output shape.
    * `append` reopens the file in 'a' mode (`formatter.py:28-41,160`:
    * later cursors of a multi-statement script re-open the same target
    * appending, each with its own header). Streams partition-by-partition
    * via toLocalIterator; the driver never materializes the dataset. For
    * cluster-scale multi-part output use `df.write.text` on the render
    * instead. */
  def writeFramed(lines: DataFrame, path: String,
                  header: Option[String] = None,
                  footer: Option[String] = None,
                  append: Boolean = false): Unit = {
    val out = new java.io.PrintWriter(
      new java.io.BufferedWriter(new java.io.FileWriter(path, append), 1 << 20))
    try {
      header.foreach(out.println)
      val it = lines.toLocalIterator()
      while (it.hasNext) out.println(it.next().getString(0))
      footer.foreach(out.println)
    } finally out.close()
  }

  /** Write several rendered results into ONE framed file: a document
    * header, then per-result (open, rows, close) sections, then a
    * document footer — the XML next_sheet shape where every statement
    * of a script becomes a Table/Worksheet in the same document. */
  def writeFramedSections(path: String, docOpen: String,
                          sections: Seq[(String, DataFrame, String)],
                          docClose: String): Unit = {
    val out = new java.io.PrintWriter(
      new java.io.BufferedWriter(new java.io.FileWriter(path), 1 << 20))
    try {
      out.println(docOpen)
      sections.foreach { case (open, lines, close) =>
        out.println(open)
        val it = lines.toLocalIterator()
        while (it.hasNext) out.println(it.next().getString(0))
        out.println(close)
      }
      out.println(docClose)
    } finally out.close()
  }

  /** Binary extraction (`examples/extract-images.py:33-40`): write each
    * row's binary payload to a file named by another column. Runs on the
    * executors via foreachPartition — payloads never pass through the
    * driver (`dir` must be a path every executor can reach). */
  def extractBinaries(df: DataFrame, nameCol: String, dataCol: String,
                      dir: String): Unit = {
    new java.io.File(dir).mkdirs()
    df.select(col(nameCol).cast("string"), col(dataCol))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        it.foreach { r =>
          if (!r.isNullAt(0) && !r.isNullAt(1)) {
            val name = new java.io.File(r.getString(0)).getName // no traversal
            java.nio.file.Files.write(
              java.nio.file.Paths.get(dir, name), r.getAs[Array[Byte]](1))
          }
        }
      }
  }

}
