package graft.io

import java.io.{BufferedInputStream, BufferedOutputStream, FileInputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Minimal XLSX source/sink (`lwetl/table_import.py:378-480` XlsxImport,
  * `lwetl/formatter.py:442-525` XlsxFormatter) with ZERO extra
  * dependencies: an .xlsx file is a zip of XML parts, which the JDK's
  * zip + StAX handle fine.
  *
  * Deliberately driver-side, like the reference (openpyxl) — the format
  * itself is single-file/non-splittable and reference usage is small
  * config-scale workbooks. The sink streams rows via `toLocalIterator`
  * so nothing is collected; for 100 TB exports use the distributed
  * sinks (parquet/csv) instead — this exists for format parity.
  */
object Xlsx {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  // ------------------------------------------------------------ write

  /** Write sheets of (name, DataFrame) as one workbook. Numbers/bools
    * are native cells; timestamps/dates are NATIVE date cells — an
    * Excel serial number styled with a date numFmt, exactly what the
    * reference gets from openpyxl after its string2date coercion
    * (`lwetl/formatter.py:514-520`, COLUMN_TYPE_DATE); everything else
    * is an inline string.
    *
    * `pretty` is the reference's `prettify_excel` post-pass
    * (`lwetl/formatter.py:44-94`) folded into the write: bold, filled,
    * double-bordered header cells (a styles.xml part) + per-column
    * widths from the longest rendered value (header weighted 1.25, min
    * 5, cap 50, +2). Widths come from ONE distributed max-length agg
    * per sheet instead of the reference's full client-side re-read. */
  def write(sheets: Seq[(String, DataFrame)], path: String,
            pretty: Boolean = false): Unit = {
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    try {
      val n = sheets.length
      entry("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
          """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
          """<Default Extension="xml" ContentType="application/xml"/>""" +
          """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
          """<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>""" +
          (1 to n).map(i =>
            s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString +
          "</Types>")
      entry("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
          "</Relationships>")
      entry("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
          sheets.zipWithIndex.map { case ((name, _), i) =>
            s"""<sheet name="${esc(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
          }.mkString + "</sheets></workbook>")
      entry("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          (1 to n).map(i =>
            s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""").mkString +
          s"""<Relationship Id="rId${n + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>""" +
          "</Relationships>")
      entry("xl/styles.xml", stylesXml)

      sheets.zipWithIndex.foreach { case ((_, df), si) =>
        zos.putNextEntry(new ZipEntry(s"xl/worksheets/sheet${si + 1}.xml"))
        val w = new java.io.OutputStreamWriter(zos, StandardCharsets.UTF_8)
        w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
        w.write("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""")
        if (pretty) {
          val cols = columnWidths(df).zipWithIndex.map { case (wd, i) =>
            s"""<col min="${i + 1}" max="${i + 1}" width="$wd" customWidth="1"/>"""
          }
          w.write("<cols>" + cols.mkString + "</cols>")
        }
        w.write("<sheetData>")
        val hs = if (pretty) """ s="1"""" else ""
        w.write("<row>" + df.columns.map(c =>
          s"""<c t="inlineStr"$hs><is><t>${esc(c)}</t></is></c>""").mkString + "</row>")
        val fields = df.schema.fields
        val it = df.toLocalIterator()
        while (it.hasNext) {
          val row = it.next()
          val cells = fields.indices.map { i =>
            if (row.isNullAt(i)) "<c/>"
            else fields(i).dataType match {
              case _: IntegerType | _: LongType | _: ShortType | _: ByteType |
                   _: DoubleType | _: FloatType | _: DecimalType =>
                s"<c><v>${row.get(i)}</v></c>"
              case _: TimestampType | _: TimestampNTZType =>
                s"""<c s="2"><v>${serialString(dateSerial(row.get(i)))}</v></c>"""
              case _: DateType =>
                s"""<c s="3"><v>${dateSerial(row.get(i)).toLong}</v></c>"""
              case _: BooleanType =>
                s"""<c t="b"><v>${if (row.getBoolean(i)) 1 else 0}</v></c>"""
              case _: BinaryType =>
                s"""<c t="inlineStr"><is><t>${esc(Sinks.BinarySuppressed)}</t></is></c>"""
              case _ =>
                s"""<c t="inlineStr"><is><t>${esc(String.valueOf(row.get(i)))}</t></is></c>"""
            }
          }
          w.write("<row>" + cells.mkString + "</row>")
        }
        w.write("</sheetData></worksheet>")
        w.flush()
        zos.closeEntry()
      }
    } finally zos.close()
  }

  /** Column widths per the reference's rule (`formatter.py:84-93`):
    * longest rendered cell, header length weighted 1.25, floor 5,
    * cap 50, +2 padding. One distributed agg — no client re-read. */
  private[io] def columnWidths(df: DataFrame): Seq[Int] = {
    import org.apache.spark.sql.functions.{coalesce, length, lit, max, col}
    val maxRow: Seq[Int] =
      if (df.isEmpty) df.columns.toSeq.map(_ => 0)
      else df.agg(
        coalesce(max(length(col(df.columns.head).cast("string"))), lit(0)).as("w0"),
        df.columns.tail.zipWithIndex.map { case (c, i) =>
          coalesce(max(length(col(c).cast("string"))), lit(0)).as(s"w${i + 1}")
        }.toIndexedSeq: _*
      ).head().toSeq.map(_.asInstanceOf[Number].intValue())
    df.columns.toSeq.zip(maxRow).map { case (name, dataW) =>
      val w = math.max(5, math.max(dataW, (1.25 * name.length).toInt))
      math.min(w, 50) + 2
    }
  }

  // Excel serial date: days since 1899-12-30; 1970-01-01 = 25569.
  private val ExcelEpochDay = 25569L

  /** Any temporal value → Excel serial (UTC wall-clock — the session
    * timezone everywhere in this engine). */
  private[io] def dateSerial(v: Any): Double = v match {
    case t: java.sql.Timestamp => ExcelEpochDay + t.getTime / 86400000.0
    case d: java.sql.Date => ExcelEpochDay + d.toLocalDate.toEpochDay
    case ldt: java.time.LocalDateTime =>
      ExcelEpochDay + ldt.toInstant(java.time.ZoneOffset.UTC).toEpochMilli / 86400000.0
    case ld: java.time.LocalDate => ExcelEpochDay + ld.toEpochDay
    case i: java.time.Instant => ExcelEpochDay + i.toEpochMilli / 86400000.0
    case other => throw new IllegalArgumentException(
      s"not a temporal value: ${other.getClass.getName}")
  }

  /** Serial → text without scientific notation (whole days drop the
    * fraction, like openpyxl writes pure dates). */
  private[io] def serialString(d: Double): String =
    if (d == d.toLong.toDouble) d.toLong.toString
    else java.math.BigDecimal.valueOf(d).toPlainString

  /** Excel serial → display string: date-only for whole days, else
    * timestamp rounded to millis ("yyyy-MM-dd HH:mm:ss[.SSS]"). */
  private[io] def serialToString(serial: Double): String = {
    val ms = math.round((serial - ExcelEpochDay) * 86400000.0)
    val ldt = java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli(ms), java.time.ZoneOffset.UTC)
    if (ms % 86400000L == 0) ldt.toLocalDate.toString
    else if (ms % 1000L == 0)
      ldt.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    else
      ldt.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
  }

  /** Minimal styles part carrying the reference's header style
    * (`formatter.py:55-63`): bold font, solid CCCCCC fill, centered,
    * thin sides + double red top/bottom — plus the two date number
    * formats native date cells point at (`formatter.py:489-496` via
    * openpyxl's default datetime/date formats). Style index 1 =
    * header, 2 = datetime, 3 = date. */
  private val stylesXml: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
      """<numFmts count="2">""" +
      """<numFmt numFmtId="164" formatCode="yyyy\-mm\-dd\ hh:mm:ss"/>""" +
      """<numFmt numFmtId="165" formatCode="yyyy\-mm\-dd"/>""" +
      """</numFmts>""" +
      """<fonts count="2"><font/><font><b/></font></fonts>""" +
      """<fills count="3">""" +
      """<fill><patternFill patternType="none"/></fill>""" +
      """<fill><patternFill patternType="gray125"/></fill>""" +
      """<fill><patternFill patternType="solid"><fgColor rgb="00CCCCCC"/><bgColor indexed="64"/></patternFill></fill>""" +
      """</fills>""" +
      """<borders count="2">""" +
      """<border><left/><right/><top/><bottom/><diagonal/></border>""" +
      """<border>""" +
      """<left style="thin"><color rgb="FF000000"/></left>""" +
      """<right style="thin"><color rgb="FF000000"/></right>""" +
      """<top style="double"><color rgb="FFFF0000"/></top>""" +
      """<bottom style="double"><color rgb="FFFF0000"/></bottom>""" +
      """<diagonal/></border>""" +
      """</borders>""" +
      """<cellStyleXfs count="1"><xf numFmtId="0" fontId="0" fillId="0" borderId="0"/></cellStyleXfs>""" +
      """<cellXfs count="4">""" +
      """<xf numFmtId="0" fontId="0" fillId="0" borderId="0" xfId="0"/>""" +
      """<xf numFmtId="0" fontId="1" fillId="2" borderId="1" xfId="0" applyFont="1" applyFill="1" applyBorder="1" applyAlignment="1"><alignment horizontal="center"/></xf>""" +
      """<xf numFmtId="164" fontId="0" fillId="0" borderId="0" xfId="0" applyNumberFormat="1"/>""" +
      """<xf numFmtId="165" fontId="0" fillId="0" borderId="0" xfId="0" applyNumberFormat="1"/>""" +
      """</cellXfs></styleSheet>"""

  // ------------------------------------------------------------- read

  /** Read one sheet (first by default, or by name) into a DataFrame of
    * strings; header row → columns via [[Naming.uniqueColumnNames]],
    * empty cells → NULL (lwetl is_empty), all-empty rows dropped. */
  def read(spark: SparkSession, path: String,
           sheet: Option[String] = None): DataFrame = {
    val zf = new ZipFile(path)
    try {
      val sheetPath = resolveSheet(zf, sheet)
      val shared = readSharedStrings(zf)
      val rows = readSheetRows(zf, sheetPath, shared, readDateStyles(zf))
      if (rows.isEmpty)
        throw new IllegalArgumentException(s"No data found for: '$path'")
      val names = Naming.uniqueColumnNames(rows.head.map(_.orNull))
      val data = rows.tail
        .map(r => Row.fromSeq(names.indices.map(i =>
          r.lift(i).flatten.filter(_.trim.nonEmpty).orNull)))
        .filter(r => names.indices.exists(i => r.get(i) != null))
      val schema = StructType(names.map(n => StructField(n, StringType)))
      spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava),
        schema)
    } finally zf.close()
  }

  private def resolveSheet(zf: ZipFile, sheet: Option[String]): String = {
    val xif = XMLInputFactory.newInstance()
    // sheet name → r:id from workbook.xml
    var rid: String = null
    val wb = xif.createXMLStreamReader(zf.getInputStream(zf.getEntry("xl/workbook.xml")))
    var firstRid: String = null
    while (wb.hasNext) {
      if (wb.next() == XMLStreamConstants.START_ELEMENT && wb.getLocalName == "sheet") {
        var name: String = null; var id: String = null
        (0 until wb.getAttributeCount).foreach { i =>
          wb.getAttributeLocalName(i) match {
            case "name" => name = wb.getAttributeValue(i)
            case "id" => id = wb.getAttributeValue(i)
            case _ =>
          }
        }
        if (firstRid == null) firstRid = id
        if (sheet.contains(name)) rid = id
      }
    }
    wb.close()
    val want = Option(rid).getOrElse(
      sheet match {
        case Some(s) => throw new IllegalArgumentException(s"sheet not found: $s")
        case None => firstRid
      })
    // r:id → target from workbook rels
    var target: String = null
    val rels = xif.createXMLStreamReader(
      zf.getInputStream(zf.getEntry("xl/_rels/workbook.xml.rels")))
    while (rels.hasNext) {
      if (rels.next() == XMLStreamConstants.START_ELEMENT && rels.getLocalName == "Relationship") {
        var id: String = null; var tgt: String = null
        (0 until rels.getAttributeCount).foreach { i =>
          rels.getAttributeLocalName(i) match {
            case "Id" => id = rels.getAttributeValue(i)
            case "Target" => tgt = rels.getAttributeValue(i)
            case _ =>
          }
        }
        if (id == want) target = tgt
      }
    }
    rels.close()
    if (target == null) throw new IllegalArgumentException("worksheet rel not found")
    if (target.startsWith("/")) target.drop(1) else s"xl/$target"
  }

  private def readSharedStrings(zf: ZipFile): IndexedSeq[String] = {
    val e = zf.getEntry("xl/sharedStrings.xml")
    if (e == null) return IndexedSeq.empty
    val xif = XMLInputFactory.newInstance()
    val r = xif.createXMLStreamReader(zf.getInputStream(e))
    val out = IndexedSeq.newBuilder[String]
    var cur: StringBuilder = null
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT if r.getLocalName == "si" =>
          cur = new StringBuilder
        case XMLStreamConstants.CHARACTERS if cur != null =>
          cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" =>
          out += cur.result(); cur = null
        case _ =>
      }
    }
    r.close()
    out.result()
  }

  /** Column letter(s) of an A1-style ref → 0-based index. */
  private[io] def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1

  /** Indices of cellXfs whose number format is a date/time — built-in
    * ids 14-22 and 45-47, or a custom formatCode containing date
    * letters (the openpyxl is_date_format heuristic). Numeric cells
    * styled with one of these read back as date strings. */
  private def readDateStyles(zf: ZipFile): Set[Int] = {
    val e = zf.getEntry("xl/styles.xml")
    if (e == null) return Set.empty
    val xif = XMLInputFactory.newInstance()
    val r = xif.createXMLStreamReader(zf.getInputStream(e))
    val customDateFmts = scala.collection.mutable.Set.empty[Int]
    val dateXfs = scala.collection.mutable.Set.empty[Int]
    var inCellXfs = false
    var xfIdx = -1
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "numFmt" =>
            var id = -1; var code = ""
            (0 until r.getAttributeCount).foreach { i =>
              r.getAttributeLocalName(i) match {
                case "numFmtId" => id = r.getAttributeValue(i).toInt
                case "formatCode" => code = r.getAttributeValue(i)
                case _ =>
              }
            }
            // strip bracketed sections ([Red], [$-409]), escapes, and
            // quoted literals before looking for y/m/d/h/s — openpyxl's
            // is_date_format does the same, and without the bracket
            // strip '#,##0;[Red]-#,##0' would read as a date format
            val bare = code.replaceAll("\\[[^\\]]*\\]", "")
              .replaceAll("\\\\.", "").replaceAll("\"[^\"]*\"", "")
            if (id >= 0 && bare.toLowerCase.exists("ymdhs".contains(_)))
              customDateFmts += id
          case "cellXfs" => inCellXfs = true; xfIdx = -1
          case "xf" if inCellXfs =>
            xfIdx += 1
            var fmt = 0
            (0 until r.getAttributeCount).foreach { i =>
              if (r.getAttributeLocalName(i) == "numFmtId")
                fmt = r.getAttributeValue(i).toInt
            }
            if ((fmt >= 14 && fmt <= 22) || (fmt >= 45 && fmt <= 47) ||
              customDateFmts.contains(fmt)) dateXfs += xfIdx
          case _ =>
        }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" =>
          inCellXfs = false
        case _ =>
      }
    }
    r.close()
    dateXfs.toSet
  }

  private def readSheetRows(zf: ZipFile, sheetPath: String,
                            shared: IndexedSeq[String],
                            dateStyles: Set[Int] = Set.empty): Seq[IndexedSeq[Option[String]]] = {
    val xif = XMLInputFactory.newInstance()
    val r = xif.createXMLStreamReader(
      new BufferedInputStream(zf.getInputStream(zf.getEntry(sheetPath))))
    val rows = Seq.newBuilder[IndexedSeq[Option[String]]]
    var row: scala.collection.mutable.ArrayBuffer[Option[String]] = null
    var cellIdx = -1
    var cellType = ""
    var cellStyle = -1
    var inV = false
    var inT = false
    var text = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" => row = scala.collection.mutable.ArrayBuffer.empty
          case "c" =>
            cellType = ""
            cellStyle = -1
            cellIdx = row.length
            (0 until r.getAttributeCount).foreach { i =>
              r.getAttributeLocalName(i) match {
                case "r" => cellIdx = colIndex(r.getAttributeValue(i))
                case "t" => cellType = r.getAttributeValue(i)
                case "s" => cellStyle = r.getAttributeValue(i).toInt
                case _ =>
              }
            }
            while (row.length < cellIdx) row += None
            row += None
          case "v" => inV = true; text = new StringBuilder
          case "t" => inT = true; if (!inV) text = new StringBuilder
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS if inV || inT =>
          text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "row" => rows += row.toIndexedSeq; row = null
          case "v" =>
            inV = false
            val raw = text.result()
            val v = cellType match {
              case "s" => shared.lift(raw.trim.toInt).getOrElse("")
              case "b" => if (raw.trim == "1") "true" else "false"
              case "" | "n" if dateStyles.contains(cellStyle) =>
                // date-styled numeric cell → the datetime the serial
                // encodes, like openpyxl hands the reference a datetime
                scala.util.Try(serialToString(raw.trim.toDouble)).getOrElse(raw)
              case _ => raw
            }
            if (cellIdx >= 0 && cellIdx < row.length) row(cellIdx) = Some(v)
          case "t" =>
            if (inT && cellType == "inlineStr" && cellIdx >= 0 && cellIdx < row.length)
              row(cellIdx) = Some(text.result())
            inT = false
          case _ =>
        }
        case _ =>
      }
    }
    r.close()
    rows.result()
  }
}
