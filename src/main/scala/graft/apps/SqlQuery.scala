package graft.apps

import graft.io.{Sinks, SqlRender, SqlScript, Xlsx}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** sql-query app (`lwetl/programs/sql_query/main.py`): run a SQL script
  * and route each SELECT result to a formatter sink. The reference's
  * cursor loop becomes: split statements → `spark.sql` each → write the
  * results through the chosen sink. Output formats mirror
  * `FORMATTERS` (`sql_query/cmdline.py:11-18`).
  */
object SqlQuery {

  /** Output formats of the reference CLI. */
  sealed trait Format
  case object Text extends Format    // fixed-width console style
  case object Csv extends Format
  case object XmlPlain extends Format
  case object XmlExcel extends Format
  case object XlsxFmt extends Format
  case class SqlInsert(table: String, dialect: SqlRender.Dialect = SqlRender.Ansi)
    extends Format

  // ------------------------------------------------- CLI input routing

  /** Where a `command_or_sql` argument dispatches
    * (`sql_query/main.py:280-313`). */
  sealed trait Route
  case object StdInScript extends Route                  // empty → read stdin
  case object JdbcInfo extends Route                     // 'jdbc_info'
  case object TableInfo extends Route                    // 'table_info'
  case class ScriptFile(path: String) extends Route      // existing file
  case class TableSelect(table: String) extends Route    // bare table name
  case class TableUpload(table: String, file: String,
                         format: String) extends Route   // table + input file
  case class SqlText(sql: String) extends Route          // inline SQL

  /** The reference's dispatch table (`sql_query/main.py:280-313`):
    * empty → stdin; the two info keywords; an existing file; a bare
    * token probed as a table via `SELECT * WHERE 0=1` — a failed probe
    * leaves sql unset and falls through to stdin exactly like the
    * reference (`main.py:292-313` never treats the bare token as SQL).
    * A bare TABLE plus an input file routes to upload; an explicit
    * csv/xlsx CLI format wins over content sniffing (`main.py:62-66`
    * only sniffs when args.format is neither). */
  def route(spark: SparkSession, commandOrSql: String,
            fileName: Option[String] = None,
            cliFormat: Option[String] = None): Route = {
    val arg = Option(commandOrSql).getOrElse("").trim
    if (arg.isEmpty) StdInScript
    else if (arg.equalsIgnoreCase("jdbc_info")) JdbcInfo
    else if (arg.equalsIgnoreCase("table_info")) TableInfo
    else if (new java.io.File(arg).isFile) ScriptFile(arg)
    else if (!arg.contains(' ')) {
      // bare-table probe (`main.py:292-307`): cheap analysis-only check
      val isTable =
        scala.util.Try(spark.sql(s"SELECT * FROM $arg WHERE 0=1").schema).isSuccess
      if (!isTable) StdInScript
      else fileName match {
        case None => TableSelect(arg)
        case Some(f) if new java.io.File(f).isFile =>
          val fmt = cliFormat.map(_.toLowerCase).filter(Set("csv", "xlsx"))
            .getOrElse(sniffFormat(f))
          TableUpload(arg, f, fmt)
        case Some(f) =>
          throw new IllegalArgumentException(s"specified input file not found: $f")
      }
    } else SqlText(arg)
  }

  /** Input-format sniffing (`sql_query/main.py:62-80`): extension
    * first (xlsx / csv|dat|txt), then the binary-content heuristic —
    * any byte outside the text set {7,8,9,10,12,13,27} ∪
    * [0x20,0xFF]∖{0x7F} in the first 1 KiB marks the file binary
    * (⇒ xlsx), else text (⇒ csv). */
  def sniffFormat(fileName: String): String = {
    val lc = fileName.toLowerCase
    val ext = if (lc.contains('.')) lc.split('.').last else ""
    ext match {
      case "xlsx" => "xlsx"
      case "csv" | "dat" | "txt" => "csv"
      case _ =>
        val in = new java.io.FileInputStream(fileName)
        try {
          val buf = new Array[Byte](1024)
          val n = math.max(0, in.read(buf))
          val textChars = Set(7, 8, 9, 10, 12, 13, 27) ++
            (0x20 until 0x100).toSet - 0x7f
          val isBinary = buf.take(n).exists(b => !textChars.contains(b & 0xff))
          if (isBinary) "xlsx" else "csv"
        } finally in.close()
    }
  }

  /** Import the upload file in its sniffed format — the front half of
    * `upload_table` (`main.py:59-100`); the caller appends the frame
    * to its target (JDBC or parquet). */
  def importFile(spark: SparkSession, file: String, format: String,
                 separator: String = "\t"): DataFrame = format match {
    case "xlsx" => Xlsx.read(spark, file)
    case "csv" => graft.io.CsvImport.read(spark, file, separator)
    case other => throw new IllegalArgumentException(
      s"formatter $other is not supported for file upload. Valid choices: csv, xlsx")
  }

  /** Read an entire stdin stream as the SQL script (`main.py:312`). */
  def readStdIn(in: java.io.InputStream = System.in): String =
    scala.io.Source.fromInputStream(in, "UTF-8").mkString

  /** Run a script; write every row-bearing result to `outPath`. Multi-
    * statement scripts share ONE output like the reference
    * (`sql_query/main.py:166-173`): xlsx and xml get a sheet/table per
    * statement (next_sheet), text/csv/sql close and re-open the same
    * file appending — each appended section carries its own header
    * (`f.header()` runs per cursor). Returns the statements executed. */
  def run(spark: SparkSession, script: String, format: Format,
          outPath: String, maxRows: Option[Int] = None): Seq[String] = {
    val results = SqlScript.run(spark, script)
    val selects = results.filter(_._2.schema.nonEmpty)
    val limited = selects.map { case (sql, df) =>
      sql -> maxRows.map(df.limit).getOrElse(df)
    }

    format match {
      case XlsxFmt =>
        Xlsx.write(limited.zipWithIndex.map { case ((_, df), i) =>
          s"Sheet${i + 1}" -> df
        }, outPath)
      case XmlPlain | XmlExcel =>
        val dia = if (format == XmlPlain) "plain" else "excel"
        if (limited.nonEmpty)
          Sinks.writeFramedSections(outPath, Sinks.xmlDocOpen(dia),
            limited.zipWithIndex.map { case ((_, df), i) =>
              (Sinks.xmlTableOpen(df, dia, s"Sheet${i + 1}"),
                Sinks.xmlRowLines(df, dia), Sinks.xmlTableClose(dia))
            }, Sinks.xmlDocClose(dia))
      case _ =>
        limited.zipWithIndex.foreach { case ((_, df), i) =>
          val append = i > 0
          format match {
            case Text =>
              Sinks.writeFramed(Sinks.fixedWidthLines(df), outPath,
                header = Some(Sinks.fixedWidthHeader(df)), append = append)
            case Csv =>
              Sinks.writeFramed(Sinks.csvLine(df), outPath,
                header = Some(df.columns.mkString(";")), append = append)
            case SqlInsert(table, d) =>
              Sinks.writeFramed(SqlRender.insertStatements(df, table, d),
                outPath, append = append)
            case _ => () // xlsx/xml handled above
          }
        }
    }
    results.map(_._1)
  }
}
