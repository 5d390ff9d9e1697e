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

  /** Run a script; write every row-bearing result to `outPath` (multi-
    * result scripts go to numbered files / sheets like the reference's
    * next_sheet handling). Returns the statements executed. */
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
      case _ =>
        limited.zipWithIndex.foreach { case ((_, df), i) =>
          val path = if (limited.length == 1) outPath
            else outPath + s".$i"
          format match {
            case Text =>
              Sinks.writeFramed(Sinks.fixedWidthLines(df), path,
                header = Some(Sinks.fixedWidthHeader(df)))
            case Csv =>
              Sinks.writeFramed(Sinks.csvLine(df), path,
                header = Some(df.columns.mkString(";")))
            case XmlPlain =>
              Sinks.writeFramed(Sinks.xmlRowLines(df, "plain"), path,
                Some(Sinks.xmlHeader(df, "plain")), Some(Sinks.xmlFooter("plain")))
            case XmlExcel =>
              Sinks.writeFramed(Sinks.xmlRowLines(df, "excel"), path,
                Some(Sinks.xmlHeader(df, "excel", s"Sheet${i + 1}")),
                Some(Sinks.xmlFooter("excel")))
            case SqlInsert(table, d) =>
              Sinks.writeSqlInserts(df, table, path, d)
            case XlsxFmt => () // handled above
          }
        }
    }
    results.map(_._1)
  }
}
