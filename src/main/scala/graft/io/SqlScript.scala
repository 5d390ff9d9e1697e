package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-script statement splitting + execution — the reference's
  * `InputParser` (`lwetl/input.py:81-112`) and the sql-query statement
  * loop (`lwetl/programs/sql_query/main.py:207-247`).
  *
  * Statements split on a terminator (default `;`) at END OF LINE only —
  * same caveat as the reference: a terminator mid-line does not split.
  * Execution is `spark.sql` per statement over the registered temp views
  * (Catalyst parse → analyze → optimize replaces the reference's
  * ship-to-RDBMS step).
  */
object SqlScript {

  /** Split a script into statements (terminator at EOL, stripped). */
  def split(script: String, terminator: String = ";"): Seq[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder

    def flush(): Unit = {
      val sql = cur.result().trim
      if (sql.nonEmpty) out += sql
      cur.clear()
    }

    script.split("\r?\n", -1).foreach { raw =>
      val line = raw.replaceAll("[\r\n]+$", "")
      if (line.replaceAll("\\s+$", "").endsWith(terminator)) {
        val stripped = line.replaceAll("\\s+$", "").dropRight(terminator.length)
        if (cur.nonEmpty) cur.append('\n')
        cur.append(stripped)
        flush()
      } else {
        if (cur.nonEmpty) cur.append('\n')
        cur.append(line)
      }
    }
    flush()
    out.result()
  }

  /** Run every statement; returns the result of each (SELECTs carry
    * rows; DDL/DML return empty frames — Spark's `sql` contract). The
    * reference queues SELECT cursors (cap 20) and prints the rest; here
    * the caller picks what to do with each DataFrame. */
  def run(spark: SparkSession, script: String,
          terminator: String = ";"): Seq[(String, DataFrame)] =
    split(script, terminator).map(sql => sql -> spark.sql(sql))

  /** Run a script and return the last SELECT-shaped result, if any —
    * the common CLI shape (`sql-query "..."` printing one result). */
  def runLast(spark: SparkSession, script: String,
              terminator: String = ";"): Option[DataFrame] =
    run(spark, script, terminator).map(_._2).filter(_.schema.nonEmpty).lastOption
}
