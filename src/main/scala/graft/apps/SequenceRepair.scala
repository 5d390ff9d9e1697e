package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle sequence repair (`examples/oracle-update-sequences.py`) —
  * previously the one SURVEY §2.4 row documented out of scope. The
  * reference scans USER_SEQUENCES, matches each sequence to a
  * single-column-PK table by name prefix, and where `last_number`
  * lags `max(pk)` executes a DROP/CREATE/NEXTVAL×2/ALTER/NEXTVAL dance
  * to fast-forward it.
  *
  * Re-expressed engine-side: the catalog SQL corpus supplies the two
  * oracle queries, the max(pk) probes run as one distributed job over
  * whatever frames back the tables, and the repair DDL renders as a
  * pipe-mode statement stream (execution belongs to the RDBMS — same
  * commit/rollback contract as the uploaders). */
object SequenceRepair {

  /** `SQL_LIST_SEQUENCES` (oracle-update-sequences.py:41-46). */
  val ListSequencesSql: String =
    "SELECT SEQUENCE_NAME, LAST_NUMBER FROM USER_SEQUENCES ORDER BY SEQUENCE_NAME"

  /** `SQL_LIST_TABLES_COLUMNS` + single-PK restriction
    * (oracle-update-sequences.py:48-62). */
  val SinglePkTablesSql: String =
    """SELECT t.table_name, MIN(t.column_name) AS column_name
      |FROM (SELECT c.table_name, c.column_name
      |      FROM user_constraints s
      |      INNER JOIN all_cons_columns c ON s.constraint_name = c.constraint_name
      |        AND s.constraint_type = 'P' AND s.STATUS = 'ENABLED') t
      |GROUP BY t.table_name HAVING COUNT(*) = 1
      |ORDER BY t.table_name""".stripMargin

  case class Sequence(name: String, value: Long)

  /** Prefix-match sequences to tables (`:66-73`): the FIRST table (in
    * the given order) whose name prefixes the sequence name claims it;
    * a table keeps only its first matching sequence. */
  def matchSequences(tables: Seq[String],
                     sequences: Seq[(String, Long)]): Map[String, Sequence] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Sequence]
    sequences.foreach { case (rawName, value) =>
      val name = rawName.toUpperCase
      tables.find(t => name.startsWith(t.toUpperCase)).foreach { t =>
        if (!out.contains(t.toUpperCase)) out(t.toUpperCase) = Sequence(name, value)
      }
    }
    out.toMap
  }

  /** One table's repair decision. */
  case class Repair(table: String, pkCol: String, sequence: String,
                    current: Long, maxPk: Long) {
    def needed: Boolean = maxPk > current
  }

  /** Probe max(pk) per table in ONE Spark job (the reference runs one
    * `SELECT MAX` round trip per table): a union of tiny per-table
    * aggregates — each input prunes to its single PK column, and the
    * union's branches run in parallel. */
  def maxPks(tables: Map[String, (DataFrame, String)]): Map[String, Long] = {
    if (tables.isEmpty) return Map.empty
    val frames = tables.toSeq.map { case (t, (df, pk)) =>
      df.agg(max(col(pk).cast("long")).as("mx"))
        .select(lit(t).as("t"), coalesce(col("mx"), lit(0L)).as("mx"))
    }
    frames.reduce(_ unionByName _).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** Build the repair plan: match sequences, compare against max(pk).
    * Table-name lookups are case-normalized once — matchSequences keys
    * by uppercased name, so a lowercase `tables` key must still find
    * its frame and its max. */
  def plan(tables: Map[String, (DataFrame, String)],
           sequences: Seq[(String, Long)]): Seq[Repair] = {
    val byUpper = tables.map { case (t, v) => t.toUpperCase -> v }
    val matched = matchSequences(byUpper.keys.toSeq.sorted, sequences)
    val maxes = maxPks(byUpper.filter { case (t, _) => matched.contains(t) })
    matched.toSeq.sortBy(_._1).map { case (t, s) =>
      Repair(t, byUpper(t)._2, s.name, s.value, maxes.getOrElse(t, 0L))
    }
  }

  /** The reference's exact repair statement dance (`:85-95`): drop,
    * recreate with INCREMENT = max so the first NEXTVAL jumps there,
    * pump twice, reset increment to 1, pump once more. Oracle dialect
    * (DUAL, NEXTVAL); rendered only — pipe to the target to execute. */
  def repairStatements(r: Repair): Seq[String] = {
    val nextv = s"SELECT ${r.sequence}.NEXTVAL FROM DUAL"
    Seq(
      s"DROP SEQUENCE ${r.sequence}",
      s"CREATE SEQUENCE ${r.sequence} START WITH 1 MINVALUE 1 INCREMENT BY ${r.maxPk}",
      nextv, nextv,
      s"ALTER SEQUENCE ${r.sequence} INCREMENT BY 1",
      nextv)
  }

  /** Full pipe-mode output: one "stmt" frame of every needed repair —
    * the same shape the DML renderers emit. */
  def repairPlanStatements(spark: SparkSession, repairs: Seq[Repair]): DataFrame = {
    import spark.implicits._
    repairs.filter(_.needed).flatMap(repairStatements).toDF("stmt")
  }
}
