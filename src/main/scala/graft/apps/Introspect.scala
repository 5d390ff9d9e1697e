package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema introspection (`lwetl/queries.py` content/count queries +
  * `lwetl/jdbc_info.py` — SURVEY §2.1): the reference ships dialect-
  * specific catalog SQL to the RDBMS; on Spark the catalog IS the
  * engine's, so these are `spark.catalog` projections shaped like the
  * reference's result sets. */
object Introspect {

  /** Tables of a database as (table_name, is_temporary). */
  def tables(spark: SparkSession, db: Option[String] = None): DataFrame = {
    import spark.implicits._
    val ts = db.map(spark.catalog.listTables)
      .getOrElse(spark.catalog.listTables())
      .collect().toSeq
      .map(t => (t.name, t.isTemporary))
    ts.toDF("table_name", "is_temporary").orderBy("table_name")
  }

  /** Columns of a table as (column_name, data_type, nullable) — the
    * shape of the reference's column catalog queries. */
  def columns(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    spark.catalog.listColumns(table).collect().toSeq
      .map(c => (c.name, c.dataType, c.nullable))
      .toDF("column_name", "data_type", "nullable")
  }

  /** The whole catalog as one frame (table_name, column_name,
    * data_type, nullable) — what sql-query's `table_info` keyword dumps
    * (`sql_query/main.py:283-288` routes it to the dialect content
    * query; the Spark-catalog equivalent of [[CatalogQueries]]). */
  def tableColumns(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = spark.catalog.listTables().collect().toSeq.flatMap { t =>
      spark.catalog.listColumns(t.name).collect().toSeq
        .map(c => (t.name, c.name, c.dataType, c.nullable))
    }
    rows.toDF("table_name", "column_name", "data_type", "nullable")
      .orderBy("table_name", "column_name")
  }

  /** Per-table row counts (`table_count_queries`,
    * `lwetl/queries.py:206-215`): COUNT(*) + exact distinct of a key. */
  def tableCounts(spark: SparkSession, names: Seq[String]): DataFrame = {
    import spark.implicits._
    names.map(n => (n, spark.table(n).count()))
      .toDF("table_name", "n_rows").orderBy("table_name")
  }

  /** Driver/runtime info (`lwetl/jdbc_info.py` parity, engine-side):
    * versions + session confs worth reporting. */
  def info(spark: SparkSession): Seq[(String, String)] = Seq(
    "spark.version" -> spark.version,
    "scala.version" -> scala.util.Properties.versionNumberString,
    "java.version" -> System.getProperty("java.version"),
    "spark.master" -> spark.sparkContext.master,
    "spark.sql.shuffle.partitions" ->
      scala.util.Try(spark.conf.get("spark.sql.shuffle.partitions")).getOrElse(""),
    "spark.sql.adaptive.enabled" ->
      scala.util.Try(spark.conf.get("spark.sql.adaptive.enabled")).getOrElse(""))
}
