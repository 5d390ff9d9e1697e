package graft.apps

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Runnable entry points mirroring the reference's three console
  * scripts (`setup.py:35-42`): sql-query, db-copy, table-cardinality —
  * driven against parquet directories instead of JDBC urls. */
object Mains {

  private[apps] def session(name: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]").appName(name)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.registerAll(s)
    s
  }
}

/** `sql-query <sfDir> <sql-or-file> [format] [out]` — run a script over
  * the registered tables, write through a formatter sink
  * (`lwetl/programs/sql_query/main.py` routing, file-or-literal). */
object SqlQueryMain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, src, rest @ _*) = args.toSeq.toArray: @unchecked
    val format = rest.headOption.getOrElse("csv")
    val out = rest.lift(1).getOrElse("/tmp/graft_sql_query.out")
    val spark = Mains.session("graft-sql-query")
    Tables.registerAll(spark, sfDir)
    val script =
      if (new java.io.File(src).isFile)
        new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(src)))
      else src
    val fmt = format match {
      case "text" => SqlQuery.Text
      case "xml" => SqlQuery.XmlExcel
      case "xmlp" => SqlQuery.XmlPlain
      case "xlsx" => SqlQuery.XlsxFmt
      case s if s.startsWith("sql:") => SqlQuery.SqlInsert(s.drop(4))
      case _ => SqlQuery.Csv
    }
    val stmts = SqlQuery.run(spark, script, fmt, out)
    println(s"[sql-query] ${stmts.length} statement(s) -> $out")
    spark.stop()
  }
}

/** `db-copy <srcDir> <trgDir> [mode]` — copy all test tables in FK
  * topological order, insert/update/sync per mode, parquet target
  * (`lwetl/programs/db_copy/main.py` shape; counts reported per table). */
object DbCopyMain {

  /** FK references of the TPC-H-ish test schema (target tables load
    * first — reference discovers this from catalog FK metadata). */
  val References: Map[String, Set[String]] = Map(
    "nation" -> Set("region"), "customer" -> Set("nation"),
    "supplier" -> Set("nation"), "orders" -> Set("customer"),
    "lineitem" -> Set("orders", "part", "supplier"),
    "region" -> Set.empty, "part" -> Set.empty)

  val Pks: Map[String, String] = Map(
    "region" -> "r_regionkey", "nation" -> "n_nationkey",
    "customer" -> "c_custkey", "supplier" -> "s_suppkey",
    "part" -> "p_partkey", "orders" -> "o_orderkey",
    "lineitem" -> "l_orderkey")

  def main(args: Array[String]): Unit = {
    val Array(srcDir, trgDir, rest @ _*) = args.toSeq.toArray: @unchecked
    val mode = rest.headOption.getOrElse("insert") match {
      case "update" => DbCopy.Update
      case "sync" => DbCopy.Sync
      case _ => DbCopy.Insert
    }
    val spark = Mains.session("graft-db-copy")
    new java.io.File(trgDir).mkdirs()
    val order = DbCopy.topoOrder(References).filter(Pks.contains)
    order.foreach { t =>
      val src = Tables.load(spark, srcDir, t)
      val trgPath = s"$trgDir/$t.parquet"
      val trgExists = new java.io.File(trgPath).exists()
      if (!trgExists) {
        src.write.parquet(trgPath)
        println(s"[db-copy] $t: full copy (${src.count()} rows)")
      } else {
        val trg = spark.read.parquet(trgPath)
        val plan = DbCopy.plan(src, trg, Pks(t), mode)
        val nNew = plan.toInsert.count()
        // parquet is append-only here: new rows append; upsert/sync
        // rewrite — the transactional-table path is documented in
        // Uploader (MERGE belongs to Delta/Iceberg sinks)
        if (nNew > 0) plan.toInsert.write.mode("append").parquet(trgPath)
        println(s"[db-copy] $t: +$nNew new rows (mode=$mode)")
      }
    }
    spark.stop()
  }
}

/** `table-cardinality <sfDir> <table> <out.xlsx>` — per-column profile
  * workbook (`lwetl/programs/table_cardinality/main.py`). */
object TableCardinalityMain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, table, out) = args: @unchecked
    val spark = Mains.session("graft-table-cardinality")
    TableCardinality.report(Tables.load(spark, sfDir, table), out)
    println(s"[table-cardinality] $table -> $out")
    spark.stop()
  }
}
