package graft.apps

import org.apache.spark.sql.DataFrame

/** Per-dialect schema-introspection SQL (`lwetl/queries.py:1-215`) —
  * the catalog queries db-copy needs to discover tables, primary keys
  * and FK referents on a real RDBMS (oracle `queries.py:4-40`,
  * sqlserver `:44-98`, mysql `:102-154`, postgresql `:158-200`, sqlite
  * `:202-203`).
  *
  * Unlike the reference — whose five queries each emit their own column
  * spellings and the consumer normalizes at parse time
  * (`db_copy/main.py:167-178`) — every template here aliases to ONE
  * normalized shape, so the parser is dialect-free:
  *
  *   table_name, column_name, key_type ('PK'|'FK'|NULL), data_type,
  *   data_length, nullable ('Y'|'N'), fk_table, fk_column,
  *   constraint_name
  *
  * `@SCHEMA@` substitutes the login schema (same placeholder contract
  * as the reference, `db_copy/main.py:156-157`).
  */
object CatalogQueries {

  /** Normalized output columns every content query must declare. */
  val ContentColumns: Seq[String] = Seq(
    "table_name", "column_name", "key_type", "data_type", "data_length",
    "nullable", "fk_table", "fk_column", "constraint_name")

  /** Content queries per dialect (reference `content_queries`). */
  val contentQueries: Map[String, String] = Map(
    // ORACLE (`queries.py:4-40`): COLS/ALL_CONSTRAINTS walk. 'P' ⇒ PK;
    // 'R' (referential) ⇒ FK, with the referenced table resolved through
    // R_CONSTRAINT_NAME.
    "oracle" ->
      """SELECT
        |  t.TABLE_NAME        AS table_name,
        |  t.COLUMN_NAME       AS column_name,
        |  CASE r.CONSTRAINT_TYPE WHEN 'P' THEN 'PK' WHEN 'R' THEN 'FK' END
        |                      AS key_type,
        |  t.DATA_TYPE         AS data_type,
        |  t.DATA_LENGTH       AS data_length,
        |  t.NULLABLE          AS nullable,
        |  rr.TABLE_NAME       AS fk_table,
        |  tc.COLUMN_NAME      AS fk_column,
        |  c.CONSTRAINT_NAME   AS constraint_name
        |FROM COLS t
        |  INNER JOIN USER_TABLES ut ON ut.TABLE_NAME = t.TABLE_NAME
        |  LEFT JOIN ALL_CONS_COLUMNS c
        |    ON c.TABLE_NAME = t.TABLE_NAME AND c.COLUMN_NAME = t.COLUMN_NAME
        |  LEFT JOIN ALL_CONSTRAINTS r
        |    ON r.OWNER = c.OWNER AND r.CONSTRAINT_NAME = c.CONSTRAINT_NAME
        |   AND r.CONSTRAINT_TYPE IN ('P','R')
        |  LEFT JOIN ALL_CONSTRAINTS rr
        |    ON rr.OWNER = r.OWNER AND rr.CONSTRAINT_NAME = r.R_CONSTRAINT_NAME
        |  LEFT JOIN ALL_CONS_COLUMNS tc
        |    ON tc.CONSTRAINT_NAME = rr.CONSTRAINT_NAME
        |ORDER BY t.TABLE_NAME, t.COLUMN_NAME""".stripMargin,

    // SQL SERVER (`queries.py:44-98`): sys.* catalog; FK pairs resolved
    // through sys.foreign_key_columns. nchar/nvarchar report max_length
    // in BYTES — halve for the character length, as the reference does.
    "sqlserver" ->
      """SELECT
        |  t.name AS table_name,
        |  c.name AS column_name,
        |  CASE WHEN pk.column_id IS NOT NULL THEN 'PK'
        |       WHEN fk.parent_column_id IS NOT NULL THEN 'FK' END AS key_type,
        |  ty.name AS data_type,
        |  CASE WHEN ty.name IN ('nchar','nvarchar') AND c.max_length <> -1
        |       THEN c.max_length / 2 ELSE c.max_length END AS data_length,
        |  CASE WHEN c.is_nullable = 1 THEN 'Y' ELSE 'N' END AS nullable,
        |  rt.name AS fk_table,
        |  rc.name AS fk_column,
        |  COALESCE(OBJECT_NAME(fk.constraint_object_id), kc.name) AS constraint_name
        |FROM sys.tables t
        |  INNER JOIN sys.columns c ON c.object_id = t.object_id
        |  LEFT JOIN sys.types ty ON ty.user_type_id = c.system_type_id
        |       AND ty.user_type_id = ty.system_type_id
        |  LEFT JOIN (sys.index_columns pk
        |       INNER JOIN sys.key_constraints kc
        |          ON kc.parent_object_id = pk.object_id
        |         AND kc.unique_index_id = pk.index_id AND kc.type = 'PK')
        |    ON pk.object_id = c.object_id AND pk.column_id = c.column_id
        |  LEFT JOIN sys.foreign_key_columns fk
        |    ON fk.parent_object_id = c.object_id
        |   AND fk.parent_column_id = c.column_id
        |  LEFT JOIN sys.tables rt ON rt.object_id = fk.referenced_object_id
        |  LEFT JOIN sys.columns rc ON rc.object_id = fk.referenced_object_id
        |       AND rc.column_id = fk.referenced_column_id
        |ORDER BY t.name, c.name""".stripMargin,

    // MYSQL (`queries.py:102-154`): information_schema; the PRIMARY
    // constraint name marks PKs, referenced_table_name marks FKs.
    "mysql" ->
      """SELECT
        |  c.table_name,
        |  c.column_name,
        |  CASE WHEN k.constraint_name = 'PRIMARY' THEN 'PK'
        |       WHEN k.referenced_table_name IS NOT NULL THEN 'FK' END AS key_type,
        |  c.data_type,
        |  c.character_maximum_length AS data_length,
        |  CASE WHEN UPPER(c.is_nullable) = 'YES' THEN 'Y' ELSE 'N' END AS nullable,
        |  k.referenced_table_name  AS fk_table,
        |  k.referenced_column_name AS fk_column,
        |  k.constraint_name        AS constraint_name
        |FROM information_schema.columns c
        |  LEFT JOIN information_schema.key_column_usage k
        |    ON k.constraint_schema = c.table_schema
        |   AND k.table_name = c.table_name AND k.column_name = c.column_name
        |WHERE c.table_schema = '@SCHEMA@'
        |ORDER BY c.table_name, c.column_name""".stripMargin,

    // POSTGRESQL (`queries.py:158-200`): information_schema with
    // constraint_column_usage resolving the referenced (fk) side.
    "postgresql" ->
      """SELECT
        |  c.table_name,
        |  c.column_name,
        |  CASE WHEN tc_pk.constraint_name IS NOT NULL THEN 'PK'
        |       WHEN tc_fk.constraint_name IS NOT NULL THEN 'FK' END AS key_type,
        |  c.udt_name AS data_type,
        |  c.character_maximum_length AS data_length,
        |  CASE WHEN UPPER(c.is_nullable) = 'YES' THEN 'Y' ELSE 'N' END AS nullable,
        |  ccu.table_name  AS fk_table,
        |  ccu.column_name AS fk_column,
        |  COALESCE(tc_fk.constraint_name, tc_pk.constraint_name) AS constraint_name
        |FROM information_schema.columns c
        |  LEFT JOIN (information_schema.key_column_usage kcu_pk
        |       INNER JOIN information_schema.table_constraints tc_pk
        |          ON tc_pk.constraint_name = kcu_pk.constraint_name
        |         AND tc_pk.constraint_catalog = kcu_pk.constraint_catalog
        |         AND tc_pk.constraint_type = 'PRIMARY KEY')
        |    ON kcu_pk.table_name = c.table_name
        |   AND kcu_pk.column_name = c.column_name
        |  LEFT JOIN (information_schema.key_column_usage kcu_fk
        |       INNER JOIN information_schema.table_constraints tc_fk
        |          ON tc_fk.constraint_name = kcu_fk.constraint_name
        |         AND tc_fk.constraint_catalog = kcu_fk.constraint_catalog
        |         AND tc_fk.constraint_type = 'FOREIGN KEY'
        |       INNER JOIN information_schema.constraint_column_usage ccu
        |          ON ccu.constraint_name = tc_fk.constraint_name
        |         AND ccu.constraint_catalog = tc_fk.constraint_catalog)
        |    ON kcu_fk.table_name = c.table_name
        |   AND kcu_fk.column_name = c.column_name
        |WHERE c.table_schema = 'public' AND c.table_catalog = '@SCHEMA@'
        |  AND EXISTS (SELECT 1 FROM information_schema.tables t
        |              WHERE t.table_name = c.table_name
        |                AND t.table_catalog = c.table_catalog
        |                AND t.table_schema = 'public'
        |                AND t.table_type = 'BASE TABLE')
        |ORDER BY c.table_name, c.ordinal_position""".stripMargin,

    // SQLITE (`queries.py:202-203`): table list only — PK/FK need the
    // pragma calls, which JDBC metadata covers (fkMapFromMetadata).
    "sqlite" ->
      """SELECT tbl_name AS table_name FROM sqlite_master
        |WHERE type = 'table' ORDER BY tbl_name""".stripMargin)

  /** Table-count queries per dialect (`queries.py:206-215`). */
  val tableCountQueries: Map[String, String] = Map(
    "oracle" -> "SELECT COUNT(1) FROM USER_TABLES",
    "sqlserver" -> "SELECT COUNT(1) FROM sys.tables",
    "mysql" -> ("SELECT COUNT(DISTINCT table_name) FROM information_schema.columns " +
      "WHERE table_schema = '@SCHEMA@'"),
    "postgresql" -> ("SELECT COUNT(DISTINCT table_name) FROM information_schema.tables " +
      "WHERE table_schema = 'public' AND table_type = 'BASE TABLE' " +
      "AND table_catalog = '@SCHEMA@'"),
    "sqlite" -> "SELECT COUNT(1) FROM sqlite_master WHERE type = 'table'")

  /** Resolve a dialect's content query with the schema substituted —
    * the `@SCHEMA@` contract of `db_copy/main.py:156-157`. */
  def contentQuery(dialect: String, schema: String = ""): String = {
    val sql = contentQueries.getOrElse(dialect.toLowerCase,
      throw new IllegalArgumentException(
        s"database type '$dialect' not supported (have: ${contentQueries.keys.toSeq.sorted.mkString(", ")})"))
    sql.replace("@SCHEMA@", schema)
  }

  /** Parsed catalog: FK referents per table/column and the PK column
    * per table — exactly the two maps db-copy builds from the query
    * result (`db_copy/main.py:167-178`). */
  case class CatalogInfo(
      fkRefs: Map[String, Map[String, (String, String)]], // table → col → (fkTable, constraint)
      pk: Map[String, String]) {                          // table → pk column
    /** table → set of tables it references: the input to
      * [[DbCopy.topoOrder]]. */
    def referring: Map[String, Set[String]] =
      fkRefs.map { case (t, cols) => t -> cols.values.map(_._1).toSet }
  }

  /** Parse a content-query result (any dialect — the normalized shape)
    * into the FK/PK maps. Catalog results are inherently small
    * (rows = columns in the schema), so driver-side collect is the
    * right shape — same as the reference's row loop. */
  def parseContent(df: DataFrame): CatalogInfo = {
    val cols = df.columns.map(_.toLowerCase)
    def idx(name: String): Int = cols.indexOf(name)
    val iTable = idx("table_name"); val iCol = idx("column_name")
    val iKey = idx("key_type"); val iFkT = idx("fk_table")
    val iFkC = idx("fk_column"); val iCons = idx("constraint_name")
    require(iTable >= 0 && iCol >= 0,
      s"content result must carry table_name/column_name, got: ${df.columns.mkString(",")}")
    def str(r: org.apache.spark.sql.Row, i: Int): Option[String] =
      if (i < 0 || r.isNullAt(i)) None
      else Option(r.get(i).toString.trim).filter(_.nonEmpty)

    val fkRefs = scala.collection.mutable.Map.empty[String, Map[String, (String, String)]]
    val pk = scala.collection.mutable.Map.empty[String, String]
    df.collect().foreach { r =>
      val table = str(r, iTable).map(_.toUpperCase).getOrElse("")
      if (table.nonEmpty) {
        fkRefs.getOrElseUpdate(table, Map.empty)
        val column = str(r, iCol).map(_.toUpperCase).getOrElse("")
        str(r, iFkT).foreach { fkTable =>
          val cons = str(r, iCons).getOrElse("").toUpperCase
          fkRefs(table) = fkRefs(table) + (column -> (fkTable.toUpperCase, cons))
        }
        if (str(r, iKey).contains("PK") && !pk.contains(table))
          pk(table) = column
      }
    }
    CatalogInfo(fkRefs.toMap, pk.toMap)
  }

  /** The same FK/PK maps from LIVE JDBC driver metadata
    * (DatabaseMetaData.getImportedKeys / getPrimaryKeys) — the portable
    * route for engines whose dialect has no template here (Derby, H2),
    * and the verification path for the templates' declared shape. */
  def fromJdbcMetadata(url: String, schema: Option[String] = None): CatalogInfo = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val md = conn.getMetaData
      val tables = scala.collection.mutable.Buffer.empty[String]
      val rs = md.getTables(null, schema.orNull, "%", Array("TABLE"))
      while (rs.next()) tables += rs.getString("TABLE_NAME")
      rs.close()

      val fkRefs = tables.map { t =>
        val fks = scala.collection.mutable.Map.empty[String, (String, String)]
        val frs = md.getImportedKeys(null, schema.orNull, t)
        while (frs.next()) {
          fks(frs.getString("FKCOLUMN_NAME").toUpperCase) =
            (frs.getString("PKTABLE_NAME").toUpperCase,
              Option(frs.getString("FK_NAME")).getOrElse("").toUpperCase)
        }
        frs.close()
        t.toUpperCase -> fks.toMap
      }.toMap

      val pk = tables.flatMap { t =>
        val prs = md.getPrimaryKeys(null, schema.orNull, t)
        val first = if (prs.next()) Some(t.toUpperCase -> prs.getString("COLUMN_NAME").toUpperCase)
        else None
        prs.close()
        first
      }.toMap
      CatalogInfo(fkRefs, pk)
    } finally conn.close()
  }
}
