package graft.io

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SQL DML text generation — the reference's "write path" re-expressed as
  * distributed string rendering (SURVEY.md §2.2 SqlFormatter, §2.3
  * NativeUploader). Every statement is built from codegen'd `Column`
  * expressions, so a 100 TB INSERT dump renders in parallel across
  * executors and streams straight to a text sink — nothing is collected.
  *
  * Literal rules follow `lwetl/uploader.py:309-392`:
  *   - numbers render bare; integral floats normalize to int form
  *     (`lwetl/jdbc.py:250-253`: 10000.0 → "10000")
  *   - strings quote with '' doubling (`lwetl/uploader.py:337`)
  *   - timestamps render "'yyyy-MM-dd HH:mm:ss.SSS000'", oracle as
  *     TO_TIMESTAMP(...,'YYYY-MM-DD HH24:MI:SS.FF3')
  *     (`lwetl/uploader.py:367-392`, DEFAULT_TIME_FORMAT_MS `:27-29`)
  *   - empty strings count as absent — NULL semantics
  *     (`lwetl/utils.py:17-23`, `lwetl/uploader.py:329`)
  */
object SqlRender {

  sealed trait Dialect { def name: String }
  case object Ansi extends Dialect { val name = "ansi" }
  case object Oracle extends Dialect { val name = "oracle" }
  case object MySql extends Dialect { val name = "mysql" }
  case object SqlServer extends Dialect { val name = "sqlserver" }
  case object Postgres extends Dialect { val name = "postgresql" }
  case object Sqlite extends Dialect { val name = "sqlite" }

  def dialect(name: String): Dialect = name.toLowerCase match {
    case "oracle" => Oracle
    case "mysql" => MySql
    case "sqlserver" | "mssql" => SqlServer
    case "postgresql" | "postgres" => Postgres
    case "sqlite" => Sqlite
    case _ => Ansi
  }

  /** Identifier escaping per dialect (`lwetl/uploader.py:240-251`):
    * mysql backticks, sqlserver brackets, oracle double quotes; others
    * pass through. Applied only when `escape` is on, like the
    * reference's `always_escape` config flag. */
  def escapeIdent(name: String, d: Dialect, escape: Boolean): String =
    if (!escape) name
    else d match {
      case MySql => s"`$name`"
      case SqlServer => s"[$name]"
      case Oracle | Postgres => "\"" + name + "\""
      case _ => name
    }

  /** One value rendered as a SQL literal string expression (NULL when the
    * value is NULL or an empty/blank string). */
  def literal(c: Column, dt: DataType, d: Dialect): Column = dt match {
    case _: IntegerType | _: LongType | _: ShortType | _: ByteType |
         _: DecimalType =>
      c.cast("string")
    case _: DoubleType | _: FloatType =>
      // integral normalization: 10000.0 renders as "10000". try_cast, not
      // cast: under Spark 4's ANSI mode a plain cast THROWS at render time
      // for NaN/Infinity/out-of-long-range doubles — those fall through to
      // the plain string form instead of failing the whole render.
      val asLong = c.cast("double").try_cast("long")
      when(asLong.isNotNull && asLong.cast("double") === c.cast("double"),
        asLong.cast("string"))
        .otherwise(c.cast("string"))
    case _: TimestampType | _: TimestampNTZType | _: DateType =>
      val ts = date_format(c.cast("timestamp"), "yyyy-MM-dd HH:mm:ss.SSS")
      d match {
        case Oracle => concat(lit("TO_TIMESTAMP('"), ts,
          lit("','YYYY-MM-DD HH24:MI:SS.FF3')"))
        case _ => concat(lit("'"), ts, lit("000'"))
      }
    case _: BooleanType =>
      when(c, lit("'true'")).otherwise(lit("'false'"))
    case _: BinaryType =>
      // binary payloads are not representable as portable SQL literals;
      // the reference suppresses them in text outputs (formatter.py:181)
      lit(null).cast("string")
    case _ =>
      concat(lit("'"), regexp_replace(c.cast("string"), "'", "''"), lit("'"))
  }

  /** Is this value "empty" in the reference's sense (`is_empty`):
    * NULL, or a blank string. Empty values are dropped from INSERTs and
    * become IS NULL in where clauses. */
  private def isEmptyVal(c: Column, dt: DataType): Column = dt match {
    case _: StringType => c.isNull || trim(c) === ""
    case _ => c.isNull
  }

  /** Dialect-rendered `INSERT INTO t (cols) VALUES (...)` per row, with
    * per-row dropping of empty columns (NativeUploader semantics:
    * `lwetl/uploader.py:394-410,329`). Returns a single-column frame
    * ("stmt") — pipe it to a text sink or any downstream. */
  def insertStatements(df: DataFrame, table: String, d: Dialect = Ansi,
                       escape: Boolean = false,
                       upperCaseNames: Boolean = true,
                       rawValues: Map[String, String] = Map.empty): DataFrame = {
    val fields = df.schema.fields
    val rendered = fields.map { f =>
      val name = if (upperCaseNames) f.name.toUpperCase else f.name
      val keep = !isEmptyVal(col(f.name), f.dataType)
      val litv = literal(col(f.name), f.dataType, d)
      struct(
        when(keep && litv.isNotNull, lit(escapeIdent(name, d, escape)))
          .otherwise(lit(null).cast("string")).as("n"),
        when(keep, litv).otherwise(lit(null).cast("string")).as("v"))
    } ++ rawValues.map { case (name, fragment) =>
      // NativeExpression passthrough (`lwetl/uploader.py:64-70`): a raw
      // SQL fragment — DEFAULT, SEQ.NEXTVAL, SYSDATE — emitted verbatim
      struct(lit(escapeIdent(
        if (upperCaseNames) name.toUpperCase else name, d, escape)).as("n"),
        lit(fragment).as("v"))
    }
    val pairs = filter(array(rendered.toIndexedSeq: _*), p => p.getField("n").isNotNull)
    df.select(
      concat(
        lit(s"INSERT INTO $table ("),
        concat_ws(",", transform(pairs, _.getField("n"))),
        lit(") VALUES ("),
        concat_ws(",", transform(pairs, _.getField("v"))),
        lit(")")).as("stmt"))
  }

  // ------------------------------------------------------ WHERE mini-DSL

  /** One where-DSL entry (`lwetl/uploader.py:215-238`): a raw value
    * (⇒ `=`), a `"<op> value"` string, or an (op, value) pair; empty ⇒
    * IS NULL. Multiple entries AND together. */
  sealed trait WhereVal
  case class Raw(v: Any) extends WhereVal
  case class OpVal(op: String, v: Any) extends WhereVal

  val Operators: Set[String] = Set("=", "<", ">", "<=", ">=", "<>", "IS", "LIKE", "IN")

  /** Parse the string form: first token an operator ⇒ (op, rest);
    * otherwise the whole string is an equality value. The value text is
    * parsed into a TYPED value (quoted string → String with '' undoubled,
    * numeric → number, NULL → null) so downstream rendering never
    * double-quotes an already-quoted literal. */
  def parseWhereString(s: String): OpVal = {
    val parts = s.trim.split("\\s+", 2)
    if (parts.length == 2 && Operators.contains(parts(0).toUpperCase)) {
      val op = parts(0).toUpperCase
      // IS keeps its keyword argument verbatim (NULL / NOT NULL) — it is
      // never a literal value
      if (op == "IS") OpVal(op, parts(1).trim.toUpperCase)
      else OpVal(op, parseWhereValue(parts(1)))
    } else OpVal("=", parseWhereValue(s.trim))
  }

  /** The textual value of a string-form where entry → typed value. */
  def parseWhereValue(raw: String): Any = {
    val t = raw.trim
    if (t.equalsIgnoreCase("NULL")) null
    else if (t.length >= 2 && t.head == '\'' && t.last == '\'')
      t.substring(1, t.length - 1).replace("''", "'")
    else
      scala.util.Try(BigDecimal(t)).toOption match {
        case Some(bd) if bd.isValidLong => bd.longValue
        case Some(bd) => bd.doubleValue
        case None => t
      }
  }

  private def isNotNullArg(v: Any): Boolean =
    v != null && v.toString.trim.equalsIgnoreCase("NOT NULL")

  private def sqlLit(v: Any): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("'", "''") + "'"
    case b: Boolean => s"'$b'"
    case other => other.toString
  }

  /** where-DSL → SQL text (for emitted DML). */
  def whereToSql(conds: Seq[(String, WhereVal)]): String = {
    if (conds.isEmpty) return ""
    val parts = conds.map { case (c, wv) =>
      wv match {
        case Raw(null) => s"$c IS NULL"
        case Raw("") => s"$c IS NULL"
        case Raw(v) => s"$c = ${sqlLit(v)}"
        // IS takes the keyword NULL / NOT NULL, never a quoted literal
        case OpVal("IS", v) =>
          if (isNotNullArg(v)) s"$c IS NOT NULL" else s"$c IS NULL"
        case OpVal(op, v) => s"$c $op ${sqlLit(v)}"
      }
    }
    "WHERE " + parts.mkString(" AND ")
  }

  /** where-DSL → Catalyst predicate (for filtering DataFrames — the
    * file-target equivalent of the reference's UPDATE/DELETE path). */
  def whereToColumn(conds: Seq[(String, WhereVal)]): Column =
    conds.map { case (c, wv) =>
      wv match {
        case Raw(null) | Raw("") => col(c).isNull
        case Raw(v) => col(c) === lit(v)
        case OpVal("IS", v) =>
          if (isNotNullArg(v)) col(c).isNotNull else col(c).isNull
        case OpVal("LIKE", v) => col(c).like(v.toString)
        case OpVal("IN", v: Seq[_]) => col(c).isin(v.map(x => x): _*)
        case OpVal("=", v) => col(c) === lit(v)
        case OpVal("<", v) => col(c) < lit(v)
        case OpVal(">", v) => col(c) > lit(v)
        case OpVal("<=", v) => col(c) <= lit(v)
        case OpVal(">=", v) => col(c) >= lit(v)
        case OpVal("<>", v) => col(c) =!= lit(v)
        case OpVal(op, _) => throw new IllegalArgumentException(s"bad operator: $op")
      }
    }.reduce(_ && _)

  /** UPDATE statements, one per row of `df`: SET all non-key non-empty
    * columns, WHERE on the key columns (ParameterUploader.update shape,
    * `lwetl/uploader.py:412-435` rendered natively). */
  def updateStatements(df: DataFrame, table: String, keyCols: Seq[String],
                       d: Dialect = Ansi, escape: Boolean = false): DataFrame = {
    val fields = df.schema.fields
    val setFields = fields.filterNot(f => keyCols.contains(f.name))
    val sets = setFields.map { f =>
      val name = escapeIdent(f.name.toUpperCase, d, escape)
      val litv = literal(col(f.name), f.dataType, d)
      when(!isEmptyVal(col(f.name), f.dataType) && litv.isNotNull,
        concat(lit(s"$name = "), litv))
        .otherwise(concat(lit(s"$name = NULL")))
    }
    val wheres = keyCols.map { k =>
      val f = df.schema(k)
      val name = escapeIdent(k.toUpperCase, d, escape)
      when(isEmptyVal(col(k), f.dataType), lit(s"$name IS NULL"))
        .otherwise(concat(lit(s"$name = "), literal(col(k), f.dataType, d)))
    }
    df.select(concat(
      lit(s"UPDATE $table SET "),
      concat_ws(", ", sets.toIndexedSeq: _*),
      lit(" WHERE "),
      concat_ws(" AND ", wheres.toIndexedSeq: _*)).as("stmt"))
  }

  /** DELETE statements keyed by the given columns, one per row. */
  def deleteStatements(df: DataFrame, table: String, keyCols: Seq[String],
                       d: Dialect = Ansi, escape: Boolean = false): DataFrame = {
    val wheres = keyCols.map { k =>
      val f = df.schema(k)
      val name = escapeIdent(k.toUpperCase, d, escape)
      when(isEmptyVal(col(k), f.dataType), lit(s"$name IS NULL"))
        .otherwise(concat(lit(s"$name = "), literal(col(k), f.dataType, d)))
    }
    df.select(concat(
      lit(s"DELETE FROM $table WHERE "),
      concat_ws(" AND ", wheres.toIndexedSeq: _*)).as("stmt"))
  }
}
