package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's value-coercion semantics (SURVEY.md §1.2) as pure
  * `Column` transforms — all codegen-friendly built-ins, no UDFs.
  *
  * Reference citations: rene-bakker-it/lwetl at /root/reference.
  */
object Coercion {

  /** empty string ≡ NULL (`lwetl/utils.py:17-23`) — pervasive in the
    * reference's filters and uploaders (`lwetl/uploader.py:329,491`).
    * Off by default in SQL paths; applied explicitly where lwetl-parity
    * semantics are wanted. */
  def emptyStringAsNull(c: Column): Column =
    when(trim(c) === "", lit(null).cast("string")).otherwise(c)

  /** Bool-ish string truth set of the cast-DSL
    * (`lwetl/jdbc.py:332-334`). */
  val TrueStrings: Seq[String] = Seq("true", "1", "yes", "si", "y", "s")

  def boolish(c: Column): Column =
    when(c.isNull, lit(null).cast("boolean"))
      .otherwise(lower(trim(c.cast("string"))).isin(TrueStrings: _*))

  /** Minimal Python-strptime → java.time pattern translation for the
    * cast-DSL's date formats (`lwetl/jdbc.py:336-344`). */
  def strptimeToJava(fmt: String): String =
    fmt.replace("%Y", "yyyy").replace("%y", "yy")
      .replace("%m", "MM").replace("%d", "dd")
      .replace("%H", "HH").replace("%M", "mm").replace("%S", "ss")
      .replace("%f", "SSSSSS")

  /** One cast-DSL spec applied to one column
    * (`lwetl/jdbc.py:328-355`): 'str'|'int'|'bool'|'float'|'date'|
    * <strptime fmt>|'any' (passthrough). */
  def castSpec(c: Column, spec: String): Column = spec match {
    case "any"   => c
    case "str"   => c.cast("string")
    case "int"   => c.cast("long")
    case "float" => c.cast("double")
    case "bool"  => boolish(c)
    case "date"  => c.cast("timestamp")
    case fmt     => to_timestamp(c.cast("string"), strptimeToJava(fmt))
  }

  /** Positional cast-DSL over a whole frame. A single spec projects the
    * first column only — the reference's scalar-row mode
    * (`lwetl/jdbc.py:345-349`). */
  def applyCastSpecs(df: DataFrame, specs: Seq[String]): DataFrame =
    if (specs.length == 1)
      df.select(castSpec(col(df.columns.head), specs.head).as(df.columns.head))
    else {
      val cols = df.columns.zipAll(specs, "", "any").collect {
        case (name, spec) if name.nonEmpty => castSpec(col(name), spec).as(name)
      }
      df.select(cols.toIndexedSeq: _*)
    }
}
