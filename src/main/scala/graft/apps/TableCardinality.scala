package graft.apps

import graft.ops.Relational
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** table-cardinality app (`lwetl/programs/table_cardinality/main.py`):
  * per-column duplicate-value profile + a summary, exported as a
  * multi-sheet workbook (sheet per column + summary) just like the
  * reference's XLSX report.
  *
  * Scale shape: one hash-aggregation per column (partial/final, one
  * shuffle each); the summary's distinct counts use approx_count_distinct
  * by default — exact countDistinct forces an extra expand+shuffle per
  * column, which is the wrong default at 100 TB. The reference's exact
  * semantics are available via `exact = true`.
  */
object TableCardinality {

  /** Summary row per column: non-null count, distinct count.
    *
    * ONE pass over the table: all `count(c)` + distinct-count pairs go
    * into a single `agg(...)` (one scan, one reduction), then the 1-row
    * result is unpivoted to a row per column. The previous shape — one
    * full-table agg job per column, unioned — scanned the table N times. */
  def summary(df: DataFrame, exact: Boolean = false): DataFrame = {
    val aggs = df.columns.flatMap { c =>
      val distinctAgg =
        if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
      Seq(count(col(c)).as(s"__nn_$c"), distinctAgg.as(s"__nd_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*)
    val rows = df.columns.map { c =>
      struct(lit(c).as("column"), col(s"__nn_$c").as("n_nonnull"),
        col(s"__nd_$c").as("n_distinct"))
    }
    one.select(explode(array(rows.toIndexedSeq: _*)).as("r")).select("r.*")
  }

  /** The per-column profile sheets (column value, count desc) — the
    * reference's `SELECT c, COUNT(*) ... HAVING COUNT(*)>1` per column. */
  def profiles(df: DataFrame): Seq[(String, DataFrame)] =
    df.columns.toSeq.map(c => c -> Relational.profileCardinality(df, c))

  /** Full report to one xlsx workbook: Summary sheet + one sheet per
    * column with duplicated values. The reference writes this workbook
    * with `pretty=True` (`table_cardinality/main.py:44`) — header
    * styling + column widths. */
  def report(df: DataFrame, path: String, exact: Boolean = false): Unit = {
    val sheets = ("Summary" -> summary(df, exact)) +:
      profiles(df).map { case (c, p) => c.take(31) -> p } // xlsx name cap
    graft.io.Xlsx.write(sheets, path, pretty = true)
  }
}
