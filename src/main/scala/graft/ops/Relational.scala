package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's client-side dataflow operators re-expressed as
  * declarative Spark transforms (SURVEY.md §2.4). Each is a lazy plan
  * fragment: Catalyst handles pushdown/pruning, and the join-shaped ops
  * pick broadcast vs shuffle automatically (small PK sides broadcast).
  *
  * Reference citations: rene-bakker-it/lwetl at /root/reference.
  */
object Relational {

  /** Uppercase column-name normalization — the reference's default
    * (`lwetl/jdbc.py:105-107`, `lwetl/uploader.py:203-213`). */
  def upperCaseColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toUpperCase): _*)

  /** `max_rows` client cutoff (`lwetl/jdbc.py:634-636`). */
  def limitRows(df: DataFrame, n: Int): DataFrame = df.limit(n)

  /** Cardinality profile of one column. Mirrors the SQL emitted by the
    * table-cardinality app (`lwetl/programs/table_cardinality/main.py:40-42`):
    * non-null values occurring more than once, most frequent first.
    * Distributed shape: partial/final hash aggregation, no extra shuffle
    * beyond the groupBy. */
  def profileCardinality(df: DataFrame, c: String): DataFrame =
    df.filter(col(c).isNotNull)
      .groupBy(col(c))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .orderBy(col("cnt").desc, col(c))

  /** md5 over ';'-joined non-null row values
    * (`examples/calc_md5.py:14-21`). `concat_ws` skips NULLs exactly like
    * the reference's `[v for v in row if v is not None]`. */
  def rowChecksum(df: DataFrame, cols: Seq[String], out: String = "row_md5"): DataFrame =
    df.withColumn(out, md5(concat_ws(";", cols.map(c => col(c).cast("string")): _*)))

  /** New-rows detection: source rows whose PK is absent from the target —
    * the db-copy insert path (`lwetl/programs/db_copy/main.py:260-268,296-316`).
    * The reference loads the full target PK set into client memory; here the
    * PK projection broadcasts when small, else a shuffled anti-join. */
  def newRows(src: DataFrame, trg: DataFrame, pk: String): DataFrame =
    src.join(trg.select(pk), Seq(pk), "left_anti")

  /** Rows already present in the target — the db-copy update path
    * (`lwetl/programs/db_copy/main.py:296-316`). */
  def existingRows(src: DataFrame, trg: DataFrame, pk: String): DataFrame =
    src.join(trg.select(pk), Seq(pk), "left_semi")

  /** Set-difference delete (db-copy `sync` mode,
    * `lwetl/programs/db_copy/main.py:362-391`): target PKs absent from
    * the source. */
  def orphans(src: DataFrame, trg: DataFrame, pk: String): DataFrame =
    trg.join(src.select(pk), Seq(pk), "left_anti")

  /** Full upsert plan (db-copy mode=update): (toInsert, toUpdate). */
  def upsertPlan(src: DataFrame, trg: DataFrame, pk: String): (DataFrame, DataFrame) =
    (newRows(src, trg, pk), existingRows(src, trg, pk))
}
