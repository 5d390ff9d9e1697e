package graft.apps

import graft.ops.Relational
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** db-copy re-expressed Spark-first (`lwetl/programs/db_copy/main.py`).
  *
  * The reference walks tables in FK-topological order and streams rows
  * one by one through insert/upsert/delete decisions against a client-
  * side PK set. Here each per-table step is a declarative plan: anti-join
  * for new rows, semi-join for updates, anti-join the other way for
  * orphans — Catalyst broadcasts the PK side when small and AQE handles
  * skew, so the same code runs at 100 TB where the reference's PK set
  * would not fit in any client.
  */
object DbCopy {

  /** Copy modes (`lwetl/programs/db_copy/cmdline.py:19-28`). */
  sealed trait Mode
  case object Insert extends Mode // new rows only
  case object Update extends Mode // upsert
  case object Sync extends Mode   // upsert + delete orphans

  /** FK-topological table order (`db_copy/main.py:30-52,213-224`):
    * tables whose referenced tables are already placed go first;
    * cycles/self-references break by falling back to name order (the
    * reference appends leftovers the same way). */
  def topoOrder(referring: Map[String, Set[String]]): Seq[String] = {
    val all = referring.keySet ++ referring.values.flatten
    val placed = scala.collection.mutable.LinkedHashSet.empty[String]
    var remaining = all.toSeq.sorted
    var progress = true
    while (remaining.nonEmpty && progress) {
      progress = false
      val (ready, blocked) = remaining.partition { t =>
        referring.getOrElse(t, Set.empty).forall(d => d == t || placed.contains(d))
      }
      if (ready.nonEmpty) { placed ++= ready; remaining = blocked; progress = true }
    }
    (placed ++ remaining).toSeq
  }

  /** Table-set reconciliation (`db_copy/main.py:180-210`). */
  case class Reconciliation(common: Seq[String], missingInTarget: Seq[String],
                            noSource: Seq[String], ignored: Seq[String])

  def reconcile(srcTables: Set[String], trgTables: Set[String],
                ignore: Set[String] = Set.empty): Reconciliation =
    Reconciliation(
      common = (srcTables & trgTables -- ignore).toSeq.sorted,
      missingInTarget = (srcTables -- trgTables -- ignore).toSeq.sorted,
      noSource = (trgTables -- srcTables -- ignore).toSeq.sorted,
      ignored = (ignore & (srcTables ++ trgTables)).toSeq.sorted)

  /** The three per-table change sets for one copy step. Any may be
    * empty depending on mode. */
  case class TablePlan(toInsert: DataFrame, toUpdate: Option[DataFrame],
                       toDelete: Option[DataFrame])

  /** Build the per-table plan (`db_copy/main.py:260-316,362-391`). */
  def plan(src: DataFrame, trg: DataFrame, pk: String, mode: Mode): TablePlan =
    mode match {
      case Insert =>
        TablePlan(Relational.newRows(src, trg, pk), None, None)
      case Update =>
        TablePlan(Relational.newRows(src, trg, pk),
          Some(Relational.existingRows(src, trg, pk)), None)
      case Sync =>
        TablePlan(Relational.newRows(src, trg, pk),
          Some(Relational.existingRows(src, trg, pk)),
          Some(Relational.orphans(src, trg, pk)))
    }

  /** `--fast` heuristic (`db_copy/main.py:271-276,300-303`): only rows
    * beyond the target's max PK. Degenerates to a pushed-down range
    * filter — the scan skips whole row groups on a sorted source. */
  def fastNewRows(src: DataFrame, trg: DataFrame, pk: String): DataFrame = {
    val maxRow = trg.agg(max(col(pk))).head()
    if (maxRow.isNullAt(0)) src
    else src.filter(col(pk) > lit(maxRow.get(0)))
  }

  /** Per-table row counts on both sides (`db_copy/main.py:184-190`) —
    * one job per side per table, metadata-only on parquet. */
  def countBoth(src: DataFrame, trg: DataFrame): (Long, Long) =
    (src.count(), trg.count())
}
