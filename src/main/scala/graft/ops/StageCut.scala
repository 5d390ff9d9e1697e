package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Pipeline STAGE BOUNDARY: materialize a stage's frame and cut its
  * lineage (eager `localCheckpoint`). The multi-stage pipelines
  * ([[graft.apps.Curate]], [[graft.apps.PretrainPrep]]) chain 5-9
  * operators, each stage persisted and counted — but persist() alone
  * leaves the LOGICAL plan intact, so every downstream action
  * re-enters Catalyst analysis over the whole composed tree, and that
  * driver-side constant grows superlinearly with plan size. Measured
  * on the q128 gate at sf0.1: 43.7 s with chained persists vs 10.8 s
  * with stage cuts — identical results, all the difference in plan
  * re-analysis, none in data work.
  *
  * The trade: a truncated stage cannot be recomputed from lineage
  * after executor loss (the job fails and the driver retries the
  * run). Every pipeline stage in this engine is deterministic (seeded
  * hashes, min-id winners), so a retry reproduces the identical
  * output; a deployment that prefers lineage-based recovery over
  * analysis time sets `spark.graft.stageCutLineage=false` to revert
  * to plain persist(MEMORY_AND_DISK) — same storage footprint, same
  * results, bigger plans.
  *
  * Cleanup: release stage frames with [[release]] — plain
  * `Dataset.unpersist` only clears CacheManager entries and cannot
  * reach the RDD a cut frame was rebased onto (those blocks would
  * otherwise wait for driver GC via ContextCleaner — fine for a few
  * stages, unbounded for a long training loop). Under the persist
  * fallback, release degrades to a normal unpersist.
  */
object StageCut {

  val ConfKey = "spark.graft.stageCutLineage"

  def apply(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.get(ConfKey, "true").toBoolean)
      df.localCheckpoint(true)
    else df.persist(StorageLevel.MEMORY_AND_DISK)

  /** Deterministically free a frame RETURNED BY [[apply]] (or any
    * eager localCheckpoint). Only a ROOT-level checkpoint RDD is
    * released — the shape apply() returns — so calling this on a
    * frame that merely CONTAINS someone else's cut frame in its plan
    * (a derived frame, or a persist-fallback stage built over a
    * caller's checkpointed input) never frees blocks the caller still
    * needs; those get a normal unpersist. */
  def release(df: DataFrame): Unit = {
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(false)
      case _ => ()
    }
    df.unpersist()
  }
}
