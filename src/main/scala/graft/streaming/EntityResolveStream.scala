package graft.streaming

import graft.dedup.{EntityResolve, Fuzzy}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured-Streaming front end for incremental fuzzy entity
  * resolution — the CDC shape of [[EntityResolve.resolveBatch]]: each
  * micro-batch of records is resolved against the standing registry,
  * matched records emit their assignment, and fresh component
  * representatives JOIN the registry for every later batch.
  *
  * Why `foreachBatch`: the verdict is a blocked join + a component
  * pass over proven batch code ([[ScdStream]]'s rationale — not a
  * bounded-state keyed-stream operator).
  *
  * State shape (the 100 TB contract): the registry is APPEND-ONLY —
  * entities are never rewritten — so each batch lands its new
  * entities in `new/b<id>` and, crucially, their PRE-COMPUTED
  * blocking keys in `keys/b<id>` ([[Fuzzy.entityKeys]]): the probe
  * side reads the accumulated key artifact and the registry's strings
  * are NEVER re-keyed or re-shuffled, no matter how many batches have
  * run. Assignments append to `assign/b<id>`. Per-batch cost is
  * ∝ batch (+ the broadcast-scale key probe), never ∝ registry
  * history.
  *
  * Idempotence: every write lands in the batch's own subdirectory
  * with overwrite mode, and in-batch reads EXCLUDE ids >= the
  * in-flight batch, so an at-least-once replay rewrites the same
  * files. `assign/b<id>` is written LAST as the batch's completion
  * marker: [[registry]]/[[assignments]] cap their listing at the
  * newest assign id, so a crash between the `new` and `assign`
  * writes cannot surface a half-applied batch (the
  * [[ScdStream.dimension]] discipline).
  *
  * Record ids must be unique across batches (they become entity ids);
  * seed a pre-existing registry as `new/b-1` + `keys/b-1` (no assign
  * marker needed — the seed is always visible).
  */
object EntityResolveStream {

  /** Starts the stream. `records` must be a STREAMING DataFrame
    * carrying `idCol` + `strCol`. `autoCompactEvery = N` runs
    * [[compact]] after every Nth completed batch
    * ([[StreamState.maybeAutoCompact]] — 0 keeps compaction an
    * explicit maintenance call). */
  def start(records: DataFrame, idCol: String, strCol: String,
            maxDist: Int, stateDir: String,
            checkpointLocation: Option[String] = None,
            autoCompactEvery: Int = 0): StreamingQuery = {
    val writer = records.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, strCol, maxDist, stateDir)
        StreamState.maybeAutoCompact(autoCompactEvery, batchId)(
          compact(batch.sparkSession, stateDir))
      }
    checkpointLocation.fold(writer)(writer.option("checkpointLocation", _))
      .start()
  }

  /** One trigger: resolve the batch against the accumulated key
    * artifact, append assignments + fresh entities + fresh keys.
    * Package-private so the spec can drive replay directly. */
  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
                                      idCol: String, strCol: String,
                                      maxDist: Int,
                                      stateDir: String): Unit = {
    val spark = batch.sparkSession
    val emptyMaster = batch.select(col(idCol).as("_eid"), col(strCol))
      .limit(0)
    val keys = readAll(spark, s"$stateDir/keys", batchId)
      .getOrElse(Fuzzy.entityKeys(emptyMaster, "_eid", strCol, maxDist)
        .limit(0))
    // resolveBatch returns an already-materialized stage-cut frame —
    // re-persisting would double-cache its blocks
    val resolved = EntityResolve.resolveBatch(batch, emptyMaster,
        idCol, strCol, "_eid", strCol, maxDist,
        masterKeys = Some(keys))
    val fresh = EntityResolve.newEntities(batch, resolved, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    fresh.write.mode("overwrite").parquet(s"$stateDir/new/b$batchId")
    Fuzzy.entityKeys(fresh.select(col(idCol).as("_eid"), col(strCol)),
        "_eid", strCol, maxDist)
      .write.mode("overwrite").parquet(s"$stateDir/keys/b$batchId")
    // completion marker LAST
    resolved.write.mode("overwrite").parquet(s"$stateDir/assign/b$batchId")
    graft.ops.StageCut.release(resolved); fresh.unpersist()
  }

  /** Every canonical entity as of the last COMPLETED batch (plus the
    * seed): `new/b*` capped at the newest assign marker. */
  def registry(spark: SparkSession, stateDir: String): DataFrame = {
    val cap = StreamState.latestBatchId(spark, s"$stateDir/assign")
      .getOrElse(-1L)
    val parts = StreamState.read(spark, s"$stateDir/new", cap + 1)
    require(parts.nonEmpty, s"no entity-resolution state under $stateDir")
    parts.get
  }

  /** Every record→entity assignment of the completed batches. */
  def assignments(spark: SparkSession, stateDir: String): DataFrame = {
    val cap = StreamState.latestBatchId(spark, s"$stateDir/assign")
      .getOrElse(Long.MinValue)
    val parts = StreamState.read(spark, s"$stateDir/assign", cap + 1)
    require(parts.nonEmpty, s"no assignments under $stateDir")
    parts.get
  }

  /** Fold completed per-batch state dirs into one snapshot per
    * subdirectory ([[StreamState.compactDir]]'s crash contract) —
    * run periodically so a year of daily batches reads as one parquet
    * dir + the recent tail. Caps STRICTLY below the newest assign
    * marker: the newest completed batch stays a `b` dir, because an
    * in-flight replay of that id must still be able to exclude its own
    * writes by id. */
  def compact(spark: SparkSession, stateDir: String): Unit =
    StreamState.latestBatchId(spark, s"$stateDir/assign").foreach { cap =>
      Seq("new", "keys", "assign").foreach(sub =>
        StreamState.compactDir(spark, s"$stateDir/$sub", cap))
    }

  private def readAll(spark: SparkSession, dir: String,
                      beforeBatch: Long): Option[DataFrame] =
    StreamState.read(spark, dir, beforeBatch)
}
