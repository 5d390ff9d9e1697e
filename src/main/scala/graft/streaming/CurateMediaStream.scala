package graft.streaming

import graft.apps.Curate
import graft.dedup.SimilarityMethod
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** [[CurateStream]]'s MEDIA sibling: each micro-batch of binary image
  * (or, with [[SimilarityMethod.AudioHash]], audio) payloads is curated against the standing accepted corpus with
  * [[Curate.runIncrementalMedia]] and only acceptances (plus the
  * byte-fingerprint and dHash signature artifacts) append to the state
  * directory. Same foreachBatch rationale, per-batch `b<id>`
  * idempotence and [[StreamState]] registry discipline as the text
  * stream.
  *
  * State shape: `corpus/` (accepted rows), `fps/`
  * ([[Curate.mediaFingerprints]] — byte-exact stage) and `sigs/`
  * ([[graft.dedup.Dedup.dhashSignatures]] — the near stage probes the
  * stored signatures, so a trigger decodes ONLY its own batch's
  * images, never the corpus). Growth bounded by acceptances. */
object CurateMediaStream {

  /** Starts the stream over a STREAMING frame of `(idCol, payloadCol)`
    * rows. `keepLedger` writes
    * [[Curate.runIncrementalMediaTracked]]'s drop audit to per-batch
    * `ledger/b<id>` subdirs (audit output — never read back, never
    * compacted); `autoCompactEvery` as on [[CurateStream]].
    * `byteBudget` caps the standing corpus' cumulative PAYLOAD BYTES
    * — the media twin of the text stream's `tokenBudget`, on the same
    * [[SpendBudget]] replay-exactly-once spend registry; each trigger
    * admits its byte-richest acceptance prefix into the remaining
    * headroom, rejects ledger as `(quota, byte_budget)`. */
  def start(media: DataFrame, idCol: String, payloadCol: String,
            stateDir: String,
            method: SimilarityMethod.PerceptualHash = SimilarityMethod.ImageDHash(),
            checkpointLocation: Option[String] = None,
            onBatch: (Long, Curate.MediaReport) => Unit = (_, _) => (),
            autoCompactEvery: Int = 0,
            keepLedger: Boolean = false,
            byteBudget: Long = Long.MaxValue): StreamingQuery = {
    if (byteBudget != Long.MaxValue)
      SpendBudget.requireIntegralId(media, idCol, "byteBudget")
    val writer = media.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, payloadCol, stateDir, method,
          onBatch, keepLedger, byteBudget)
        StreamState.maybeAutoCompact(autoCompactEvery, batchId)(
          compact(batch.sparkSession, stateDir))
      }
    checkpointLocation.fold(writer)(writer.option("checkpointLocation", _))
      .start()
  }

  /** One trigger — package-private so specs drive replay directly. */
  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
                                      idCol: String, payloadCol: String,
                                      stateDir: String,
                                      method: SimilarityMethod.PerceptualHash,
                                      onBatch: (Long, Curate.MediaReport) => Unit,
                                      keepLedger: Boolean = false,
                                      byteBudget: Long = Long.MaxValue): Unit = {
    val spark = batch.sparkSession
    import org.apache.spark.sql.functions._
    // id-excluded state read: a replayed batch must not see its own
    // partial previous write as standing corpus (CurateStream contract)
    val corpus = StreamState.read(spark, s"$stateDir/corpus", batchId)
      .getOrElse(batch.limit(0))
    val fps = StreamState.read(spark, s"$stateDir/fps", batchId)
    val sigs = StreamState.read(spark, s"$stateDir/sigs", batchId)
    val (accepted0, report, ledger0) =
      if (keepLedger) {
        val (a, r, l) = Curate.runIncrementalMediaTracked(batch, corpus,
          idCol, payloadCol, method, corpusFps = fps, corpusSigs = sigs,
          log = _ => ())
        (a, r, Some(l))
      } else {
        val (a, r) = Curate.runIncrementalMedia(batch, corpus, idCol,
          payloadCol, method, corpusFps = fps, corpusSigs = sigs,
          log = _ => ())
        (a, r, None)
      }
    // byte-budget admission: the CurateStream token-budget block with
    // payload bytes as the measure (SpendBudget holds the shared
    // registry/headroom/drop mechanics)
    val (accepted, ledger, spendNow, cutRoot) =
      if (byteBudget == Long.MaxValue) (accepted0, ledger0, -1L, accepted0)
      else {
        val headroom =
          byteBudget - SpendBudget.spent(spark, stateDir, batchId)
        val (adm, now, root) = SpendBudget.admit(accepted0, idCol,
          octet_length(col(payloadCol)), headroom)
        val withDrops = ledger0.map(_.unionByName(SpendBudget.drops(
          accepted0, adm, idCol, "byte_budget",
          batch.schema(idCol).dataType)))
        (adm, withDrops, now, root)
      }
    ledger.foreach { l =>
      l.write.mode("overwrite").parquet(s"$stateDir/ledger/b$batchId")
      graft.ops.StageCut.release(l)
    }
    if (!(accepted eq accepted0)) {
      graft.ops.StageCut.release(accepted0)
      ledger0.foreach(l0 =>
        if (!ledger.exists(_ eq l0)) graft.ops.StageCut.release(l0))
    }
    accepted.write.mode("overwrite").parquet(s"$stateDir/corpus/b$batchId")
    Curate.mediaFingerprints(accepted, payloadCol)
      .write.mode("overwrite").parquet(s"$stateDir/fps/b$batchId")
    (method match {
      case _: SimilarityMethod.ImageDHash =>
        graft.dedup.Dedup.dhashSignatures(accepted, idCol, payloadCol)
      case _: SimilarityMethod.AudioHash =>
        graft.dedup.Dedup.audioSignatures(accepted, idCol, payloadCol)
    }).write.mode("overwrite").parquet(s"$stateDir/sigs/b$batchId")
    if (byteBudget != Long.MaxValue)
      SpendBudget.record(spark, stateDir, batchId, spendNow)
    graft.ops.StageCut.release(cutRoot)
    onBatch(batchId, report)
  }

  /** Fold completed per-batch dirs — [[CurateStream.compact]]'s
    * contract (caps strictly below the newest corpus batch id). The
    * `spend/` registry compacts with the rest (readers SUM rows). */
  def compact(spark: SparkSession, stateDir: String): Unit =
    StreamState.latestBatchId(spark, s"$stateDir/corpus").foreach { cap =>
      Seq("corpus", "fps", "sigs", "spend").foreach(sub =>
        StreamState.compactDir(spark, s"$stateDir/$sub", cap))
    }
}
