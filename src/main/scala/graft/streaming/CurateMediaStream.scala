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
    * compacted); `autoCompactEvery` as on [[CurateStream]]. */
  def start(media: DataFrame, idCol: String, payloadCol: String,
            stateDir: String,
            method: SimilarityMethod.PerceptualHash = SimilarityMethod.ImageDHash(),
            checkpointLocation: Option[String] = None,
            onBatch: (Long, Curate.MediaReport) => Unit = (_, _) => (),
            autoCompactEvery: Int = 0,
            keepLedger: Boolean = false): StreamingQuery = {
    val writer = media.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, payloadCol, stateDir, method,
          onBatch, keepLedger)
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
                                      keepLedger: Boolean = false): Unit = {
    val spark = batch.sparkSession
    // id-excluded state read: a replayed batch must not see its own
    // partial previous write as standing corpus (CurateStream contract)
    val corpus = StreamState.read(spark, s"$stateDir/corpus", batchId)
      .getOrElse(batch.limit(0))
    val fps = StreamState.read(spark, s"$stateDir/fps", batchId)
    val sigs = StreamState.read(spark, s"$stateDir/sigs", batchId)
    val (accepted, report) =
      if (keepLedger) {
        val (a, r, l) = Curate.runIncrementalMediaTracked(batch, corpus,
          idCol, payloadCol, method, corpusFps = fps, corpusSigs = sigs,
          log = _ => ())
        l.write.mode("overwrite").parquet(s"$stateDir/ledger/b$batchId")
        graft.ops.StageCut.release(l)
        (a, r)
      } else Curate.runIncrementalMedia(batch, corpus, idCol, payloadCol,
        method, corpusFps = fps, corpusSigs = sigs, log = _ => ())
    accepted.write.mode("overwrite").parquet(s"$stateDir/corpus/b$batchId")
    Curate.mediaFingerprints(accepted, payloadCol)
      .write.mode("overwrite").parquet(s"$stateDir/fps/b$batchId")
    (method match {
      case _: SimilarityMethod.ImageDHash =>
        graft.dedup.Dedup.dhashSignatures(accepted, idCol, payloadCol)
      case _: SimilarityMethod.AudioHash =>
        graft.dedup.Dedup.audioSignatures(accepted, idCol, payloadCol)
    }).write.mode("overwrite").parquet(s"$stateDir/sigs/b$batchId")
    graft.ops.StageCut.release(accepted)
    onBatch(batchId, report)
  }

  /** Fold completed per-batch dirs — [[CurateStream.compact]]'s
    * contract (caps strictly below the newest corpus batch id). */
  def compact(spark: SparkSession, stateDir: String): Unit =
    StreamState.latestBatchId(spark, s"$stateDir/corpus").foreach { cap =>
      Seq("corpus", "fps", "sigs").foreach(sub =>
        StreamState.compactDir(spark, s"$stateDir/$sub", cap))
    }
}
