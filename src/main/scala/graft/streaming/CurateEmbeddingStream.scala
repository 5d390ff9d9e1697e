package graft.streaming

import graft.apps.Curate
import graft.dedup.SimilarityMethod
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** [[CurateStream]]'s EMBEDDING sibling: each micro-batch of vectors
  * is curated against the standing accepted corpus with
  * [[Curate.runIncrementalEmbedding]] and only acceptances (plus the
  * vector-fingerprint artifact) append to the state directory. Same
  * foreachBatch rationale, same per-batch `b<id>` idempotence, same
  * [[StreamState]] registry/compaction discipline as the text stream.
  *
  * State shape: `corpus/` (accepted vector rows) and `fps/`
  * ([[Curate.embeddingFingerprints]] — the exact stage probes the
  * union of these instead of re-fingerprinting corpus vectors).
  * The near stage's cell index trains on the corpus per trigger
  * (bounded by acceptances, one tiny k-means on collected centroid
  * stats); pass a pre-trained `method.index` to pin it. Growth is
  * bounded by ACCEPTANCES — a rejected vector leaves zero state. */
object CurateEmbeddingStream {

  /** Starts the stream over a STREAMING frame of `(idCol, embCol)`
    * rows. `keepLedger` writes
    * [[Curate.runIncrementalEmbeddingTracked]]'s drop audit to
    * per-batch `ledger/b<id>` subdirs (audit output — never read back,
    * never compacted); `autoCompactEvery` as on [[CurateStream]].
    * `vecBudget` caps the standing corpus' cumulative VECTOR COUNT —
    * the embedding twin of the text stream's `tokenBudget`, on the
    * same [[SpendBudget]] replay-exactly-once spend registry; each
    * trigger admits its id-ascending acceptance prefix into the
    * remaining headroom, rejects ledger as `(quota, vec_budget)`. */
  def start(vecs: DataFrame, idCol: String, embCol: String,
            stateDir: String,
            method: SimilarityMethod.EmbeddingCosine,
            checkpointLocation: Option[String] = None,
            onBatch: (Long, Curate.EmbReport) => Unit = (_, _) => (),
            autoCompactEvery: Int = 0,
            keepLedger: Boolean = false,
            vecBudget: Long = Long.MaxValue): StreamingQuery = {
    if (vecBudget != Long.MaxValue)
      SpendBudget.requireIntegralId(vecs, idCol, "vecBudget")
    val writer = vecs.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, embCol, stateDir, method,
          onBatch, keepLedger, vecBudget)
        StreamState.maybeAutoCompact(autoCompactEvery, batchId)(
          compact(batch.sparkSession, stateDir))
      }
    checkpointLocation.fold(writer)(writer.option("checkpointLocation", _))
      .start()
  }

  /** One trigger — package-private so specs drive replay directly. */
  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
                                      idCol: String, embCol: String,
                                      stateDir: String,
                                      method: SimilarityMethod.EmbeddingCosine,
                                      onBatch: (Long, Curate.EmbReport) => Unit,
                                      keepLedger: Boolean = false,
                                      vecBudget: Long = Long.MaxValue): Unit = {
    val spark = batch.sparkSession
    import org.apache.spark.sql.functions._
    // id-excluded state read: a replayed batch must not see its own
    // partial previous write as standing corpus (CurateStream contract)
    val corpus = StreamState.read(spark, s"$stateDir/corpus", batchId)
      .getOrElse(batch.limit(0))
    val fps = StreamState.read(spark, s"$stateDir/fps", batchId)
    val (accepted0, report, ledger0) =
      if (keepLedger) {
        val (a, r, l) = Curate.runIncrementalEmbeddingTracked(batch, corpus,
          idCol, embCol, method, corpusFps = fps, log = _ => ())
        (a, r, Some(l))
      } else {
        val (a, r) = Curate.runIncrementalEmbedding(batch, corpus, idCol,
          embCol, method, corpusFps = fps, log = _ => ())
        (a, r, None)
      }
    // vector-count budget admission: the CurateStream token-budget
    // block with a unit measure — the richest-first order degenerates
    // to the deterministic id-ascending prefix
    val (accepted, ledger, spendNow, cutRoot) =
      if (vecBudget == Long.MaxValue) (accepted0, ledger0, -1L, accepted0)
      else {
        val headroom =
          vecBudget - SpendBudget.spent(spark, stateDir, batchId)
        val (adm, now, root) = SpendBudget.admit(accepted0, idCol,
          lit(1L), headroom)
        val withDrops = ledger0.map(_.unionByName(SpendBudget.drops(
          accepted0, adm, idCol, "vec_budget",
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
    Curate.embeddingFingerprints(accepted, embCol)
      .write.mode("overwrite").parquet(s"$stateDir/fps/b$batchId")
    if (vecBudget != Long.MaxValue)
      SpendBudget.record(spark, stateDir, batchId, spendNow)
    graft.ops.StageCut.release(cutRoot)
    onBatch(batchId, report)
  }

  /** Fold completed per-batch dirs — [[CurateStream.compact]]'s
    * contract (caps strictly below the newest corpus batch id). The
    * `spend/` registry compacts with the rest (readers SUM rows). */
  def compact(spark: SparkSession, stateDir: String): Unit =
    StreamState.latestBatchId(spark, s"$stateDir/corpus").foreach { cap =>
      Seq("corpus", "fps", "spend").foreach(sub =>
        StreamState.compactDir(spark, s"$stateDir/$sub", cap))
    }
}
