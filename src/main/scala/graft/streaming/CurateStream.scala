package graft.streaming

import graft.apps.Curate
import graft.dedup.SimilarityMethod
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured-Streaming front end for the INCREMENTAL curation
  * pipeline: each micro-batch is curated against the standing corpus
  * with [[Curate.runIncremental]] and ONLY the accepted rows (plus
  * their train-once artifacts) are appended to the state directory —
  * the streaming form of the daily `curate-incremental` CLI loop, with
  * the same append-on-accept maintenance move per trigger instead of
  * per day.
  *
  * Why `foreachBatch` and not a stateful operator: near-dup curation
  * needs candidate JOINS against the whole accepted corpus (band
  * index probes, connected components) — none of which has a
  * bounded-state keyed-stream form. What CAN stream in-flight is
  * signature-exact dedup ([[EventsStream.nearDupDedupStream]]); the
  * corpus-relative decision is inherently a micro-batch join, and
  * `foreachBatch` is exactly Spark's bridge for running the proven
  * batch pipeline per trigger.
  *
  * State shape (the 100 TB contract): everything lives in parquet
  * under `stateDir` — `corpus/` (accepted rows), `fps/`
  * (fingerprints) and, for the text methods, `sigs/` (signature
  * tables). Growth is bounded by ACCEPTANCES, never by stream volume:
  * a rejected row leaves zero bytes of state. Each micro-batch reads
  * the artifact tables — never the corpus text — for its exact and
  * near stages (the corpus frame is passed for its schema and the
  * pair joins' id side only), so per-trigger cost is ∝ batch plus one
  * artifact-table probe, the same economics as the daily CLI.
  *
  * Idempotence: `foreachBatch` replays a batch id after failure
  * (at-least-once); every write here lands in a per-batch
  * subdirectory (`b<batchId>`) with overwrite mode, so a replay
  * rewrites the same files instead of double-appending acceptances.
  */
object CurateStream {

  /** Starts the stream. `docs` must be a STREAMING DataFrame carrying
    * `idCol` and `textCol`. Returns the running query; state
    * accumulates under `stateDir` as described above. `onBatch` is
    * invoked with (batchId, report) after each trigger — reporting
    * hook, not a data path. Seed a pre-existing corpus by writing its
    * rows/artifacts as `b-1` subdirectories before starting.
    * `autoCompactEvery = N` runs [[compact]] after every Nth
    * completed batch ([[StreamState.maybeAutoCompact]] — 0 keeps
    * compaction an explicit maintenance call). `keepLedger` writes the
    * per-document drop audit of [[Curate.runIncrementalTracked]] to a
    * PER-BATCH subdirectory `ledger/b<batchId>` — audit output, never
    * read back by a trigger and never compacted (folding would erase
    * which trigger rejected a doc); replays overwrite their own
    * subdirectory like every other per-batch write here. */
  /** `tokenBudget`: an overall token cap for the STANDING corpus —
    * the streaming form of the prep pipelines' `budget=` (q137):
    * cumulative token spend is tracked in a `spend/` state registry
    * (one row per batch, same per-batch-subdir idempotence as every
    * other state write), and each trigger admits only its
    * token-richest `(tokens DESC, id ASC)` prefix into the REMAINING
    * headroom — admit-until-exhausted across micro-batches, with
    * budget rejects ledgered as `(quota, token_budget)` when
    * `keepLedger` is on. Tokens are whitespace counts of `textCol`
    * (`TextOps.tokenCount` — the curation pipeline has no scrub
    * stage, so raw-text tokens ARE the spend). */
  def start(docs: DataFrame, idCol: String, textCol: String,
            stateDir: String,
            minQuality: Double = 0.5,
            method: SimilarityMethod = SimilarityMethod.MinHashLsh(minJaccard = 0.8),
            checkpointLocation: Option[String] = None,
            onBatch: (Long, Curate.Report) => Unit = (_, _) => (),
            autoCompactEvery: Int = 0,
            keepLedger: Boolean = false,
            tokenBudget: Long = Long.MaxValue): StreamingQuery = {
    require(!method.isInstanceOf[SimilarityMethod.EmbeddingCosine] &&
        !method.isInstanceOf[SimilarityMethod.PerceptualHash],
      "CurateStream curates TEXT batches (runIncremental); use " +
        "CurateEmbeddingStream for vectors and CurateMediaStream for " +
        "image/audio payloads")
    // the budget's prefix cutoff narrows over the id axis
    // (Sampling.tokenBudgetSelect), which needs integral ids — fail at
    // START, not on the first trigger
    require(tokenBudget == Long.MaxValue ||
        Set("long", "int", "integer", "short", "byte")
          .contains(docs.schema(idCol).dataType.typeName),
      s"tokenBudget needs an integral $idCol (the budget cutoff " +
        s"tie-breaks and narrows on ids), got " +
        docs.schema(idCol).dataType.typeName)
    val writer = docs.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, textCol, stateDir, minQuality,
          method, onBatch, keepLedger, tokenBudget)
        StreamState.maybeAutoCompact(autoCompactEvery, batchId)(
          compact(batch.sparkSession, stateDir))
      }
    checkpointLocation.fold(writer)(writer.option("checkpointLocation", _))
      .start()
  }

  /** One trigger: curate `batch` against the standing state and append
    * acceptances + artifacts. Package-private so the spec can drive it
    * directly for the replay-idempotence case. */
  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
                                      idCol: String, textCol: String,
                                      stateDir: String, minQuality: Double,
                                      method: SimilarityMethod,
                                      onBatch: (Long, Curate.Report) => Unit,
                                      keepLedger: Boolean = false,
                                      tokenBudget: Long = Long.MaxValue): Unit = {
    val spark = batch.sparkSession
    // a replayed batch id must NOT see its own (possibly partial)
    // previous write as standing corpus — its rows would then drop as
    // corpus-exact duplicates and the replay would commit an empty
    // acceptance set. Excluding b<batchId> from every state read makes
    // the overwrite below a true replay.
    val corpus = readState(spark, s"$stateDir/corpus", batchId)
      // bootstrap: no state yet — an empty corpus with the batch's
      // shape (runIncremental only reads id/text off it)
      .getOrElse(batch.limit(0))
    val sigs = method match {
      case _: SimilarityMethod.MinHashLsh | _: SimilarityMethod.SimHash =>
        readState(spark, s"$stateDir/sigs", batchId)
      case _ => None
    }
    val fps = readState(spark, s"$stateDir/fps", batchId)
    val (accepted0, report, ledger0) =
      if (keepLedger) {
        val (a, r, l) = Curate.runIncrementalTracked(batch, corpus, idCol,
          textCol, minQuality, method, corpusSigs = sigs, corpusFps = fps,
          log = _ => ())
        (a, r, Some(l))
      } else {
        val (a, r) = Curate.runIncremental(batch, corpus, idCol,
          textCol, minQuality, method, corpusSigs = sigs, corpusFps = fps,
          log = _ => ())
        (a, r, None)
      }
    // token-budget admission: survivors keep their token-richest
    // (tokens DESC, id ASC) prefix into the budget's REMAINING
    // headroom — cumulative spend read id-excluded from the spend/
    // registry (a replayed batch never double-counts its own write).
    // `spendNow` sums the _n_tok column the admission already
    // computed — the tokenizer runs once per batch, not twice.
    val (accepted, ledger, spendNow, cutRoot) =
      if (tokenBudget == Long.MaxValue) (accepted0, ledger0, -1L, accepted0)
      else {
        val spent = readState(spark, s"$stateDir/spend", batchId)
          .map(_.agg(coalesce(sum(col("tokens")), lit(0L)))
            .head().getLong(0))
          .getOrElse(0L)
        val headroom = tokenBudget - spent
        val withTok = accepted0.withColumn("_n_tok",
          graft.text.TextOps.tokenCount(col(textCol)))
        val admitted0 = graft.ops.StageCut(
          if (headroom <= 0L) withTok.filter(lit(false))
          else graft.ops.Sampling.tokenBudgetSelect(withTok, idCol,
            "_n_tok", "_n_tok", headroom, log = _ => ()))
        val tok = admitted0
          .agg(coalesce(sum(col("_n_tok")), lit(0L))).head().getLong(0)
        // a projection over the cut frame — the cut ROOT (admitted0)
        // is what the final release must target
        val admitted = admitted0.drop("_n_tok")
        val withDrops = ledger0.map(_.unionByName(
          accepted0.select(col(idCol))
            .join(admitted.select(col(idCol)), Seq(idCol), "left_anti")
            .select(col(idCol), lit("quota").as("stage"),
              lit("token_budget").as("reason"),
              lit(null).cast(batch.schema(idCol).dataType)
                .as("winner_id"))))
        (admitted, withDrops, tok, admitted0)
      }
    ledger.foreach { l =>
      l.write.mode("overwrite").parquet(s"$stateDir/ledger/b$batchId")
      graft.ops.StageCut.release(l)
    }
    // the pre-budget acceptance frame AND the tracked ledger feed the
    // budget-drop union lazily (release on the Union frame above is a
    // no-op for the wrapped original) — release them only after the
    // ledger is on disk
    if (!(accepted eq accepted0)) {
      graft.ops.StageCut.release(accepted0)
      ledger0.foreach(l0 =>
        if (!ledger.exists(_ eq l0)) graft.ops.StageCut.release(l0))
    }
    accepted.write.mode("overwrite").parquet(s"$stateDir/corpus/b$batchId")
    Curate.textFingerprints(accepted, textCol)
      .write.mode("overwrite").parquet(s"$stateDir/fps/b$batchId")
    method match {
      case SimilarityMethod.MinHashLsh(n, b, _) =>
        graft.dedup.Dedup.lshSignatures(accepted, idCol, textCol, n, b)
          .write.mode("overwrite").parquet(s"$stateDir/sigs/b$batchId")
      case _: SimilarityMethod.SimHash =>
        graft.dedup.Dedup.simhashSignatures(accepted, idCol, textCol)
          .write.mode("overwrite").parquet(s"$stateDir/sigs/b$batchId")
      case _ => ()
    }
    if (tokenBudget != Long.MaxValue) {
      // this batch's spend: one row, written like every other state —
      // replays overwrite their own subdir, readers exclude the
      // in-flight id, so the running total is exactly-once
      import spark.implicits._
      Seq(spendNow).toDF("tokens")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$stateDir/spend/b$batchId")
    }
    graft.ops.StageCut.release(cutRoot)
    onBatch(batchId, report)
  }

  /** Fold completed per-batch acceptance dirs into one snapshot per
    * subdirectory ([[StreamState.compactDir]]'s crash contract) —
    * run periodically so the per-trigger state read stops unioning one
    * dir per historical batch. Caps STRICTLY below the newest corpus
    * batch id: an in-flight replay of that id must still exclude its
    * own (possibly partial) previous write by id. The `spend/`
    * registry compacts with the rest (readers SUM rows, so folding
    * per-batch rows into one snapshot preserves the total). */
  def compact(spark: SparkSession, stateDir: String): Unit =
    StreamState.latestBatchId(spark, s"$stateDir/corpus").foreach { cap =>
      Seq("corpus", "fps", "sigs", "spend").foreach(sub =>
        StreamState.compactDir(spark, s"$stateDir/$sub", cap))
    }

  /** Union of the per-batch subdirectories under `dir` holding batches
    * BEFORE the in-flight id (batch ids are monotone, so id-exclusion
    * and before-id reads agree), or None before the first acceptance
    * lands. Listing is one driver-side FS call per trigger — trivial
    * next to the batch job it gates. */
  private def readState(spark: SparkSession, dir: String,
                        excludeBatchId: Long): Option[DataFrame] =
    StreamState.read(spark, dir, excludeBatchId)
}
