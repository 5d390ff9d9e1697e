package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared on-disk state discipline for the `foreachBatch` registries
  * ([[EntityResolveStream]], [[ScdStream]], [[CurateStream]]): state
  * accumulates as per-batch parquet subdirectories `b<id>` (append-only,
  * replay-idempotent — each batch overwrites only its own dir), which is
  * crash-safe but grows one directory per trigger forever. This object
  * adds the MAINTENANCE move: [[compact]] folds completed batch dirs
  * into one snapshot so a year of daily batches reads as one parquet
  * dir + the recent tail, not 365 listings.
  *
  * Snapshot naming IS the commit protocol: a snapshot is written to a
  * `_tmp_…` dir (invisible — the name regexes below are the read
  * filter) and RENAMED to `c<gen>_<coveredMax>` (atomic on HDFS and
  * local FS). `coveredMax` says "this snapshot holds every batch dir
  * with id <= coveredMax (and every older snapshot)"; `gen` increases
  * per compact so the newest snapshot is identifiable even before the
  * superseded dirs are garbage-collected.
  *
  * Garbage collection is DEFERRED one compact cycle: a compact never
  * deletes the dirs it just superseded — it deletes what the PREVIOUS
  * committed snapshot superseded. An in-flight reader that listed the
  * directory before the newest snapshot committed therefore has a full
  * compact interval to finish reading the files it chose (schedule
  * compaction coarser than the longest trigger/batch job — the same
  * contract as any table OPTIMIZE with concurrent readers). Crash
  * analysis:
  *
  *  - crash mid-write: only a `_tmp_…` dir exists — reads ignore it,
  *    state is untouched; the next compact deletes it and rewrites;
  *  - crash right after rename: reads pick the new snapshot and skip
  *    the covered dirs by id — exactly the steady state, since GC is
  *    deferred anyway; the next compact's opening GC (computed from
  *    the newest committed snapshot, not from any in-memory fold set)
  *    reclaims them;
  *  - nothing covered by only an UNcommitted snapshot is ever deleted,
  *    so no interleaving of operations can lose or double rows.
  *
  * Compaction must cap STRICTLY below the stream's newest completion
  * marker (each stream's `compact` computes this): `foreachBatch`
  * replays at most the newest batch id, and that id's reads exclude
  * its own dirs by id — which only works while those dirs are not yet
  * folded into a snapshot. [[parts]] fails loudly if the requested
  * read boundary falls below every usable snapshot (with a one-
  * generation fallback for a compact committing mid-read — see its
  * doc). Single maintenance caller at a time.
  *
  * COST: each compact rewrites the WHOLE accumulated state — the new
  * snapshot is built by reading the previous snapshot plus the tail
  * and writing both back, O(total state) I/O per cycle, NOT a
  * metadata-only move (reads are metadata-cheap afterwards; the
  * compact itself is a full-table write like any OPTIMIZE). Schedule
  * accordingly: cadence should grow with the state/tail ratio — daily
  * batches compacted weekly rewrite the state 52×/year; compacting
  * every batch makes total I/O quadratic in stream length. For
  * append-heavy registries measured in TBs, run compaction rarely (or
  * partition state so each compact touches one partition).
  *
  * Stray non-matching names (a manual `backup/` dir, editor droppings)
  * are ignored by the same regexes instead of crashing the reads.
  */
object StreamState {

  private val BatchRe = "^b(-?\\d+)$".r
  private val CompactRe = "^c(\\d+)_(-?\\d+)$".r
  private val TmpPrefix = "_tmp_"

  private case class Listing(batches: Seq[(Long, String)],
                             compacts: Seq[(Long, Long, String)],
                             tmps: Seq[String])

  private def fileSystem(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** One driver-side FS listing, names parsed and filtered. */
  private def listing(spark: SparkSession, dir: String): Option[Listing] = {
    val (fs, p) = fileSystem(spark, dir)
    if (!fs.exists(p)) None
    else {
      val subs = fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
      val batches = subs.flatMap(q => q.getName match {
        case BatchRe(id) => Some(id.toLong -> q.toString)
        case _ => None
      }).toSeq
      val compacts = subs.flatMap(q => q.getName match {
        case CompactRe(gen, m) => Some((gen.toLong, m.toLong, q.toString))
        case _ => None
      }).toSeq
      val tmps = subs.filter(_.getName.startsWith(TmpPrefix))
        .map(_.toString).toSeq
      Some(Listing(batches, compacts, tmps))
    }
  }

  /** Live part paths carrying batches with id < `beforeBatch`: the
    * newest USABLE snapshot (it holds everything <= its coveredMax)
    * plus the uncovered batch dirs. None when no such state exists.
    *
    * Usable = coveredMax < beforeBatch, and the read may fall back ONE
    * generation to find it: when a maintenance compact commits between
    * a caller deriving its read boundary and this listing (the
    * ScdStream.dimension cross-directory race — boundary from `open/`
    * at t0, this listing at t1), the NEWEST snapshot can legitimately
    * cover past the boundary. The previous snapshot is still on disk
    * (GC is deferred one cycle) and the batch dirs above ITS coveredMax
    * are too (only dirs <= the previous snapshot's cap were reclaimed
    * by the newest compact's opening GC), so that pair reconstructs the
    * boundary-consistent view exactly. Falling back FURTHER is
    * impossible — older snapshots' tail dirs are gone — so a boundary
    * below the second-newest snapshot's cap still fails loudly: that
    * needs two compact cycles inside one read, which the documented
    * "schedule compaction coarser than the longest batch job" contract
    * excludes. */
  def parts(spark: SparkSession, dir: String,
            beforeBatch: Long): Option[Seq[String]] =
    listing(spark, dir).flatMap { l =>
      val byGen = l.compacts.sortBy(_._1)
      val chosen = byGen.filter(_._2 < beforeBatch).lastOption
      byGen.lastOption.foreach { case (newestGen, coveredMax, path) =>
        require(chosen.exists(c =>
            c._1 == newestGen || byGen.takeRight(2).headOption.exists(_._1 == c._1)),
          s"snapshot $path covers batch ids through $coveredMax but the " +
            s"read excludes ids >= $beforeBatch and no committed " +
            "snapshot within one generation sits below that boundary — " +
            "compaction must cap strictly below the newest completion " +
            "marker and run coarser than the longest concurrent read")
      }
      val lo = chosen.map(_._2).getOrElse(Long.MinValue)
      val live = chosen.map(_._3).toSeq ++
        l.batches.filter(b => b._1 > lo && b._1 < beforeBatch).map(_._2)
      if (live.isEmpty) None else Some(live)
    }

  /** The newest batch id present (batch dirs OR folded into a
    * snapshot), or None with no state. The completion-marker id. */
  def latestBatchId(spark: SparkSession, dir: String): Option[Long] =
    listing(spark, dir).flatMap { l =>
      (l.batches.map(_._1) ++ l.compacts.map(_._2)).maxOption
    }

  /** The path of the newest batch dir with id < `beforeBatch` plus its
    * id — for latest-wins state (ScdStream's open slice). Snapshots are
    * not consulted: latest-wins dirs are never folded, only GC'd. */
  def latestBatchDir(spark: SparkSession, dir: String,
                     beforeBatch: Long): Option[(Long, String)] =
    listing(spark, dir).flatMap {
      _.batches.filter(_._1 < beforeBatch).sortBy(_._1).lastOption
    }

  /** Fold every live part with batch id < `capExclusive` into one
    * snapshot dir, after reclaiming whatever the PREVIOUS committed
    * snapshot superseded (deferred GC — see the object doc for the
    * in-flight-reader grace and crash contracts). Idempotent; a
    * cleanup-only pass when there is nothing new to fold. */
  def compactDir(spark: SparkSession, dir: String,
                 capExclusive: Long): Unit =
    listing(spark, dir).foreach { l =>
      val (fs, _) = fileSystem(spark, dir)
      // stale tmp dirs are dead by definition (a live compact is THIS
      // call); clear them first so a crashed attempt cannot accumulate
      l.tmps.foreach(t =>
        fs.delete(new org.apache.hadoop.fs.Path(t), true))
      val prev = l.compacts.sortBy(_._1).lastOption
      // DEFERRED GC: everything the newest COMMITTED snapshot covers
      // has been dead for at least one compact interval — reclaim it
      // now, before building the next snapshot
      prev.foreach { case (g, m, _) =>
        l.compacts.filter(_._1 < g).foreach(c =>
          fs.delete(new org.apache.hadoop.fs.Path(c._3), true))
        l.batches.filter(_._1 <= m).foreach(b =>
          fs.delete(new org.apache.hadoop.fs.Path(b._2), true))
      }
      val lo = prev.map(_._2).getOrElse(Long.MinValue)
      val fold = l.batches.filter(b => b._1 > lo && b._1 < capExclusive)
      if (fold.nonEmpty) {
        val gen = prev.map(_._1 + 1).getOrElse(0L)
        val coveredMax = fold.map(_._1).max
        val live = prev.map(_._3).toSeq ++ fold.map(_._2)
        val tmp = s"$dir/${TmpPrefix}c${gen}_$coveredMax"
        spark.read.parquet(live: _*)
          .write.mode("overwrite").parquet(tmp)
        val committed = fs.rename(new org.apache.hadoop.fs.Path(tmp),
          new org.apache.hadoop.fs.Path(s"$dir/c${gen}_$coveredMax"))
        require(committed, s"snapshot rename failed under $dir")
        // NO deletion here: the dirs this snapshot superseded stay
        // until the next compact so in-flight readers never lose files
      }
    }

  /** Delete batch dirs with id < `capExclusive` except the newest of
    * them — the latest-wins GC (ScdStream's open slice: superseded
    * snapshots are dead rows, not history). Pure deletion; safe at any
    * crash point. */
  def gcLatestWins(spark: SparkSession, dir: String,
                   capExclusive: Long): Unit =
    listing(spark, dir).foreach { l =>
      val (fs, _) = fileSystem(spark, dir)
      val old = l.batches.filter(_._1 < capExclusive).sortBy(_._1)
      old.dropRight(1).foreach { case (_, d) =>
        fs.delete(new org.apache.hadoop.fs.Path(d), true)
      }
    }

  /** Convenience: [[parts]] read as one frame. */
  def read(spark: SparkSession, dir: String,
           beforeBatch: Long): Option[DataFrame] =
    parts(spark, dir, beforeBatch).map(ps => spark.read.parquet(ps: _*))

  /** The streams' AUTO-COMPACT cadence hook: run `compact` after the
    * batch completing each `every`-batch window (batch ids count from
    * 0, so `every = 3` compacts after batches 2, 5, 8, …). `every = 0`
    * — the default at every call site — disables it: compaction stays
    * an explicit maintenance call unless opted into. Replay-safe: a
    * re-run batch re-triggers the same compact, which is idempotent;
    * running inside `foreachBatch` serializes it against the stream's
    * own writes, and EXTERNAL readers keep the deferred-GC grace of
    * one full window — the object doc's "schedule compaction coarser
    * than the longest concurrent read", now measured in batches. */
  private[streaming] def maybeAutoCompact(every: Int, batchId: Long)
                                         (compact: => Unit): Unit = {
    require(every >= 0, s"autoCompactEvery must be >= 0, got $every")
    if (every > 0 && batchId >= 0 && (batchId + 1) % every == 0) compact
  }
}
