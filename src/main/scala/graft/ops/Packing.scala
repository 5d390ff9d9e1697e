package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the concat-then-chunk step an LLM training
  * pipeline runs last: the token streams of consecutive documents are
  * conceptually concatenated and sliced into fixed-length training
  * sequences of `seqLen` tokens, and the PACKING MANIFEST maps every
  * sequence to the documents (and the token range within each) that
  * fill it. The manifest is what a data loader consumes; the token
  * tensors themselves are assembled at read time from it.
  *
  * Determinism and scale shape: packing is defined WITHIN a partition
  * key (`groupCol` — a source/shard column) by ascending `idCol`, so
  * the assignment is a pure function of the data, reproducible
  * run-to-run and engine-to-engine. The cumulative token offset is a
  * window sum partitioned by `groupCol`: parallelism = number of
  * groups, the way a real pipeline shards packing per source/shard. A
  * GLOBAL pack (no partition key) would be a single-partition window
  * — a scale-killer this API deliberately does not offer.
  *
  * Cost: one shuffle on `groupCol` (the window), then a narrow
  * range-explode — each document lands in `1 + floor((n-1+off)/L)`
  * manifest rows, so output size ≈ corpus docs + total_tokens/seqLen.
  */
object Packing {

  /** The packing manifest: one row per (sequence, contributing
    * document) with columns `groupCol`, `seq` (0-based sequence index
    * within the group), `idCol`, `doc_from` (first contributed token's
    * 0-based offset WITHIN the document) and `n_in_seq` (tokens the
    * document contributes to this sequence). Zero-token documents
    * contribute nothing and are absent. The final sequence of each
    * group is typically short (a real loader drops or pads it —
    * policy's out of scope here). `nTokensCol` must be a non-negative
    * integral column; `idCol` must be distinct within each group (the
    * packing order). */
  def packSequences(df: DataFrame, idCol: String, groupCol: String,
                    nTokensCol: String, seqLen: Int): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
    df.select(col(groupCol), col(idCol),
        col(nTokensCol).cast("long").as("_n"))
      .filter(col("_n") > 0)
      .withColumn("_e", sum(col("_n")).over(w) - 1)   // last stream index
      .withColumn("_s", col("_e") - col("_n") + 1)    // first stream index
      .select(col(groupCol), col(idCol), col("_s"), col("_e"),
        explode(sequence(expr(s"`_s` DIV $seqLen"), expr(s"`_e` DIV $seqLen")))
          .as("seq"))
      .select(
        col(groupCol), col("seq"), col(idCol),
        (greatest(col("_s"), col("seq") * seqLen) - col("_s")).as("doc_from"),
        (least(col("_e"), (col("seq") + 1) * seqLen - 1)
          - greatest(col("_s"), col("seq") * seqLen) + 1).as("n_in_seq"))
  }

  /** [[packSequences]] with TWO-LEVEL sharding — same manifest, but
    * parallelism no longer capped at the number of groups. The plain
    * version's window is partitioned by `groupCol` alone: with 20
    * sources and a 1000-executor cluster, 980 cores idle through the
    * cumulative sum. This variant runs the textbook distributed
    * prefix-sum instead:
    *
    *  1. shard deterministically by `idCol DIV idBlock` — integer
    *     division is monotone in the id, so (group, shard, id) order
    *     equals (group, id) order and the result is a pure function
    *     of the data (no range-sampling nondeterminism, nothing to
    *     persist);
    *  2. per-(group, shard) token totals — a map-side-combined
    *     aggregate of #groups × #shards rows;
    *  3. exclusive prefix offsets over that TINY table (a window over
    *     shards within each group — driver-scale data, trivially
    *     cheap) joined back by BROADCAST;
    *  4. the local cumulative sum windows on (group, shard): key
    *     cardinality now scales with the shard count, so every core
    *     participates; `_e = offset + local_cumsum - 1` is exactly
    *     the plain version's global cumsum.
    *
    * Output is row-for-row identical to [[packSequences]] (the q87
    * gate hashes it against the same oracle as q84). `idCol` must be
    * integral; size `idBlock` so `#distinct(id) / idBlock` shards
    * keep the offsets table broadcastable (e.g. 1e9 docs / 1e6 block
    * = 1000 shards × groups). */
  def packSequencesSharded(df: DataFrame, idCol: String, groupCol: String,
                           nTokensCol: String, seqLen: Int,
                           idBlock: Long): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    require(idBlock >= 1, s"idBlock must be >= 1, got $idBlock")
    val base = df.select(col(groupCol), col(idCol),
        col(nTokensCol).cast("long").as("_n"))
      .filter(col("_n") > 0)
      .withColumn("_shard", expr(s"CAST(`$idCol` AS BIGINT) DIV $idBlock"))
    val wOff = Window.partitionBy(col(groupCol)).orderBy(col("_shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col(groupCol), col("_shard"))
      .agg(sum(col("_n")).as("_shard_sum"))
      .withColumn("_off",
        coalesce(sum(col("_shard_sum")).over(wOff), lit(0L)))
      .select(col(groupCol), col("_shard"), col("_off"))
    val wLoc = Window.partitionBy(col(groupCol), col("_shard"))
      .orderBy(col(idCol))
    base.join(broadcast(offsets), Seq(groupCol, "_shard"))
      .withColumn("_e", col("_off") + sum(col("_n")).over(wLoc) - 1)
      .withColumn("_s", col("_e") - col("_n") + 1)
      .select(col(groupCol), col(idCol), col("_s"), col("_e"),
        explode(sequence(expr(s"`_s` DIV $seqLen"), expr(s"`_e` DIV $seqLen")))
          .as("seq"))
      .select(
        col(groupCol), col("seq"), col(idCol),
        (greatest(col("_s"), col("seq") * seqLen) - col("_s")).as("doc_from"),
        (least(col("_e"), (col("seq") + 1) * seqLen - 1)
          - greatest(col("_s"), col("seq") * seqLen) + 1).as("n_in_seq"))
  }
}
