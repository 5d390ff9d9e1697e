package graft.sim

import graft.SparkSpec
import graft.dedup.SlowStress
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The round-6 "measure, don't assume" item for [[Similarity
  * .ivfTopKBatch]]: does shipping probe+corpus VECTORS through the
  * cell-key join beat a keys-only join with per-side late vector
  * fetch (the auto-join's discipline)?
  *
  * Answer, measured here at dim 256 on a 20k corpus × 1k probes with
  * broadcast disabled (the both-sides-large regime): the PAIR JOIN
  * wins — each corpus vector rides the cell exchange once (a vector
  * belongs to exactly one cell; only probes replicate, ×nprobe), while
  * late fetch ships the candidate list (|probes| × nprobe ×
  * cell-population rows — orders of magnitude more rows than either
  * input) through two extra exchanges, the second already carrying the
  * fetched probe vector. Measured run: 127 MB shuffled / 4.4 s for the
  * pair join vs 1042 MB / 18.6 s for late fetch (8.2× the bytes). The shipped ivfTopKBatch keeps the pair-join
  * shape; [[Similarity.ivfTopKBatchLateFetch]] exists only for this
  * measurement. */
class IvfShuffleSpec extends SparkSpec {

  private class ShuffleBytes extends SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      bytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
  }

  /** Run `df.collect()` with a shuffle-write-bytes listener attached;
    * returns (bytes, seconds, rows). Polls the listener until the async
    * stage events have drained. */
  private def measure(df: => DataFrame): (Long, Double, Seq[(Long, Long, Double, Long)]) = {
    val l = new ShuffleBytes
    spark.sparkContext.addSparkListener(l)
    try {
      val t0 = System.nanoTime()
      val rows = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getAs[Number](3).longValue))
        .toSeq
      val secs = (System.nanoTime() - t0) / 1e9
      var last = -1L
      var stable = 0
      while (stable < 3) {
        Thread.sleep(200)
        val b = l.bytes.get
        if (b == last) stable += 1 else { stable = 0; last = b }
      }
      (l.bytes.get, secs, rows)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("ivfTopKBatch: vectors-through-cell-join beats keys-only late fetch", SlowStress) {
    val dim = 256
    // deterministic dense corpus: per-component seeded rand; persisted
    // so both variants see the identical frame
    val corpus = spark.range(20000)
      .select(col("id").as("vec_id"),
        array((0 until dim).map(i => rand(seed = i.toLong)): _*).as("embedding"))
      .persist()
    corpus.count()
    val probes = corpus.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 100000L).as("q_id"), col("embedding").as("q_vec"))
      .persist()
    probes.count()
    // one pre-trained index for both variants: training cost (and its
    // own shuffles) stay out of the comparison
    val index = CellIndex.train(corpus, "vec_id", "embedding", numCells = 16)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def run(late: Boolean): DataFrame =
        if (late) Similarity.ivfTopKBatchLateFetch(corpus, "vec_id", "embedding",
          probes, "q_id", "q_vec", nprobe = 4, k = 10, index = Some(index))
        else Similarity.ivfTopKBatch(corpus, "vec_id", "embedding",
          probes, "q_id", "q_vec", nprobe = 4, k = 10, index = Some(index))
      // warm both plans once (codegen compile out of the timings)
      run(late = false).count(); run(late = true).count()
      val (joinBytes, joinSecs, joinRows) = measure(run(late = false))
      val (lateBytes, lateSecs, lateRows) = measure(run(late = true))
      info(f"pair join:  ${joinBytes / 1e6}%.1f MB shuffled, $joinSecs%.2f s")
      info(f"late fetch: ${lateBytes / 1e6}%.1f MB shuffled, $lateSecs%.2f s")
      // identical routing ⇒ identical results — the shapes differ only
      // in WHERE the vectors travel
      assert(joinRows == lateRows, "candidate shapes must agree on results")
      assert(joinRows.size == 1000 * 10)
      // the standing claim: the pair join shuffles strictly less. The
      // margin is structural (candidates ≫ corpus+probes), so assert a
      // real multiple, not a hair's width
      assert(lateBytes > 2 * joinBytes,
        f"late fetch should shuffle far more: join=${joinBytes / 1e6}%.1f MB " +
          f"late=${lateBytes / 1e6}%.1f MB")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      probes.unpersist(); corpus.unpersist()
    }
  }
}
