package graft.apps

import graft.SparkSpec
import graft.dedup.{SimilarJoin, SimilarityMethod}
import graft.text.{C4Clean, Decontaminate, FilterPolicy, SpanDedup, TextOps}
import org.apache.spark.sql.functions._

/** PretrainPrep — the full crawl-to-shards recipe: run() must equal
  * the hand-composed operator chain stage by stage (same frames, same
  * order), every dedup stage must actually DROP rows on the gate
  * fixture (the q126 vacuity lesson), and the CLI must write the
  * complete release layout. The q128 gate pins the composition
  * against DuckDB at sf0.01/sf0.1. */
class PretrainPrepSpec extends SparkSpec {
  import spark.implicits._

  private val benchPred = col("doc_id") % 2 === 1 && col("doc_id") % 7 === 0

  /** The q128 gate fixture: the non-bench corpus augmented with
    * deterministic exact copies (%10==2, +100000) and near copies
    * (%10==4, +200000, 6-word tail) so exact AND near dedup have work
    * at every SF (the q24 manufactured-collision discipline). */
  private def gateCorpus(docs: org.apache.spark.sql.DataFrame) = {
    val base = docs.filter(!benchPred)
      .select(col("doc_id"), col("source"), col("text"))
    base
      .unionByName(base.filter(col("doc_id") % 10 === 2)
        .select((col("doc_id") + 100000).as("doc_id"), col("source"),
          col("text")))
      .unionByName(base.filter(col("doc_id") % 10 === 4)
        .select((col("doc_id") + 200000).as("doc_id"), col("source"),
          concat(col("text"),
            lit(" tail marker alpha beta gamma delta")).as("text")))
  }

  private def gateRun() = {
    val docs = graft.Tables.load(spark, sf(), "documents")
    val logs = scala.collection.mutable.ArrayBuffer.empty[String]
    val (out, report) = PretrainPrep.run(
      gateCorpus(docs), "doc_id", "text", "source",
      bench = Some(docs.filter(benchPred)),
      badWords = Seq("dup"), spanN = 4, spanMinDocs = 3,
      method = SimilarityMethod.MinHashLsh(minJaccard = 0.6),
      decontamN = 5, quotaPerSource = 15, nShards = 4, seed = 7,
      log = logs += _)
    (docs, out, report, logs.toSeq)
  }

  test("run() == the hand-composed operator chain, stage by stage") {
    val (docs, out, report, logs) = gateRun()
    val corpus = gateCorpus(docs)
    val bench = docs.filter(benchPred)

    // hand-composed chain, each stage the already-gated operator
    val pol = FilterPolicy(corpus, "doc_id", "text")
      .filter(col("keep")).select(col("doc_id"))
    val kept = corpus.join(pol, Seq("doc_id"), "left_semi")
    val noBad = C4Clean.dropBadWordDocs(kept, "text", Seq("dup"))
    val winners = noBad
      .select(TextOps.fingerprint(col("text")).as("_f"), col("doc_id"))
      .groupBy(col("_f")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val exact = noBad.join(winners, Seq("doc_id"), "left_semi")
    val scrubbed = SpanDedup
      .removeDuplicatedSpans(exact, "doc_id", "text", 4, minDocs = 3)
      .join(exact.select(col("doc_id"), col("source")), Seq("doc_id"))
    val clusters = SimilarJoin.similarClusters(
      scrubbed.select(col("doc_id"), col("clean_text").as("text")),
      "doc_id", "text", SimilarityMethod.MinHashLsh(minJaccard = 0.6))
    val near = scrubbed.join(
      clusters.filter(col("cluster") =!= col("id"))
        .select(col("id").as("doc_id")), Seq("doc_id"), "left_anti")
    val dec = Decontaminate.decontaminate(
        near.withColumn("text", col("clean_text")), bench,
        "doc_id", "text", 5)
      .drop("text")
    val quota = graft.ops.Sampling.capPerGroup(dec, Seq("source"),
      Seq(("n_kept", false), ("doc_id", true)), 15).drop("rn")
    val expected = graft.ops.Sampling.shuffleShards(quota, "doc_id", 4, 7)
      .select(col("doc_id"), col("source"), col("n_kept"),
        col("shard"), col("pos"))
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1).toSeq

    val got = out
      .select(col("doc_id"), col("source"), col("n_kept"),
        col("shard"), col("pos"))
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == expected)

    // stage counts are the hand chain's counts
    assert(report.afterPolicy == kept.count())
    assert(report.afterBadWords == noBad.count())
    assert(report.afterExact == exact.count())
    assert(report.afterSpanScrub == scrubbed.count())
    assert(report.afterNear == near.count())
    assert(report.afterDecontam == dec.count())
    assert(report.afterEmbDecontam == report.afterDecontam)
    assert(report.afterQuota == got.size.toLong)
    info(s"stage counts: $report")
    assert(logs.size == 8, s"one log line per stage pair: $logs")
    out.unpersist()
  }

  test("survivorship: rows survive to the end AND every dropping " +
      "stage drops on the gate fixture (the q126 vacuity lesson)") {
    val (docs, out, r, _) = gateRun()
    assert(r.afterQuota > 0, s"pipeline emptied: $r")
    assert(r.afterPolicy < r.input, s"policy dropped nothing: $r")
    assert(r.afterBadWords < r.afterPolicy, s"bad-words dropped nothing: $r")
    assert(r.afterExact < r.afterBadWords, s"exact dropped nothing: $r")
    assert(r.afterNear < r.afterSpanScrub, s"near dropped nothing: $r")
    assert(r.afterDecontam < r.afterNear, s"decontam dropped nothing: $r")
    assert(r.afterQuota < r.afterDecontam, s"quota dropped nothing: $r")
    // the span scrub's bite is text REMOVAL, not document drops: some
    // survivor must have lost tokens (the near copies lose their tail)
    val trimmed = out
      .join(gateCorpus(docs).select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("_nt")), Seq("doc_id"))
      .filter(col("n_kept") < col("_nt")).count()
    assert(trimmed > 0, "span scrub removed no spans from any survivor")
    out.unpersist()
  }

  test("countInput=false skips exactly the one input-scan job on a " +
      "transformed input, with an otherwise identical run") {
    // a TRANSFORMED input: its count() is a real scan, not a parquet
    // row-group metadata read — the scan the knob exists to skip
    val docs = graft.Tables.load(spark, sf(), "documents")
      .filter(col("doc_id") % 3 =!= 1)
      .select(col("doc_id"), col("source"), col("text"))
    def jobs[T](body: => T): (Long, T) = {
      val n = new java.util.concurrent.atomic.AtomicLong
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          n.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(l)
      try {
        val r = body
        // drain the async listener bus before reading the counter
        var last = -1L; var stable = 0
        while (stable < 3) {
          Thread.sleep(100)
          val b = n.get
          if (b == last) stable += 1 else { stable = 0; last = b }
        }
        (n.get, r)
      } finally spark.sparkContext.removeSparkListener(l)
    }
    def run(ci: Boolean) = {
      val (out, r) = PretrainPrep.run(docs, "doc_id", "text", "source",
        badWords = Seq("dup"), spanN = 4, spanMinDocs = 3,
        method = SimilarityMethod.MinHashLsh(minJaccard = 0.6),
        quotaPerSource = 15, nShards = 4, seed = 7,
        countInput = ci, log = _ => ())
      val rows = out.select(col("doc_id"), col("shard"), col("pos"))
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      graft.ops.StageCut.release(out)
      (r, rows)
    }
    run(ci = true) // warm-up: file listing, codegen, broadcast thresholds
    // what the skipped scan costs, measured the same way (AQE may split
    // one count() into several jobs — calibrate instead of assuming 1)
    val (countJobs, _) = jobs(docs.count())
    val (jobsOn, (rOn, rowsOn)) = jobs(run(ci = true))
    val (jobsOff, (rOff, rowsOff)) = jobs(run(ci = false))
    assert(rowsOff == rowsOn, "countInput must not change results")
    assert(rOff == rOn.copy(input = -1L), s"only input differs: $rOn vs $rOff")
    assert(countJobs >= 1, "the transformed-input count must be a real job")
    assert(jobsOff == jobsOn - countJobs,
      s"countInput=false must skip exactly the input-count scan " +
        s"($countJobs jobs; true: $jobsOn, false: $jobsOff)")
  }

  test("CLI writes the full release layout (data, manifest, card, " +
      "length_hist, policy)") {
    val dir = java.nio.file.Files.createTempDirectory("prep").toString
    Mains.keepSessionForTests = true
    try PretrainPrepMain.main(Array(sf(), dir,
      "badwords=dup", "spanN=4", "method=minhash:0.6", "decontamN=5",
      "quota=15", "shards=4", "seed=7", "seqLen=64"))
    finally Mains.keepSessionForTests = false
    val data = graft.io.Publish.readPartitioned(spark, s"$dir/data")
    assert(data.count() > 0)
    // partition pruning layout: shard directories exist
    val shardDirs = new java.io.File(s"$dir/data").listFiles()
      .map(_.getName).filter(_.startsWith("shard=")).toSeq
    assert(shardDirs.nonEmpty, s"no shard partitions under $dir/data")
    // manifest packs exactly the released token counts
    val manifest = spark.read.parquet(s"$dir/manifest")
    assert(manifest.agg(sum("n_in_seq")).as[Long].head() ==
      data.agg(sum("n_kept")).as[Long].head())
    // every sequence holds at most seqLen tokens
    assert(manifest.groupBy("shard", "seq").agg(sum("n_in_seq").as("n"))
      .filter(col("n") > 64).count() == 0)
    val card = spark.read.parquet(s"$dir/card")
    assert(card.count() > 0 && card.columns.contains("token_share"))
    assert(spark.read.parquet(s"$dir/length_hist").count() > 0)
    assert(FilterPolicy.loadPolicy(spark, s"$dir/policy") ==
      graft.text.PolicyConfig.Gopher)
  }
}
