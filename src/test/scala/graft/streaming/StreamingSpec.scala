package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamingSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("hourlyCounts over a memory stream matches the batch aggregation") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp, String, Double)]
    val events = input.toDF().toDF("event_id", "ts", "event_type", "value")

    input.addData(
      (1L, ts("2024-01-01 10:05:00"), "click", 1.0),
      (2L, ts("2024-01-01 10:55:00"), "click", 2.0),
      (3L, ts("2024-01-01 11:05:00"), "view", 5.0))
    val q = EventsStream.hourlyCounts(events)
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("hourly")
      .select("hour", "event_type", "n", "total_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(got == Set(
      (ts("2024-01-01 10:00:00"), "click", 2L, 3.0),
      (ts("2024-01-01 11:00:00"), "view", 1L, 5.0)))
  }

  test("hourlyCounts is batch/stream symmetric (same code on a batch frame)") {
    import spark.implicits._
    val batch = Seq(
      (1L, ts("2024-01-01 10:05:00"), "click", 1.0),
      (2L, ts("2024-01-01 10:55:00"), "click", 2.0))
      .toDF("event_id", "ts", "event_type", "value")
    // watermark is a no-op on batch; aggregation must agree
    val got = EventsStream.hourlyCounts(batch)
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(got == Set((ts("2024-01-01 10:00:00"), "click", 2L, 3.0)))
  }

  test("stream-static enrichment: dim join + windowed agg over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp, Long, Double)]
    val events = input.toDF().toDF("event_id", "ts", "user_id", "value")
    val customer = Seq((7L, 3L), (8L, 4L))
      .toDF("c_custkey", "c_nationkey")

    input.addData(
      (1L, ts("2024-01-01 10:05:00"), 7L, 1.0),
      (2L, ts("2024-01-01 10:15:00"), 8L, 2.0),
      (3L, ts("2024-01-01 10:25:00"), 7L, 4.0),
      (4L, ts("2024-01-01 11:05:00"), 9L, 8.0)) // user 9: no dim row → dropped
    val q = EventsStream.nationHourly(events, customer)
      .writeStream.format("memory").queryName("nation_hourly")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("nation_hourly")
      .as[(Timestamp, Long, Long, Double)].collect().toSet
    assert(got == Set(
      (ts("2024-01-01 10:00:00"), 3L, 2L, 5.0),
      (ts("2024-01-01 10:00:00"), 4L, 1L, 2.0)))

    // batch/stream symmetry: same code over a batch frame agrees
    val batch = Seq(
      (1L, ts("2024-01-01 10:05:00"), 7L, 1.0),
      (2L, ts("2024-01-01 10:15:00"), 8L, 2.0),
      (3L, ts("2024-01-01 10:25:00"), 7L, 4.0),
      (4L, ts("2024-01-01 11:05:00"), 9L, 8.0))
      .toDF("event_id", "ts", "user_id", "value")
    val batchGot = EventsStream.nationHourly(batch, customer)
      .as[(Timestamp, Long, Long, Double)].collect().toSet
    assert(batchGot == got)
  }

  test("sessionize emits closed sessions on gap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventsStream.Event]
    val q = EventsStream.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()

    input.addData(
      EventsStream.Event(1L, ts("2024-01-01 10:00:00"), 7L, "click", 0),
      EventsStream.Event(2L, ts("2024-01-01 10:10:00"), 7L, "view", 0),
      // 40-minute gap → first session closes when this arrives
      EventsStream.Event(3L, ts("2024-01-01 10:50:00"), 7L, "click", 0))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sessions")
      .as[EventsStream.SessionOut].collect()
    assert(got.length == 1)
    assert(got.head.user_id == 7L)
    assert(got.head.session_start == ts("2024-01-01 10:00:00"))
    assert(got.head.session_end == ts("2024-01-01 10:10:00"))
    assert(got.head.n_events == 2L)
  }

  test("chunked replay of REAL events equals the batch aggregation (q18 shape)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val events = graft.Tables.load(spark, sf(), "events")
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .as[(Long, Timestamp, String, Double)]
      .collect()

    val input = MemoryStream[(Long, Timestamp, String, Double)]
    val q = EventsStream.hourlyCounts(
        input.toDF().toDF("event_id", "ts", "event_type", "value"))
      .writeStream.format("memory").queryName("replay")
      .outputMode("complete").start()
    // arrive in 5 incremental chunks — the aggregation must fold
    // incrementally to the same totals the batch plan computes at once
    events.grouped(math.max(1, events.length / 5)).foreach { chunk =>
      input.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    q.stop()

    val streamed = spark.table("replay")
      .select(col("hour"), col("event_type"), col("n"),
        round(col("total_value"), 2).as("tv"))
      .as[(Timestamp, String, Long, Double)].collect().toSet
    val batch = graft.Tables.load(spark, sf(), "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("tv"))
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(streamed == batch)
  }

  test("purchaseAttribution: stream-stream interval join, batch symmetric") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 0.0),
      (2L, ts("2024-01-01 10:20:00"), 7L, "click", 0.0),
      (3L, ts("2024-01-01 10:25:00"), 7L, "purchase", 9.0), // joins 1 + 2
      (4L, ts("2024-01-01 09:40:00"), 8L, "click", 0.0),
      (5L, ts("2024-01-01 10:30:00"), 8L, "purchase", 5.0), // 4 outside 30m
      (6L, ts("2024-01-01 10:29:00"), 9L, "click", 0.0),    // other user
      (7L, ts("2024-01-01 11:00:00"), 7L, "purchase", 1.0)) // 1,2 outside
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = input.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventsStream.purchaseAttribution(events, lookbackMinutes = 30)
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    input.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("attrib")
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    assert(streamed == Set((3L, 1L), (3L, 2L)),
      "only in-window same-user clicks attribute")
    // batch/stream symmetry: identical rows from the same code on a
    // batch frame (watermarks no-op, plain range join)
    val batch = EventsStream.purchaseAttribution(
        rows.toDF("event_id", "ts", "user_id", "event_type", "value"), 30)
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    assert(batch == streamed)
  }

  test("nearDupDedupStream: reordered near-identical texts dedup in-flight") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val corpus = Seq(
      (1L, ts("2024-01-01 10:00:00"), "breaking news alpha beta gamma delta"),
      // same word MULTISET, reordered — an exact-key dedup keeps it,
      // the simhash signature drops it
      (2L, ts("2024-01-01 10:01:00"), "delta gamma beta alpha breaking news"),
      (3L, ts("2024-01-01 10:02:00"), "breaking news alpha beta gamma delta"),
      (4L, ts("2024-01-01 10:03:00"), "an entirely different story about spark plans"))
    val input = MemoryStream[(Long, Timestamp, String)]
    val events = input.toDF().toDF("event_id", "ts", "text")
    val q = EventsStream.nearDupDedupStream(events, "text")
      .writeStream.format("memory").queryName("near_deduped")
      .outputMode("append").start()
    // one micro-batch per event so "first arrival survives" is pinned
    corpus.foreach { e => input.addData(e); q.processAllAvailable() }
    q.stop()
    val got = spark.table("near_deduped")
      .select("event_id").as[Long].collect().toSeq.sorted
    assert(got == Seq(1L, 4L),
      "first arrival per signature class must survive, all others drop")

    // batch/stream symmetry over the SHIPPED key expression: a batch
    // groupBy on graft_simhash_tok partitions the same corpus into the
    // same (signature, token count) classes with the same survivors
    val st = org.apache.spark.sql.graft.bridge.column(
      graft.functions.SimHashTok(
        org.apache.spark.sql.graft.bridge.expression(col("text"))))
    val batchKeep = corpus.toDF("event_id", "ts", "text")
      .groupBy(st.getField("sig"), st.getField("ntok"))
      .agg(min(col("event_id")).as("keep"))
      .select("keep").as[Long].collect().toSeq.sorted
    assert(batchKeep == got)
  }

  test("dedupStream drops same-key events within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, Timestamp)]
    val events = input.toDF().toDF("fp", "ts")
    val q = EventsStream.dedupStream(events, "fp")
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    input.addData(("a", ts("2024-01-01 10:00:00")),
      ("a", ts("2024-01-01 10:05:00")),
      ("b", ts("2024-01-01 10:06:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("deduped").select("fp").as[String].collect().toSeq
    assert(got.sorted == Seq("a", "b"))
  }

  test("CurateStream: two micro-batches equal the chained batch composition") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.apps.Curate
    import graft.dedup.SimilarityMethod
    val dir = java.nio.file.Files.createTempDirectory("graft-curate-stream").toFile
    try {
      val m = SimilarityMethod.MinHashLsh(minJaccard = 0.6)
      // batch 1: a near-dup pair (keep 1), a singleton, an exact dup
      val tA = "the quick brown fox jumps over the lazy dog again and again today"
      val tB = "an entirely different document all about spark shuffle partitions here"
      val b1 = Seq(1L -> tA, 2L -> (tA + " ok"), 3L -> tB, 4L -> tA)
      // batch 2: near-dup of the standing corpus (drop), exact dup of
      // corpus (drop), fresh family (keep min), fresh singleton (keep)
      val tE = "a brand new batch family document describing minhash banded candidates"
      val b2 = Seq(11L -> (tA + " yes"), 12L -> tB, 13L -> tE,
        14L -> (tE + " ok"), 15L -> "one genuinely novel streaming document here today")
      val reports = scala.collection.mutable.Map.empty[Long, Curate.Report]
      val input = MemoryStream[(Long, String)]
      val q = CurateStream.start(input.toDF().toDF("doc_id", "text"),
        "doc_id", "text", dir.getAbsolutePath, minQuality = 0.0, method = m,
        onBatch = (id, r) => reports.synchronized { reports(id) = r })
      try {
        input.addData(b1: _*)
        q.processAllAvailable()
        input.addData(b2: _*)
        q.processAllAvailable()
      } finally q.stop()

      // the streamed standing corpus == the hand-chained batch
      // composition runIncremental(b1, ∅) then runIncremental(b2, c1)
      val empty = b1.toDF("doc_id", "text").limit(0)
      val (a1, _) = Curate.runIncremental(b1.toDF("doc_id", "text"), empty,
        "doc_id", "text", 0.0, m, log = _ => ())
      val (a2, _) = Curate.runIncremental(b2.toDF("doc_id", "text"), a1,
        "doc_id", "text", 0.0, m, log = _ => ())
      val want = (a1.select("doc_id").collect() ++ a2.select("doc_id").collect())
        .map(_.getLong(0)).toSet
      val corpus = spark.read.parquet(
        new java.io.File(dir, "corpus").listFiles().map(_.getAbsolutePath).toIndexedSeq: _*)
      val got = corpus.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == want, s"stream=$got batch-chain=$want")
      assert(got == Set(1L, 3L, 13L, 15L))

      // per-batch reports walked the stages
      assert(reports(0L).input == 4 && reports(1L).input == 5)
      // state growth is bounded by ACCEPTANCES: artifact rows == kept
      // rows per batch, rejected rows leave zero state
      val sigs = spark.read.parquet(
        new java.io.File(dir, "sigs").listFiles().map(_.getAbsolutePath).toIndexedSeq: _*)
      val fps = spark.read.parquet(
        new java.io.File(dir, "fps").listFiles().map(_.getAbsolutePath).toIndexedSeq: _*)
      assert(sigs.count() == got.size && fps.count() == got.size)

      // foreachBatch replay idempotence: re-running batch 1 overwrites
      // its own subdirectory instead of double-appending acceptances
      CurateStream.processBatch(b1.toDF("doc_id", "text"), 0L, "doc_id",
        "text", dir.getAbsolutePath, 0.0, m, (_, _) => ())
      val afterReplay = spark.read.parquet(
        new java.io.File(dir, "corpus").listFiles().map(_.getAbsolutePath).toIndexedSeq: _*)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(afterReplay == got, "replay must be idempotent")
      a1.unpersist(); a2.unpersist()
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("CurateStream.compact folds acceptance state; the next batch " +
      "curates identically to an uncompacted twin") {
    import spark.implicits._
    import graft.dedup.SimilarityMethod
    val a = java.nio.file.Files.createTempDirectory("curcompact-a").toString
    val b = java.nio.file.Files.createTempDirectory("curcompact-b").toString
    val m = SimilarityMethod.MinHashLsh(minJaccard = 0.6)
    val t1 = "the quick brown fox jumps over the lazy dog again and again today"
    val t2 = "an entirely different document all about spark shuffle partitions here"
    val t3 = "a brand new batch family document describing minhash banded candidates"
    def run(d: String, id: Long, rows: Seq[(Long, String)]): Unit =
      CurateStream.processBatch(rows.toDF("doc_id", "text"), id,
        "doc_id", "text", d, 0.0, m, (_, _) => ())
    def corpusIds(d: String) = spark.read.parquet(
        new java.io.File(d, "corpus").listFiles()
          .map(_.getAbsolutePath).toIndexedSeq: _*)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    Seq(a, b).foreach { d =>
      run(d, 0L, Seq(1L -> t1, 2L -> t2))
      run(d, 1L, Seq(11L -> (t1 + " ok"), 12L -> t3))
    }
    CurateStream.compact(spark, a)
    assert(corpusIds(a) == corpusIds(b), "compact changed the corpus")
    val subdirs = new java.io.File(a, "corpus").listFiles()
      .map(_.getName).sorted.toSeq
    assert(subdirs.count(_.startsWith("c")) == 1, s"not folded: $subdirs")
    // post-compact: a near-dup of FOLDED corpus content must still drop
    // (the snapshot serves the sigs/fps probes like the b-dirs did)
    Seq(a, b).foreach(d => run(d, 2L, Seq(21L -> (t3 + " yes"),
      22L -> "one genuinely novel streaming document here today")))
    assert(corpusIds(a) == corpusIds(b))
    assert(corpusIds(a).contains(22L) && !corpusIds(a).contains(21L),
      s"post-compact curation diverged: ${corpusIds(a)}")
  }

  test("CurateEmbeddingStream: two micro-batches equal the chained " +
      "batch composition, with per-batch audit") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.apps.Curate
    import graft.dedup.SimilarityMethod
    val dir = java.nio.file.Files.createTempDirectory("embstream").toString
    val m = SimilarityMethod.EmbeddingCosine(minCos = 0.95, numCells = 4)
    // batch 1: near pair (keep 1), orthogonal singleton
    val b1 = Seq(1L -> Seq(1.0f, 0.0f), 2L -> Seq(0.999f, 0.0447f),
      3L -> Seq(0.0f, 1.0f))
    // batch 2: exact dup of standing 1, near of standing 3, novel,
    // invalid (NaN)
    val b2 = Seq(11L -> Seq(1.0f, 0.0f), 12L -> Seq(0.0447f, 0.999f),
      13L -> Seq(-1.0f, 0.0f), 14L -> Seq(Float.NaN, 1.0f))
    val input = MemoryStream[(Long, Seq[Float])]
    val q = CurateEmbeddingStream.start(
      input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      dir, m, keepLedger = true)
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    // streamed corpus == hand-chained runIncrementalEmbedding calls
    val empty = b1.toDF("vec_id", "embedding").limit(0)
    val (a1, _) = Curate.runIncrementalEmbedding(
      b1.toDF("vec_id", "embedding"), empty, "vec_id", "embedding", m,
      log = _ => ())
    val (a2, _) = Curate.runIncrementalEmbedding(
      b2.toDF("vec_id", "embedding"), a1, "vec_id", "embedding", m,
      log = _ => ())
    val want = (a1.select("vec_id").collect() ++ a2.select("vec_id").collect())
      .map(_.getLong(0)).toSet
    val got = spark.read.parquet(
        new java.io.File(dir, "corpus").listFiles()
          .map(_.getAbsolutePath).toIndexedSeq: _*)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got == want && got == Set(1L, 3L, 13L), s"stream=$got want=$want")
    // per-batch audit: batch 1 drops only the near twin; batch 2
    // explains all three rejects against the STANDING corpus
    def ledgerOf(id: Long) = spark.read.parquet(s"$dir/ledger/b$id")
      .select(col("vec_id"), col("stage"), col("reason"), col("winner_id"))
      .as[(Long, String, String, Option[Long])].collect().sortBy(_._1).toSeq
    assert(ledgerOf(0L) == Seq((2L, "near", "near_duplicate", Some(1L))))
    assert(ledgerOf(1L) == Seq(
      (11L, "exact", "duplicate_of_corpus", None),
      (12L, "near", "near_duplicate_of_corpus", Some(3L)),
      (14L, "validity", "invalid_vector", None)), s"b1: ${ledgerOf(1L)}")
    a1.unpersist(); a2.unpersist()
  }

  test("CurateMediaStream: dedup against folded state, zero corpus " +
      "decodes via stored sigs, compaction twin-equal") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.multimodal.Multimodal
    val a = java.nio.file.Files.createTempDirectory("medstream-a").toString
    val b = java.nio.file.Files.createTempDirectory("medstream-b").toString
    val p1 = Multimodal.synthGridImage(50L, 0)
    val p2 = Multimodal.synthGridImage(70L, 0)
    val p3 = Multimodal.synthGridImage(80L, 0)
    def run(d: String, id: Long, rows: Seq[(Long, Array[Byte])]): Unit =
      CurateMediaStream.processBatch(rows.toDF("media_id", "payload"), id,
        "media_id", "payload", d,
        graft.dedup.SimilarityMethod.ImageDHash(), (_, _) => (),
        keepLedger = true)
    def corpusIds(d: String) = spark.read.parquet(
        new java.io.File(d, "corpus").listFiles()
          .map(_.getAbsolutePath).toIndexedSeq: _*)
      .select("media_id").collect().map(_.getLong(0)).toSet
    Seq(a, b).foreach { d =>
      run(d, 0L, Seq(1L -> p1, 2L -> p2))
      // exact copy of standing 1, brightness near of standing 2, novel
      run(d, 1L, Seq(11L -> p1,
        12L -> Multimodal.synthGridImage(70L, 1), 13L -> p3))
    }
    assert(corpusIds(a) == Set(1L, 2L, 13L))
    val led = spark.read.parquet(s"$a/ledger/b1")
      .select(col("media_id"), col("stage"), col("reason"), col("winner_id"))
      .as[(Long, String, String, Option[Long])].collect().sortBy(_._1).toSeq
    assert(led == Seq(
      (11L, "exact", "duplicate_of_corpus", None),
      (12L, "near", "near_duplicate_of_corpus", Some(2L))), s"ledger: $led")
    // compact one twin; the next batch must curate identically
    CurateMediaStream.compact(spark, a)
    Seq(a, b).foreach(d => run(d, 2L, Seq(
      21L -> Multimodal.synthGridImage(80L, 1), // near of folded 13
      22L -> Multimodal.synthGridImage(90L, 0))))
    assert(corpusIds(a) == corpusIds(b))
    assert(corpusIds(a).contains(22L) && !corpusIds(a).contains(21L),
      s"post-compact media curation diverged: ${corpusIds(a)}")
  }

  test("CurateStream token budget: admit-until-exhausted across " +
      "micro-batches equals the chained budget composition; spend " +
      "registry is replay-safe and compacts") {
    import spark.implicits._
    import graft.apps.Curate
    import graft.dedup.SimilarityMethod
    import graft.ops.Sampling
    val dir = java.nio.file.Files.createTempDirectory("curbudget").toString
    val m = SimilarityMethod.MinHashLsh(minJaccard = 0.6)
    def doc(tag: String, n: Int): String =
      (1 to n).map(i => s"${tag}w$i").mkString(" ")
    // batch 1 tokens 30/20/10, budget 55: prefix keeps {1, 2} (50)
    val b1 = Seq(1L -> doc("a", 30), 2L -> doc("b", 20), 3L -> doc("c", 10))
    // batch 2 tokens 4/3/2 into the remaining headroom 5: keeps {11}
    val b2 = Seq(11L -> doc("d", 4), 12L -> doc("e", 3), 13L -> doc("f", 2))
    val budget = 55L
    def run(id: Long, rows: Seq[(Long, String)]): Unit =
      CurateStream.processBatch(rows.toDF("doc_id", "text"), id,
        "doc_id", "text", dir, 0.0, m, (_, _) => (), keepLedger = true,
        tokenBudget = budget)
    run(0L, b1)
    run(1L, b2)
    def corpusIds() = spark.read.parquet(
        new java.io.File(dir, "corpus").listFiles()
          .map(_.getAbsolutePath).toIndexedSeq: _*)
      .select("doc_id").as[Long].collect().toSet
    assert(corpusIds() == Set(1L, 2L, 11L))
    // the stream == the hand-chained incremental + budget composition
    val empty = b1.toDF("doc_id", "text").limit(0)
    def budgeted(df: org.apache.spark.sql.DataFrame, b: Long) =
      Sampling.tokenBudgetSelect(
          df.withColumn("_n", graft.text.TextOps.tokenCount(col("text"))),
          "doc_id", "_n", "_n", b, log = _ => ())
        .drop("_n")
    val (r1, _) = Curate.runIncremental(b1.toDF("doc_id", "text"), empty,
      "doc_id", "text", 0.0, m, log = _ => ())
    val a1 = budgeted(r1, budget)
    val spent1 = a1.agg(coalesce(sum(
      graft.text.TextOps.tokenCount(col("text"))), lit(0L)))
      .head().getLong(0)
    val (r2, _) = Curate.runIncremental(b2.toDF("doc_id", "text"), a1,
      "doc_id", "text", 0.0, m, log = _ => ())
    val a2 = budgeted(r2, budget - spent1)
    val want = (a1.select("doc_id").as[Long].collect() ++
      a2.select("doc_id").as[Long].collect()).toSet
    assert(corpusIds() == want, s"stream=${corpusIds()} chain=$want")
    // budget drops are ledgered (quota / token_budget, no winner)
    def ledgerOf(id: Long) = spark.read.parquet(s"$dir/ledger/b$id")
      .select(col("doc_id"), col("stage"), col("reason"), col("winner_id"))
      .as[(Long, String, String, Option[Long])].collect().sortBy(_._1).toSeq
    assert(ledgerOf(0L) == Seq((3L, "quota", "token_budget", None)))
    assert(ledgerOf(1L) == Seq(
      (12L, "quota", "token_budget", None),
      (13L, "quota", "token_budget", None)))
    // spend registry totals the admitted tokens
    val spend = spark.read.parquet(
        new java.io.File(dir, "spend").listFiles()
          .map(_.getAbsolutePath).toIndexedSeq: _*)
      .agg(sum(col("tokens"))).head().getLong(0)
    assert(spend == 54L, s"spend=$spend")
    // replay of batch 1 is idempotent for corpus, ledger AND spend
    run(0L, b1)
    assert(corpusIds() == want)
    assert(ledgerOf(0L).size == 1)
    // compaction folds the spend registry; the next trigger still sees
    // the full cumulative total (nothing re-admitted)
    CurateStream.compact(spark, dir)
    run(1L, b2)
    assert(corpusIds() == want, "post-compact replay must admit identically")
    r1.unpersist(); r2.unpersist()
  }

  test("CurateMediaStream byte budget: admit-until-exhausted across " +
      "micro-batches equals the chained budget composition; spend " +
      "registry replay-safe and compacts") {
    import spark.implicits._
    import graft.apps.Curate
    import graft.multimodal.Multimodal
    import graft.ops.Sampling
    val dir = java.nio.file.Files.createTempDirectory("medbudget").toString
    val m = graft.dedup.SimilarityMethod.ImageDHash()
    val (p1, p2, p3) = (Multimodal.synthGridImage(50L, 0),
      Multimodal.synthGridImage(70L, 0), Multimodal.synthGridImage(80L, 0))
    // budget: batch 0's byte-richest prefix keeps exactly ONE of the
    // two distinct images; batch 1's novel image exceeds the headroom
    val big = math.max(p1.length, p2.length).toLong
    val budget = big + math.min(p1.length, p2.length) - 1L
    def run(id: Long, rows: Seq[(Long, Array[Byte])]): Unit =
      CurateMediaStream.processBatch(rows.toDF("media_id", "payload"), id,
        "media_id", "payload", dir, m, (_, _) => (), keepLedger = true,
        byteBudget = budget)
    run(0L, Seq(1L -> p1, 2L -> p2))
    run(1L, Seq(13L -> p3))
    def corpusIds() = spark.read.parquet(
        new java.io.File(dir, "corpus").listFiles()
          .map(_.getAbsolutePath).toIndexedSeq: _*)
      .select("media_id").as[Long].collect().toSet
    // the stream == the hand-chained incremental + byte-budget chain
    def budgeted(df: org.apache.spark.sql.DataFrame, b: Long) =
      Sampling.tokenBudgetSelect(
          df.withColumn("_n", octet_length(col("payload")).cast("long")),
          "media_id", "_n", "_n", b, log = _ => ())
        .drop("_n")
    val empty = Seq.empty[(Long, Array[Byte])]
      .toDF("media_id", "payload")
    val (r1, _) = Curate.runIncrementalMedia(
      Seq(1L -> p1, 2L -> p2).toDF("media_id", "payload"), empty,
      "media_id", "payload", m, log = _ => ())
    val a1 = budgeted(r1, budget)
    val spent1 = a1.agg(coalesce(sum(octet_length(col("payload"))
      .cast("long")), lit(0L))).head().getLong(0)
    val (r2, _) = Curate.runIncrementalMedia(
      Seq(13L -> p3).toDF("media_id", "payload"), a1,
      "media_id", "payload", m, log = _ => ())
    val a2 = budgeted(r2, budget - spent1)
    val want = (a1.select("media_id").as[Long].collect() ++
      a2.select("media_id").as[Long].collect()).toSet
    assert(corpusIds() == want, s"stream=${corpusIds()} chain=$want")
    assert(want.size == 1 && (want == Set(1L) || want == Set(2L)))
    // budget drops ledgered (quota / byte_budget, no winner)
    def ledgerOf(id: Long) = spark.read.parquet(s"$dir/ledger/b$id")
      .select(col("media_id"), col("stage"), col("reason"), col("winner_id"))
      .as[(Long, String, String, Option[Long])].collect().sortBy(_._1).toSeq
    assert(ledgerOf(0L).exists(r =>
      r._2 == "quota" && r._3 == "byte_budget" && r._4.isEmpty))
    assert(ledgerOf(1L) == Seq((13L, "quota", "byte_budget", None)),
      s"b1: ${ledgerOf(1L)}")
    // spend registry totals the admitted bytes
    val spend = spark.read.parquet(
        new java.io.File(dir, "spend").listFiles()
          .map(_.getAbsolutePath).toIndexedSeq: _*)
      .agg(sum(col("spend"))).head().getLong(0)
    assert(spend == big, s"spend=$spend want=$big")
    // replay of batch 0 idempotent; compaction preserves the total
    run(0L, Seq(1L -> p1, 2L -> p2))
    assert(corpusIds() == want)
    CurateMediaStream.compact(spark, dir)
    run(1L, Seq(13L -> p3))
    assert(corpusIds() == want, "post-compact replay must admit identically")
    r1.unpersist(); r2.unpersist()
  }

  test("CurateEmbeddingStream vector budget: count-capped admission " +
      "across micro-batches, ledgered, replay- and compaction-safe") {
    import spark.implicits._
    import graft.dedup.SimilarityMethod
    val dir = java.nio.file.Files.createTempDirectory("embbudget").toString
    val m = SimilarityMethod.EmbeddingCosine(minCos = 0.95, numCells = 2)
    // all orthogonal-ish — every vector passes curation; the budget
    // is the only dropper. vecBudget 3: batch 0 admits both, batch 1
    // admits the id-smallest of its two acceptances
    val b1 = Seq(1L -> Seq(1.0f, 0.0f, 0.0f), 2L -> Seq(0.0f, 1.0f, 0.0f))
    val b2 = Seq(11L -> Seq(0.0f, 0.0f, 1.0f),
      12L -> Seq(-1.0f, 0.0f, 0.0f), 13L -> Seq(0.0f, -1.0f, 0.0f))
    def run(id: Long, rows: Seq[(Long, Seq[Float])]): Unit =
      CurateEmbeddingStream.processBatch(rows.toDF("vec_id", "embedding"),
        id, "vec_id", "embedding", dir, m, (_, _) => (),
        keepLedger = true, vecBudget = 3L)
    run(0L, b1)
    run(1L, b2)
    def corpusIds() = spark.read.parquet(
        new java.io.File(dir, "corpus").listFiles()
          .map(_.getAbsolutePath).toIndexedSeq: _*)
      .select("vec_id").as[Long].collect().toSet
    assert(corpusIds() == Set(1L, 2L, 11L), s"got ${corpusIds()}")
    def ledgerOf(id: Long) = spark.read.parquet(s"$dir/ledger/b$id")
      .select(col("vec_id"), col("stage"), col("reason"), col("winner_id"))
      .as[(Long, String, String, Option[Long])].collect().sortBy(_._1).toSeq
    assert(ledgerOf(0L).isEmpty)
    assert(ledgerOf(1L) == Seq(
      (12L, "quota", "vec_budget", None),
      (13L, "quota", "vec_budget", None)), s"b1: ${ledgerOf(1L)}")
    val spend = spark.read.parquet(
        new java.io.File(dir, "spend").listFiles()
          .map(_.getAbsolutePath).toIndexedSeq: _*)
      .agg(sum(col("spend"))).head().getLong(0)
    assert(spend == 3L, s"spend=$spend")
    // replay + compaction idempotence
    run(1L, b2)
    assert(corpusIds() == Set(1L, 2L, 11L))
    CurateEmbeddingStream.compact(spark, dir)
    run(1L, b2)
    assert(corpusIds() == Set(1L, 2L, 11L),
      "post-compact replay must admit identically")
  }

  test("CurateStream ledger: per-batch drop audit subdirs, replay " +
      "overwrites, audit disjoint from acceptances") {
    import spark.implicits._
    import graft.dedup.SimilarityMethod
    val dir = java.nio.file.Files.createTempDirectory("curledger").toString
    val m = SimilarityMethod.MinHashLsh(minJaccard = 0.6)
    val t1 = "the quick brown fox jumps over the lazy dog again and again today"
    val t2 = "a brand new batch family document describing minhash banded candidates"
    def run(id: Long, rows: Seq[(Long, String)]): Unit =
      CurateStream.processBatch(rows.toDF("doc_id", "text"), id,
        "doc_id", "text", dir, 0.0, m, (_, _) => (), keepLedger = true)
    run(0L, Seq(1L -> t1, 2L -> (t1 + " ok"), 3L -> t2))
    run(1L, Seq(11L -> (t2 + " yes"), 12L -> t1,
      13L -> "one genuinely novel streaming document here today"))
    def ledgerOf(id: Long) = spark.read.parquet(s"$dir/ledger/b$id")
      .select(col("doc_id"), col("stage"), col("reason"), col("winner_id"))
      .as[(Long, String, String, Option[Long])].collect().sortBy(_._1).toSeq
    // batch 0 bootstraps on an empty corpus: 2 near-dups 1 in-batch
    assert(ledgerOf(0L) == Seq((2L, "near", "near_duplicate", Some(1L))))
    // batch 1: 11 near-dups STANDING doc 3 (corpus-attributed winner),
    // 12 is an exact copy of standing doc 1 (fp table has no ids)
    assert(ledgerOf(1L) == Seq(
      (11L, "near", "near_duplicate_of_corpus", Some(3L)),
      (12L, "exact", "duplicate_of_corpus", None)))
    // audit rows never overlap acceptances
    val corpus = spark.read.parquet(
      new java.io.File(dir, "corpus").listFiles()
        .map(_.getAbsolutePath).toIndexedSeq: _*)
    assert(corpus.join(spark.read.parquet(s"$dir/ledger/b0")
        .unionByName(spark.read.parquet(s"$dir/ledger/b1")),
      Seq("doc_id"), "left_semi").count() == 0)
    // replay of batch 1 overwrites its own ledger subdir (idempotent)
    run(1L, Seq(11L -> (t2 + " yes"), 12L -> t1,
      13L -> "one genuinely novel streaming document here today"))
    assert(ledgerOf(1L).size == 2, "replay must not double-append audit rows")
  }
}
