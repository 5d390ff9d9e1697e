package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r20 optimization scratch harness: times named ALTERNATIVE
  * implementations of gate computations head-to-head (noop sink,
  * min-of-N) so path-swap decisions are made on measurements, not
  * guesses. Not part of the engine surface. */
object OptProbe {

  private def time(spark: SparkSession, fn: => DataFrame): Double = {
    spark.catalog.clearCache()
    val t0 = System.nanoTime()
    fn.write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val reps = sys.env.getOrElse("OPT_PROBE_REPS", "3").toInt
    val spark = GraftSession.build("graft-optprobe", s"local[$cpus]")
    spark.sparkContext.setLogLevel("ERROR")
    def T(n: String) = Tables.load(spark, sfDir, n)

    val docs = T("documents")

    // ---- unigram: expression path vs mapPartitions twin -------------
    val vocab = graft.text.Unigram.trainUnigram(
      docs.filter(col("doc_id") % 2 === 0), "text",
      vocabSize = 40, maxPieceLen = 4, seedMulti = 48, emIters = 1)
    val odd = docs.filter(col("doc_id") % 2 === 1)

    def uniExpr() = graft.text.Unigram.withUnigramTokensExpr(
      odd, "doc_id", "text", vocab).orderBy(col("doc_id"), col("pos"))
    def uniPart() = graft.text.Unigram.withUnigramTokensPartitioned(
      odd, "doc_id", "text", vocab).orderBy(col("doc_id"), col("pos"))

    // ---- decontaminate: probe join vs per-row mapPartitions ---------
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val bench = docs.filter(col("doc_id") % 2 === 1 && col("doc_id") % 7 === 0)
    def decJoin() = graft.text.Decontaminate.contaminationReport(
      corpus, bench, "doc_id", "text", n = 3).orderBy(col("doc_id"))
    def decRow() = graft.text.Decontaminate.withContamination(
      corpus, "doc_id", "text", bench, n = 3).orderBy(col("doc_id"))

    // ---- policy/repetition: composed twins vs the one-pass scan -----
    def polJoined() = graft.text.FilterPolicy.applyJoined(
      docs, "doc_id", "text").orderBy(col("doc_id"))
    def polOnePass() = graft.text.FilterPolicy(
      docs, "doc_id", "text").orderBy(col("doc_id"))
    def polRowHof() = graft.text.FilterPolicy.withDecisionComposed(
      docs, "doc_id", "text").orderBy(col("doc_id"))
    def repAgg() = graft.text.TextOps.repetitionStatsAgg(
      docs, "doc_id", "text").orderBy(col("doc_id"))
    def repOnePass() = graft.text.TextOps.repetitionStats(
      docs, "doc_id", "text").orderBy(col("doc_id"))

    // ---- auto-embedding pairs: vectors-through-cell-join vs the
    // pre-r20 late-fetch candidate shape (q64/q71/q72 near stages) ----
    val embAll = T("embeddings")
    def embCell() = {
      val out = graft.dedup.SimilarJoin.similarJoin(embAll, "vec_id",
        "embedding",
        graft.dedup.SimilarityMethod.EmbeddingCosine(0.4, numCells = 16))
      out.unpersist()
      out
    }
    def embLate() = {
      val out = graft.dedup.SimilarJoin.autoEmbeddingPairsLateFetch(embAll,
        "vec_id", "embedding", 0.4, 16, 1, graft.dedup.Dedup.defaultMaxBucket)
      out.unpersist()
      out
    }

    // ---- span scrub: interval rebuild vs exploded anti-join twin ----
    def spanIv() = graft.text.SpanDedup.removeDuplicatedSpans(
      docs, "doc_id", "text", n = 4).orderBy(col("doc_id"))
    def spanExpl() = graft.text.SpanDedup.removeDuplicatedSpansExploded(
      docs, "doc_id", "text", n = 4).orderBy(col("doc_id"))

    // ---- dupClusters: driver union-find tier vs distributed loop ----
    def clustersOf(maxEdges: String): DataFrame = {
      spark.conf.set("spark.graft.clusters.localMaxEdges", maxEdges)
      try {
        val pairs = graft.dedup.Dedup.lshNearDupPairs(
          docs, "doc_id", "text", nGram = 3, bands = 4, minJaccard = 0.6)
        val out = graft.dedup.Dedup.dupClusters(pairs)
          .orderBy(org.apache.spark.sql.functions.col("id"))
        pairs.unpersist()
        out
      } finally spark.conf.unset("spark.graft.clusters.localMaxEdges")
    }
    def cluLocal() = clustersOf("500000")
    def cluLoop() = clustersOf("0")

    val cases: Seq[(String, () => DataFrame)] = Seq(
      "clu_local" -> (cluLocal _),
      "clu_loop" -> (cluLoop _),
      "span_iv" -> (spanIv _),
      "span_expl" -> (spanExpl _),
      "emb_cell" -> (embCell _),
      "emb_late" -> (embLate _),
      "uni_expr" -> (uniExpr _),
      "uni_part" -> (uniPart _),
      "dec_join" -> (decJoin _),
      "dec_row" -> (decRow _),
      "pol_joined" -> (polJoined _),
      "pol_onepass" -> (polOnePass _),
      "pol_rowhof" -> (polRowHof _),
      "rep_agg" -> (repAgg _),
      "rep_onepass" -> (repOnePass _))

    if (sys.env.contains("OPT_PROBE_STAGELOG"))
      spark.conf.set(graft.ops.StageCut.LogKey, "true")
    // OPT_PROBE_CONF="k=v;k=v" — arbitrary session confs for A/B runs
    sys.env.get("OPT_PROBE_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      })

    // ---- pipeline stage timing: the gate builds with a timestamped
    // log, so the delta between [t=..] lines is each stage's cost ----
    def timedLog(): String => Unit = {
      val t0 = System.nanoTime()
      m => println(f"[t=${(System.nanoTime() - t0) / 1e9}%7.3f] $m")
    }
    if (args.contains("prep_stages")) {
      val (corpus, bench) = SparkEntry.prepCorpusInput(spark, sfDir)
      val t = graft.apps.PretrainPrep.runTracked(
        corpus, "doc_id", "text", "source", bench = Some(bench),
        badWords = Seq("dup"), spanN = 4, spanMinDocs = 3,
        method = graft.dedup.SimilarityMethod.MinHashLsh(minJaccard = 0.6),
        decontamN = 5, quotaPerSource = 15, nShards = 4, seed = 7,
        keepArtifacts = true, keepLedger = true, log = timedLog())
      println(f"[t=done] prep_stages")
      graft.ops.StageCut.release(t.out)
      t.ledger.foreach(graft.ops.StageCut.release)
      t.artifacts.foreach(a => graft.ops.StageCut.release(a.scrubInput))
    }
    if (args.contains("curate_stages")) {
      val docsAll = T("documents")
      val method = graft.dedup.SimilarityMethod.MinHashLsh(minJaccard = 0.6)
      val lg = timedLog()
      val (corpus, _) = graft.apps.Curate.run(
        docsAll.filter(col("doc_id") % 2 === 0), "doc_id", "text",
        minQuality = 0.6, method = method, log = lg)
      lg("=== corpus built, incremental starts ===")
      val (accepted, _, ledger) = graft.apps.Curate.runIncrementalTracked(
        docsAll.filter(col("doc_id") % 2 === 1), corpus, "doc_id", "text",
        minQuality = 0.6, method = method, log = lg)
      println(f"[t=done] curate_stages")
      graft.ops.StageCut.release(corpus)
      graft.ops.StageCut.release(accepted)
      graft.ops.StageCut.release(ledger)
    }
    if (args.contains("inc_near_pieces")) {
      // q70's incremental near stage, piece by piece: batch pairs,
      // cross pairs, component pass, final assembly
      val docsAll = T("documents")
      val method = graft.dedup.SimilarityMethod.MinHashLsh(minJaccard = 0.6)
      val (corpus, _) = graft.apps.Curate.run(
        docsAll.filter(col("doc_id") % 2 === 0), "doc_id", "text",
        minQuality = 0.6, method = method, log = _ => ())
      val batch = docsAll.filter(col("doc_id") % 2 === 1)
        .transform(graft.text.TextOps.withQualityScore(_, "text", "quality"))
        .filter(col("quality") >= 0.6).drop("quality")
        .transform(graft.ops.StageCut.apply)
      batch.count()
      val lg = timedLog()
      lg("start")
      val bp = graft.dedup.SimilarJoin.similarJoin(batch, "doc_id", "text", method)
      bp.count(); lg(s"batch pairs")
      val cp = graft.dedup.SimilarJoin.similarJoinAgainst(batch, corpus,
        "doc_id", "text", method)
      cp.count(); lg(s"cross pairs")
      val edges = bp.select(col("id_a"), col("id_b"))
        .unionByName(cp.select(col("id_a"), col("id_b")))
      val cl = graft.dedup.Dedup.dupClusters(edges)
      cl.count(); lg(s"components")
      bp.unpersist(); cp.unpersist()
      graft.ops.StageCut.release(corpus)
      graft.ops.StageCut.release(batch)
      println("[t=done] inc_near_pieces")
    }
    if (args.contains("prep_inc_stages")) {
      // the q129 daily-run shape with a timestamped log
      val (corpus0, bench) = SparkEntry.prepCorpusInput(spark, sfDir)
      val t = graft.apps.PretrainPrep.runTracked(
        corpus0, "doc_id", "text", "source", bench = Some(bench),
        badWords = Seq("dup"), spanN = 4, spanMinDocs = 3,
        method = graft.dedup.SimilarityMethod.MinHashLsh(minJaccard = 0.6),
        decontamN = 5, quotaPerSource = 15, nShards = 4, seed = 7,
        keepArtifacts = true, keepLedger = false, log = _ => ())
      val (corpus, arts) = (t.out, t.artifacts.get)
      val sigs = graft.dedup.Dedup.lshSignatures(
        corpus.select(col("doc_id"), col("clean_text").as("text")),
        "doc_id", "text", nGram = 3, bands = 4)
      val lg = timedLog()
      lg("daily run starts (corpus built untimed)")
      val docsAll = T("documents")
      val (out, _) = graft.apps.PretrainPrep.runIncremental(
        SparkEntry.prepGateBatch(docsAll), corpus, arts.fps, arts.gramCounts,
        "doc_id", "text", "source",
        bench = Some(docsAll.filter(col("doc_id") % 2 === 1 &&
          col("doc_id") % 7 === 0)),
        badWords = Seq("dup"), spanN = 4, spanMinDocs = 3,
        method = graft.dedup.SimilarityMethod.MinHashLsh(minJaccard = 0.6),
        corpusSigs = Some(sigs), decontamN = 5, quotaPerSource = 18,
        nShards = 4, seed = 7, log = lg)
      out.count()
      println("[t=done] prep_inc_stages")
      graft.ops.StageCut.release(out)
      graft.ops.StageCut.release(t.out)
      t.artifacts.foreach(a => graft.ops.StageCut.release(a.scrubInput))
    }
    if (args.contains("emb_stages")) {
      val emb = T("embeddings")
      val method = graft.dedup.SimilarityMethod.EmbeddingCosine(0.4, numCells = 16)
      val lg = timedLog()
      val (corpus, _) = graft.apps.Curate.runEmbedding(
        emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
        method, log = lg)
      lg("=== corpus built, incremental starts ===")
      val (accepted, _, ledger) = graft.apps.Curate.runIncrementalEmbeddingTracked(
        emb.filter(col("vec_id") % 2 === 1), corpus, "vec_id", "embedding",
        method, log = lg)
      println(f"[t=done] emb_stages")
      graft.ops.StageCut.release(corpus)
      graft.ops.StageCut.release(accepted)
      graft.ops.StageCut.release(ledger)
    }

    // any declared gate runs by name too (stageCutLog + reps timing —
    // the pipeline-boundary instrumentation loop)
    val gateCases: Seq[(String, () => DataFrame)] =
      args.toSeq.filter(SparkEntry.queries.contains).map(n =>
        n -> (() => SparkEntry.queries(n)(spark, sfDir)))

    // OPT_PROBE_JOBS=1: run each selected case ONCE with a job-level
    // listener — every Spark job's callsite + wall ms, slowest first —
    // so a composition gate's cost attributes to the exact count()/
    // checkpoint/collect line that paid it (guide §1/§7.1 without a UI)
    if (sys.env.contains("OPT_PROBE_JOBS")) {
      // Group jobs by SQL execution id: an AQE action runs one job per
      // exchange query stage (named after the materialization future,
      // useless), plus a final job named with the action's callsite —
      // summing the group under its best-named member attributes the
      // whole action correctly and exposes the JOB COUNT per action.
      val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, String, Long)]
      val execDesc = new java.util.concurrent.ConcurrentHashMap[String, String]
      val done = scala.collection.mutable.ArrayBuffer.empty[(String, String, Double)]
      val lsn = new org.apache.spark.scheduler.SparkListener {
        override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
          e match {
            case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
              execDesc.put(s.executionId.toString, s.description)
            case _ => ()
          }
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val cs = js.stageInfos.lastOption.map(_.name).getOrElse("?")
          val eid = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
            .getOrElse("none")
          jobs.put(js.jobId, (eid, cs, System.nanoTime()))
        }
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobs.remove(je.jobId)).foreach { case (eid, cs, t0) =>
            done.synchronized {
              done += ((eid, cs, (System.nanoTime() - t0) / 1e6))
            }
          }
        }
      }
      spark.sparkContext.addSparkListener(lsn)
      (cases.filter(c => args.contains(c._1)) ++
          args.toSeq.filter(SparkEntry.queries.contains).map(n =>
            n -> (() => SparkEntry.queries(n)(spark, sfDir)))).foreach {
        case (name, fn) =>
          done.synchronized(done.clear())
          val t0 = System.nanoTime()
          time(spark, fn())
          Thread.sleep(300) // let the listener bus drain
          val total = (System.nanoTime() - t0) / 1e9
          val snap = done.synchronized(done.toVector)
          // label each execution group by its best-named job (the
          // non-future callsite), then aggregate per label
          val byExec = snap.groupBy(_._1).toVector.map { case (eid, v) =>
            val label = v.map(_._2)
              .filterNot(_.contains("withThreadLocalCaptured"))
              .headOption
              .orElse(Option(execDesc.get(eid)))
              .getOrElse(v.head._2)
            (eid, label, v.size, v.map(_._3).sum)
          }
          val byLabel = byExec.groupBy(_._2).view
            .mapValues(v => (v.size, v.map(_._3).sum, v.map(_._4).sum))
            .toVector.sortBy(-_._2._3)
          println(f"[jobs] ===== $name total=$total%.3f s, " +
            f"${snap.size} jobs / ${byExec.size} actions, " +
            f"${snap.map(_._3).sum / 1e3}%.3f s in jobs =====")
          byLabel.take(40).foreach { case (cs, (acts, nj, ms)) =>
            println(f"[jobs] ${ms / 1e3}%8.3f s  acts=$acts%-3d jobs=$nj%-4d $cs")
          }
      }
      spark.stop()
      return
    }

    val sel = if (args.nonEmpty) args.toSet else cases.map(_._1).toSet
    val explain = sys.env.contains("OPT_PROBE_EXPLAIN")
    (cases.filter(c => sel.contains(c._1)) ++ gateCases).foreach {
      case (name, fn) =>
        if (explain) { // plan capture (the plans/r20 artifact loop)
          println(s"========== $name ==========")
          fn().explain("formatted")
        } else {
          time(spark, fn()) // untimed codegen warm-up
          val ts = (1 to reps).map(_ => time(spark, fn()))
          println(f"[optprobe] $name%-10s min=${ts.min}%7.3f  " +
            ts.map(t => f"$t%.3f").mkString(" "))
        }
    }
    spark.stop()
  }
}
