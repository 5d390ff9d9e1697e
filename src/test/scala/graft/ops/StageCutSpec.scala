package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** StageCut — the lineage-cut stage boundary: cut, persist and
  * reliable modes must produce identical pipeline results (the confs
  * only trade plan-analysis time against materialization cost and
  * executor-loss recovery), the auto gate must persist small plans and
  * cut large ones, and release must free what each mode allocated. */
class StageCutSpec extends SparkSpec {
  import spark.implicits._

  private def withMinNodes[T](n: Int)(body: => T): T = {
    spark.conf.set(StageCut.MinNodesKey, n.toString)
    try body finally spark.conf.unset(StageCut.MinNodesKey)
  }

  test("cut and persist modes produce identical pipeline results") {
    val docs = graft.Tables.load(spark, sf(), "documents")
      .select(col("doc_id"), col("source"), col("text"))
    def runOnce(): Seq[(Long, Long)] = {
      val (out, rep) = graft.apps.Curate.run(docs, "doc_id", "text",
        0.6, graft.dedup.SimilarityMethod.MinHashLsh(minJaccard = 0.6),
        log = _ => ())
      val ids = out.select(col("doc_id"),
          graft.text.TextOps.tokenCount(col("text")).as("nt"))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      out.unpersist()
      assert(rep.afterNear == ids.size.toLong)
      ids
    }
    val cut = withMinNodes(0) { runOnce() } // force cut at every boundary
    spark.conf.set(StageCut.ConfKey, "false")
    try {
      val persisted = runOnce()
      assert(cut == persisted,
        "persist fallback diverged from the lineage-cut run")
    } finally spark.conf.unset(StageCut.ConfKey)
    val auto = runOnce() // default threshold: mixed persist/cut
    assert(cut == auto, "auto-gated run diverged from the cut-always run")
  }

  test("release frees the checkpointed RDD deterministically") {
    withMinNodes(0) {
      val sc = spark.sparkContext
      val before = sc.getPersistentRDDs.keySet
      val cut = StageCut(spark.range(1000).toDF("id"))
      val added = sc.getPersistentRDDs.keySet -- before
      assert(added.nonEmpty, "the cut persisted no RDD")
      StageCut.release(cut)
      val after = sc.getPersistentRDDs.keySet
      assert(added.forall(!after.contains(_)),
        "release left checkpoint blocks for GC (plain unpersist cannot " +
          "reach a cut frame's RDD)")
    }
  }

  test("gate: default cuts always; a raised threshold persists small " +
      "plans and cuts past it; the kill switch never cuts") {
    val small = spark.range(100).toDF("id")
      .withColumn("x", col("id") * 2)
      .filter(col("x") % 3 === 0)
    def isCut(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.logical.collectLeaves()
        .exists(_.getClass.getSimpleName.contains("LogicalRDD"))
    // the round-16 default: cut always (the 96-node gate lost on six
    // of eight pipeline gates in the A/B re-measurement and won none)
    assert(StageCut.DefaultMinNodes == 0)
    val cutDefault = StageCut(small)
    assert(isCut(cutDefault), "the default gate must cut every boundary")
    StageCut.release(cutDefault)
    // a RAISED threshold restores the persist gate: a small plan stays
    // on persist; composition compounds until a boundary crosses
    // minNodes, then the cut resets analysis cost
    withMinNodes(96) {
      val kept = StageCut(small)
      assert(!isCut(kept), "a small plan must persist under a 96 gate")
      assert(kept.storageLevel.useMemory, "persist path must cache")
      kept.unpersist()
      var grown = small
      (1 to 96).foreach { i =>
        grown = grown.withColumn(s"c$i", col("id") + i)
      }
      val cut = StageCut(grown)
      assert(isCut(cut), "a plan past the threshold must cut its lineage")
      StageCut.release(cut)
    }
    spark.conf.set(StageCut.ConfKey, "false")
    try {
      val never = StageCut(small)
      assert(!isCut(never), s"${StageCut.ConfKey}=false must never cut")
      never.unpersist()
    } finally spark.conf.unset(StageCut.ConfKey)
  }

  test("reliable mode checkpoints to the dir, equals local, and cleans up") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sc-rel")
      .toString
    val df = spark.range(500).toDF("id")
      .withColumn("v", (col("id") * 7 % 13))
    val expected = withMinNodes(0) {
      val c = StageCut(df); val r = c.as[(Long, Long)].collect().sorted
      StageCut.release(c); r
    }
    // without a checkpoint dir, reliable mode fails loudly
    spark.conf.set(StageCut.ModeKey, "reliable")
    try {
      val e = intercept[IllegalArgumentException] {
        withMinNodes(0) { StageCut(df) }
      }
      assert(e.getMessage.contains("setCheckpointDir"))
    } finally spark.conf.unset(StageCut.ModeKey)
    val got = StageCut.withReliableCuts(spark, dir) {
      withMinNodes(0) {
        val c = StageCut(df)
        // the cut's data lives in FILES under the scope's resolved dir
        val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
          .filter(p => p.getFileName.toString.startsWith("rdd-"))
          .count()
        assert(files > 0, "reliable cut wrote no checkpoint directory")
        val r = c.as[(Long, Long)].collect().sorted
        StageCut.release(c)
        r
      }
    }
    assert(got.toSeq == expected.toSeq,
      "reliable cut diverged from the local cut")
    // scope exit removed the resolved dir and restored the mode/dir
    assert(spark.conf.getOption(StageCut.ModeKey).isEmpty)
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
    val leftover = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .count()
    assert(leftover == 0, s"withReliableCuts left $leftover entries in $dir")
  }
}
