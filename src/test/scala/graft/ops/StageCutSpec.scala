package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** StageCut — the lineage-cut stage boundary: the default cut and the
  * `spark.graft.stageCutLineage=false` persist fallback must produce
  * identical pipeline results (the conf only trades plan-analysis
  * time against lineage-based recovery), and the cut must actually
  * truncate the logical plan. */
class StageCutSpec extends SparkSpec {
  import spark.implicits._

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
    val cut = runOnce() // default: stageCutLineage unset -> true
    spark.conf.set(StageCut.ConfKey, "false")
    try {
      val persisted = runOnce()
      assert(cut == persisted,
        "persist fallback diverged from the lineage-cut default")
    } finally spark.conf.unset(StageCut.ConfKey)
  }

  test("release frees the checkpointed RDD deterministically") {
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

  test("the cut truncates the logical plan; the fallback persists") {
    val df = spark.range(100).toDF("id")
      .withColumn("x", col("id") * 2)
      .filter(col("x") % 3 === 0)
    val cut = StageCut(df)
    assert(cut.queryExecution.logical.collectLeaves()
      .exists(_.getClass.getSimpleName.contains("LogicalRDD")),
      "default StageCut must rebase the plan on a checkpointed RDD")
    spark.conf.set(StageCut.ConfKey, "false")
    try {
      val kept = StageCut(df)
      assert(kept.storageLevel.useMemory,
        "persist fallback must leave the frame cached")
      assert(!kept.queryExecution.logical.collectLeaves()
        .exists(_.getClass.getSimpleName.contains("LogicalRDD")),
        "persist fallback must keep the original lineage")
      kept.unpersist()
    } finally spark.conf.unset(StageCut.ConfKey)
  }
}
