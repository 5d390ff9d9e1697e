package graft.apps

import graft.{SparkSpec, Tables}
import graft.dedup.{SimilarJoin, SimilarityMethod}
import graft.text.TextOps
import org.apache.spark.sql.functions._

class CurateSpec extends SparkSpec {

  private val method = SimilarityMethod.MinHashLsh(minJaccard = 0.6)
  // sf0.001 quality scores span [0.5, 1.0] with a ~0.63 median — 0.6
  // filters a real fraction without emptying the corpus
  private val minQ = 0.6

  test("Curate.run equals the hand-composed operator chain, stage by stage") {
    // sf0.001 documents carry near-dups but no exact dups — plant 5
    // exact copies (new ids) so the exact stage demonstrably fires
    val base = Tables.load(spark, sf(), "documents")
    val docs = base.unionByName(
      base.orderBy(col("doc_id")).limit(5)
        .withColumn("doc_id", col("doc_id") + 100000L))
    val logged = scala.collection.mutable.ArrayBuffer.empty[String]
    val (curated, report) = Curate.run(docs, "doc_id", "text", minQ, method,
      m => logged.synchronized { logged += m })

    // stage 1 oracle: quality filter composed by hand
    val quality = docs.transform(TextOps.withQualityScore(_, "text", "quality"))
      .filter(col("quality") >= minQ)
    val handQuality = quality.count()

    // stage 2 oracle: keep min doc_id per fingerprint (the q40 window form)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_fp")).orderBy(col("doc_id"))
    val exact = quality.withColumn("_fp", TextOps.fingerprint(col("text")))
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .drop("_fp", "_rn")
    val handExact = exact.count()

    // stage 3 oracle: cluster representatives survive
    val clusters = SimilarJoin.similarClusters(exact, "doc_id", "text", method)
    val handDrop = clusters.filter(col("cluster") =!= col("id")).count()

    assert(report.input == docs.count())
    assert(report.afterQuality == handQuality && report.afterQuality < report.input,
      "the quality threshold must actually filter")
    assert(report.afterExact == handExact)
    assert(report.afterExact < report.afterQuality,
      "the planted exact copies must be dropped by the exact stage")
    assert(report.afterNear == handExact - handDrop)
    assert(report.afterNear < report.afterExact,
      "sf0.001 documents carry near-dups; the near stage must drop some")

    // the surviving ROWS are identical to the hand-built chain
    val handIds = exact
      .join(clusters.filter(col("cluster") =!= col("id"))
        .select(col("id").as("doc_id")), Seq("doc_id"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val gotIds = curated.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gotIds == handIds)

    // report internals agree with themselves and with the stage logs
    assert(report.langProfile.values.sum == report.afterNear)
    assert(report.totalTokens > 0)
    assert(logged.count(_.startsWith("[curate]")) == 4,
      s"one log line per stage expected: $logged")
    curated.unpersist()
  }

  test("CurateMain method parsing covers both finders and the bare-number form") {
    assert(CurateMain.parseMethod("0.7") ==
      SimilarityMethod.MinHashLsh(minJaccard = 0.7))
    assert(CurateMain.parseMethod("minhash:0.65") ==
      SimilarityMethod.MinHashLsh(minJaccard = 0.65))
    assert(CurateMain.parseMethod("simhash:2") ==
      SimilarityMethod.SimHash(maxHamming = 2))
  }

  test("CurateMain with a checkpoint dir: reliable clustering, snapshots cleaned") {
    val out = java.nio.file.Files.createTempDirectory("graft-curate-r").toFile
    val ckpt = java.nio.file.Files.createTempDirectory("graft-curate-ckpt").toFile
    Mains.keepSessionForTests = true
    try {
      assert(spark.sparkContext.getCheckpointDir.isEmpty)
      CurateMain.main(Array(sf(), out.getAbsolutePath, minQ.toString, "0.6",
        ckpt.getAbsolutePath))
      // same survivors as the plain run, via the reliable path
      val written = spark.read.parquet(out.getAbsolutePath)
      val (expect, report) = Curate.run(
        Tables.load(spark, sf(), "documents"), "doc_id", "text", minQ, method,
        _ => ())
      assert(written.count() == report.afterNear)
      expect.unpersist()
      // config restored, no snapshot dirs survive the scope
      assert(spark.sparkContext.getCheckpointDir.isEmpty)
      val walk = java.nio.file.Files.walk(ckpt.toPath)
      val leftover =
        try scala.jdk.CollectionConverters.IteratorHasAsScala(walk.iterator())
          .asScala.count(_.getFileName.toString.startsWith("graft-dup-clusters-"))
        finally walk.close()
      assert(leftover == 0, s"snapshot dirs accumulated: $leftover")
    } finally {
      Mains.keepSessionForTests = false
      org.apache.commons.io.FileUtils.deleteQuietly(out)
      org.apache.commons.io.FileUtils.deleteQuietly(ckpt)
    }
  }

  test("CurateMain writes the curated parquet end-to-end") {
    val out = java.nio.file.Files.createTempDirectory("graft-curate").toFile
    Mains.keepSessionForTests = true
    try {
      CurateMain.main(Array(sf(), out.getAbsolutePath, minQ.toString, "0.6"))
      val written = spark.read.parquet(out.getAbsolutePath)
      // all source columns survive, plus the computed quality score
      assert(written.columns.toSet ==
        Tables.load(spark, sf(), "documents").columns.toSet + "quality")
      val (expect, report) = Curate.run(
        Tables.load(spark, sf(), "documents"), "doc_id", "text", minQ, method,
        _ => ())
      assert(written.count() == report.afterNear)
      assert(written.select("doc_id").collect().map(_.getLong(0)).toSet ==
        expect.select("doc_id").collect().map(_.getLong(0)).toSet)
      expect.unpersist()
    } finally {
      Mains.keepSessionForTests = false
      org.apache.commons.io.FileUtils.deleteQuietly(out)
    }
  }
}
