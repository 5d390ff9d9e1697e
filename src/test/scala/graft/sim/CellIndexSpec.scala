package graft.sim

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The train-once/query-many contract of [[CellIndex]] (round 7 shipped
  * the API under gate q68; these are the promised unit pins).
  *
  *  - save → load → query is BIT-identical to train → query (doubles
  *    round-trip exactly through parquet);
  *  - a corrupt saved index is rejected at load, loudly;
  *  - a STALE index (trained on a different corpus than the one being
  *    joined) degrades pruning cost only — the similarity join stays
  *    exact because radii are recomputed over the joined frame. */
class CellIndexSpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sf(), "embeddings")

  private def topk(index: Option[CellIndex]): Seq[(Long, Long, Double, Long)] = {
    val probes = emb.orderBy(col("vec_id")).limit(5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    Similarity.ivfTopKBatch(emb, "vec_id", "embedding",
        probes, "q_id", "q_vec", nprobe = 4, k = 10,
        numCells = 16, index = index)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getAs[Number](3).longValue))
      .toSeq
  }

  test("save -> load -> query equals train -> query bit-identically") {
    val trained = CellIndex.train(emb, "vec_id", "embedding", numCells = 16)
    val dir = java.nio.file.Files.createTempDirectory("graft-cellindex").toFile
    try {
      val path = new java.io.File(dir, "idx").getAbsolutePath
      trained.save(spark, path)
      val loaded = CellIndex.load(spark, path)
      // the MODEL round-trips exactly: same K, same doubles
      assert(loaded.numCells == trained.numCells)
      assert(loaded.centroids.map(_.toSeq).toSeq ==
        trained.centroids.map(_.toSeq).toSeq,
        "centroids must round-trip bit-identically through parquet")
      assert(loaded.radii.toSeq == trained.radii.toSeq)
      // ...and so do the QUERY results (nprobe < cells — the
      // approximate regime, where a perturbed centroid would show)
      assert(topk(Some(loaded)) == topk(Some(trained)))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("an indexed query equals an inline-trained one on the same corpus") {
    val trained = CellIndex.train(emb, "vec_id", "embedding", numCells = 16)
    // ivfTopKBatch with index = None trains inline over the same corpus
    // with the same deterministic seeds — the q68 gate rides this
    assert(topk(Some(trained)) == topk(None))
  }

  test("a corrupt saved index (non-contiguous cell ids) is rejected at load") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cellindex-bad").toFile
    try {
      val path = new java.io.File(dir, "idx").getAbsolutePath
      Seq((0, Seq(1.0, 0.0), 0.1), (2, Seq(0.0, 1.0), 0.1))
        .toDF("cell", "centroid", "radius")
        .write.mode("overwrite").parquet(path)
      val e = intercept[IllegalArgumentException] { CellIndex.load(spark, path) }
      assert(e.getMessage.contains("corrupt CellIndex"))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("centroid/radius length mismatch is rejected at construction") {
    val e = intercept[IllegalArgumentException] {
      CellIndex(Array(Array(1.0, 0.0)), Array(0.1, 0.2))
    }
    assert(e.getMessage.contains("must align"))
  }

  test("a STALE index keeps the similarity join exact (radii recomputed)") {
    import graft.dedup.{SimilarJoin, SimilarityMethod}
    // train on HALF the corpus, join the WHOLE corpus through the stale
    // index: cells no longer reflect the joined frame's spread, so
    // pruning is worse — but the per-frame radii recomputation keeps
    // the triangle-inequality bound valid and the result equals brute
    // force
    val stale = CellIndex.train(emb.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", numCells = 8)
    val viaStale = SimilarJoin.similarJoin(emb, "vec_id", "embedding",
        SimilarityMethod.EmbeddingCosine(0.25, index = Some(stale)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val brute = Similarity.nearDupPairsBlocked(
        emb.withColumn("_all", lit(0)), "vec_id", "embedding", "_all", 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(viaStale == brute, "a stale index must never cost exactness")
    assert(viaStale.nonEmpty)
  }

  test("train with numCells = 0 derives K from the corpus (auto-K)") {
    // 500 vectors / targetCellSize 1024 -> K = 1 at this SF; the
    // DERIVATION itself is pinned by AutoBlockSpec at larger n — here
    // we pin that train() routes through it and stays consistent
    val auto = CellIndex.train(emb, "vec_id", "embedding")
    assert(auto.numCells ==
      AutoBlock.resolveCells(0, emb.filter(col("embedding").isNotNull).count()))
  }
}
