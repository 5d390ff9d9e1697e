package graft.dedup

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions.col

/** The r20 auto-embedding join-shape swap: vectors ride the one
  * cell-keyed candidate join (the ivfTopKBatch shape) instead of the
  * pre-r20 (id_a, id_b) enumeration + per-pair-id vector fetch joins.
  * This spec pins the two shapes pair-for-pair and score-for-score on
  * the real embeddings corpus — the late-fetch twin
  * ([[SimilarJoin.autoEmbeddingPairsLateFetch]]) is the
  * independently-shaped derivation the shipped path must equal. */
class EmbJoinShapeSpec extends SparkSpec {
  import spark.implicits._

  test("cell-join pairs == late-fetch pairs, bitwise, self form") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val fast = SimilarJoin.similarJoin(emb, "vec_id", "embedding",
      SimilarityMethod.EmbeddingCosine(0.4, numCells = 16))
    val slow = SimilarJoin.autoEmbeddingPairsLateFetch(emb, "vec_id",
      "embedding", 0.4, 16, 1, Dedup.defaultMaxBucket)
    try {
      val a = fast.as[(Long, Long, Double)].collect().toSeq
      val b = slow.as[(Long, Long, Double)].collect().toSeq
      assert(a == b)
      assert(a.nonEmpty)
    } finally { fast.unpersist(); slow.unpersist() }
  }

  test("A-vs-B cell-join pairs survive the swap (vs brute force)") {
    // the against form has no kept late-fetch twin; pin it against
    // plain brute force on a slice — the exactness contract the
    // triangle-inequality blocking guarantees at any centroid quality
    val emb = Tables.load(spark, sf(), "embeddings")
      .filter(col("vec_id") < 300)
    val newSide = emb.filter(col("vec_id") % 5 === 0)
    val corpus = emb.filter(col("vec_id") % 5 =!= 0)
    val fast = SimilarJoin.similarJoinAgainst(newSide, corpus, "vec_id",
      "embedding", SimilarityMethod.EmbeddingCosine(0.4, numCells = 8))
    val brute = {
      import org.apache.spark.sql.functions._
      val l = newSide.select(col("vec_id").as("id_a"),
        col("embedding").as("v_a"),
        graft.sim.Similarity.norm(col("embedding")).as("n_a"))
      val r = corpus.select(col("vec_id").as("id_b"),
        col("embedding").as("v_b"),
        graft.sim.Similarity.norm(col("embedding")).as("n_b"))
      l.crossJoin(r)
        .select(col("id_a"), col("id_b"),
          round(graft.sim.Similarity.dot(col("v_a"), col("v_b"))
            / (col("n_a") * col("n_b")), 6).as("score"))
        .filter(col("score") >= 0.4)
        .orderBy(col("id_a"), col("id_b"))
    }
    try {
      val a = fast.as[(Long, Long, Double)].collect().toSeq
      val b = brute.as[(Long, Long, Double)].collect().toSeq
      assert(a == b)
      assert(a.nonEmpty)
    } finally fast.unpersist()
  }
}
