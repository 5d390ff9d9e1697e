package graft.dedup

import graft.{SparkSpec, Tables}
import graft.dedup.SimilarityMethod._
import org.apache.spark.sql.functions._

class SimilarJoinSpec extends SparkSpec with HotBucketLogCapture {
  import spark.implicits._

  lazy val docs = Tables.load(spark, sf(), "documents")
  lazy val emb = Tables.load(spark, sf(), "embeddings")

  test("MinHashLsh method equals the bare LSH finder, renamed to score") {
    val unified = SimilarJoin.similarJoin(docs, "doc_id", "text", MinHashLsh())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val bare = Dedup.lshNearDupPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(unified == bare)
    assert(SimilarJoin.similarJoin(docs, "doc_id", "text", MinHashLsh())
      .columns.toSeq == Seq("id_a", "id_b", "score"))
  }

  test("SimHash method equals the bare simhash finder with a double score") {
    val unified = SimilarJoin.similarJoin(docs, "doc_id", "text", SimHash())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val bare = Dedup.simhashNearDupPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2).toDouble)).toSeq
    assert(unified == bare)
  }

  test("EmbeddingCosine method equals the bare blocked finder") {
    val unified = SimilarJoin.similarJoin(
        emb, "vec_id", "embedding", EmbeddingCosine("label", 0.2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val bare = graft.sim.Similarity.nearDupPairsBlocked(
        emb, "vec_id", "embedding", "label", 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(unified == bare)
    assert(unified.nonEmpty)
  }

  test("the shared hot-bucket cap applies to embedding blocks too") {
    // every vector in ONE block: with maxBucket below the block size the
    // whole block is culled — loudly — and no pair survives
    val one = emb.limit(50).withColumn("label", lit(0))
    val (pairCount, logged) = withLogCapture {
      SimilarJoin.similarJoin(
        one, "vec_id", "embedding", EmbeddingCosine("label", -1.0),
        maxBucket = 10).count()
    }
    assert(pairCount == 0)
    assert(logged.exists(_.contains("similarJoin(EmbeddingCosine)")),
      "the cull must log through the shared hook")
  }

  test("similarClusters pipes pairs into connected components") {
    // two exact-duplicate families ⇒ two clusters labeled by min id
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "an entirely different document about spark shuffle partitions"),
      (4L, "an entirely different document about spark shuffle partitions"),
      (5L, "a lone singleton document that matches nothing else at all ok"))
      .toDF("doc_id", "text")
    val clusters = SimilarJoin.similarClusters(
        corpus, "doc_id", "text", MinHashLsh(minJaccard = 0.9))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }
}
