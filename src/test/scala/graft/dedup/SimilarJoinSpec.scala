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

  // ---------------------------------------------- auto-blocked embeddings

  private def bruteForcePairs(df: org.apache.spark.sql.DataFrame,
                              minCos: Double): Seq[(Long, Long, Double)] =
    graft.sim.Similarity.nearDupPairsBlocked(
        df.withColumn("_all", lit(0)), "vec_id", "embedding", "_all", minCos)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("auto-blocked EmbeddingCosine equals brute force on real embeddings") {
    val auto = SimilarJoin.similarJoin(
        emb, "vec_id", "embedding", EmbeddingCosine(0.25))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val brute = bruteForcePairs(emb, 0.25)
    assert(auto == brute, "triangle-inequality pruning must be exact")
    assert(auto.nonEmpty)
  }

  test("auto-blocked exactness survives deliberate boundary straddlers") {
    // two tight clusters plus near-dup pairs sitting midway BETWEEN the
    // clusters: a multi-probe or nearest-cell-only scheme can assign the
    // two members of a midway pair to different cells and miss the pair
    // structurally; the cell-pair bound must still find every one.
    val rnd = new scala.util.Random(42)
    val dim = 8
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val a = unit(Array.fill(dim)(rnd.nextFloat() + 0.5f))
    val b = unit(a.zipWithIndex.map { case (x, i) =>
      if (i % 2 == 0) -x else x }) // far from a
    val mid = unit(a.zip(b).map { case (x, y) => x + y })
    def jitter(v: Array[Float], eps: Float): Array[Float] =
      unit(v.map(x => x + (rnd.nextFloat() - 0.5f) * eps))
    val rows = (
      (0 until 40).map(i => (i.toLong, jitter(a, 0.2f))) ++
      (40 until 80).map(i => (i.toLong, jitter(b, 0.2f))) ++
      // 10 straddling near-dup pairs: ids 80..99, pair (80,81), (82,83)…
      (0 until 10).flatMap { p =>
        val base = jitter(mid, 0.1f)
        Seq((80L + 2 * p, base), (81L + 2 * p, jitter(base, 0.01f)))
      }).toDF("vec_id", "embedding")
    val auto = SimilarJoin.similarJoin(
        rows, "vec_id", "embedding", EmbeddingCosine(0.9, None, numCells = 2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val brute = bruteForcePairs(rows, 0.9)
    assert(auto == brute, "boundary-straddling pairs must not be missed")
    val straddlers = (0 until 10).map(p => (80L + 2 * p, 81L + 2 * p)).toSet
    assert(straddlers.subsetOf(auto.map(t => (t._1, t._2)).toSet),
      "every deliberately planted straddling pair must be found")
  }

  test("cell-pair bound covers the verify filter's round-to-6 band") {
    // verify keeps round(score, 6) >= minCos, admitting true cosines
    // down to minCos - 5e-7 — two zero-radius cells separated by an
    // angle INSIDE that band must still qualify, though the naive
    // acos(minCos) bound would prune them (the exactness regression
    // a review caught in round 6)
    val minCos = 0.5
    val phi = math.acos(minCos - 2e-7)
    val cents = Array(Array(1.0, 0.0), Array(math.cos(phi), math.sin(phi)))
    val radii = Map(0 -> 0.0, 1 -> 0.0)
    val theta = math.acos(math.min(1.0, math.max(-1.0, minCos - 5e-7)))
    val pairs = graft.sim.AutoBlock.qualifyingCellPairs(cents, radii, theta)
    assert(pairs.contains((0, 1)) && pairs.contains((1, 0)),
      "a pair whose true cosine rounds UP to minCos must stay verifiable")
    // ...and the un-widened bound really would have pruned it
    assert(graft.sim.AutoBlock.angle(cents(0), cents(1)) >
      math.acos(minCos) + 1e-9)
  }

  test("the hot-bucket cap fires on auto-blocked cells too") {
    val one = emb.limit(50)
    val (pairCount, logged) = withLogCapture {
      SimilarJoin.similarJoin(
        one, "vec_id", "embedding", EmbeddingCosine(-1.0, None, numCells = 1),
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
