package graft.dedup

import graft.sim.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Which candidate-generation family a [[SimilarJoin.similarJoin]] call
  * uses. Every method is bucketed (never all-pairs): candidates share a
  * band/block key, the exact score is computed only inside buckets, and
  * degenerate hot buckets are dropped loudly under the shared
  * `maxBucket` cap. */
sealed trait SimilarityMethod

object SimilarityMethod {

  /** MinHash-LSH over `nGram`-shingled text; score = exact n-gram
    * Jaccard similarity in [0,1], kept when >= `minJaccard`. */
  case class MinHashLsh(nGram: Int = 3, bands: Int = 4,
                        minJaccard: Double = 0.0) extends SimilarityMethod

  /** 32-bit SimHash with byte-banding; score = Hamming distance in
    * [0,32] (LOWER is closer), kept when <= `maxHamming`. Exact recall
    * up to Hamming 3, band-approximate beyond. */
  case class SimHash(maxHamming: Int = 3) extends SimilarityMethod

  /** Embedding cosine verified only inside coarse `blockCol` cells
    * (IVF-style); score = cosine similarity in [-1,1], kept when
    * >= `minCos`. The content column must be an array vector. */
  case class EmbeddingCosine(blockCol: String,
                             minCos: Double) extends SimilarityMethod
}

/** The one similarity-join operator a 100 TB pipeline calls.
  *
  * [[similarJoin]] unifies the three pair finders — text MinHash-LSH,
  * text SimHash, embedding cosine — behind a single signature with the
  * scale knobs shared across all of them:
  *
  *  - `maxBucket`: the hot-bucket escape hatch ([[Dedup.dropHotBuckets]])
  *    bounds the worst single-bucket quadratic cost; oversized buckets
  *    are dropped LOUDLY, never silently.
  *  - `cacheSignatures`: signatures/norms are computed once, persisted
  *    MEMORY_AND_DISK for the self-join's two sides, and released once
  *    the pair list is materialized — at 100 TB the upstream pipeline is
  *    far too expensive to evaluate four times.
  *  - checkpointing: feed the result to [[Dedup.dupClusters]] (or call
  *    [[similarClusters]]) and the clustering loop uses a RELIABLE
  *    `checkpoint()` whenever `spark.sparkContext.setCheckpointDir` is
  *    configured — the fault-tolerance knob for multi-hour cluster runs.
  *
  * Output schema is uniform: `(id_a, id_b, score)` with `id_a < id_b`,
  * one row per distinct pair, totally ordered — the score's meaning and
  * keep-direction per method are documented on [[SimilarityMethod]]. */
object SimilarJoin {

  def similarJoin(df: DataFrame, idCol: String, contentCol: String,
                  method: SimilarityMethod,
                  cacheSignatures: Boolean = true,
                  maxBucket: Int = Dedup.defaultMaxBucket): DataFrame =
    method match {
      case SimilarityMethod.MinHashLsh(n, b, mj) =>
        Dedup.lshNearDupPairs(df, idCol, contentCol, n, b, mj,
            cacheSignatures, maxBucket)
          .withColumnRenamed("jaccard", "score")
      case SimilarityMethod.SimHash(mh) =>
        Dedup.simhashNearDupPairs(df, idCol, contentCol, mh,
            cacheSignatures, maxBucket)
          .select(col("id_a"), col("id_b"),
            col("hamming").cast("double").as("score"))
      case SimilarityMethod.EmbeddingCosine(blockCol, minCos) =>
        embeddingPairs(df, idCol, contentCol, blockCol, minCos,
          cacheSignatures, maxBucket)
    }

  /** [[similarJoin]] piped into connected-components clustering:
    * returns `(id, cluster)` where cluster = min member id. The pair
    * list's cache is RELEASED before returning — [[Dedup.dupClusters]]
    * materializes its own edge list up front, after which the persisted
    * pairs would be dead weight pinned for the whole session. */
  def similarClusters(df: DataFrame, idCol: String, contentCol: String,
                      method: SimilarityMethod,
                      cacheSignatures: Boolean = true,
                      maxBucket: Int = Dedup.defaultMaxBucket): DataFrame = {
    val pairs = similarJoin(df, idCol, contentCol, method,
      cacheSignatures, maxBucket)
    try Dedup.dupClusters(pairs)
    finally { if (cacheSignatures) pairs.unpersist() }
  }

  /** Embedding path with the SAME cap/caching treatment the text
    * finders get (which [[Similarity.nearDupPairsBlocked]], the bare
    * operator, leaves to the caller): norms computed once per vector,
    * hot BLOCKS dropped under `maxBucket` before the quadratic
    * verification, vectors persisted across the self-join's two sides
    * and released after materialization. */
  private def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
                             blockCol: String, minCos: Double,
                             cacheSignatures: Boolean,
                             maxBucket: Int): DataFrame = {
    val normed0 = df.select(col(blockCol).as("blk"), col(idCol).as("id"),
      col(vecCol).as("v"), Similarity.norm(col(vecCol)).as("nrm"))
    val normed = if (cacheSignatures)
      normed0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else normed0
    // a block IS the bucket here: n members ⇒ n(n-1)/2 dot products
    val capped = Dedup.dropHotBuckets(normed, Seq("blk"),
      maxBucket, "similarJoin(EmbeddingCosine)")
    val l = capped.select(col("blk"), col("id").as("id_a"),
      col("v").as("v_a"), col("nrm").as("n_a"))
    val r = capped.select(col("blk"), col("id").as("id_b"),
      col("v").as("v_b"), col("nrm").as("n_b"))
    val verified = l.join(r, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Similarity.dot(col("v_a"), col("v_b"))
          / (col("n_a") * col("n_b")), 6).as("score"))
      .filter(col("score") >= minCos)
      .orderBy(col("id_a"), col("id_b"))
    if (!cacheSignatures) verified
    else {
      val out = verified.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out.count() // materialize before releasing the vector cache
      normed.unpersist()
      out
    }
  }
}
