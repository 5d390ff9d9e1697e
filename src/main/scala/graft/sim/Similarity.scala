package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Scale design: the probe side of top-k is a single row → broadcast
  * cross join, so the scan of the big side stays embarrassingly
  * parallel with no shuffle until the final top-k (a `TakeOrdered`
  * on k rows per partition). The pairwise variant is blocked by a
  * coarse partition key (IVF-style cell; here the `label` column plays
  * that role) so the quadratic work stays inside cells — at 1000
  * executors each cell's pair set is local to its shuffle partition.
  * Dot products are computed in double via `zip_with`+`aggregate`
  * (deterministic left-fold, reproducible across engines).
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k against one probe vector (by id).
    * Baseline for ANN; exact answer. */
  def cosineTopK(emb: DataFrame, idCol: String, vecCol: String,
                 probeId: Long, k: Int): DataFrame = {
    val probe = emb.filter(col(idCol) === probeId)
      .select(col(vecCol).as("probe_vec"))
    emb.filter(col(idCol) =!= probeId)
      .crossJoin(broadcast(probe))
      .select(col(idCol),
        round(cosine(col(vecCol), col("probe_vec")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Blocked near-duplicate pairs: quadratic verification only inside a
    * coarse block (IVF-cell analogue). Returns (id_a, id_b, cos_sim). */
  def nearDupPairsBlocked(emb: DataFrame, idCol: String, vecCol: String,
                          blockCol: String, minCos: Double): DataFrame = {
    val l = emb.select(col(blockCol).as("blk"), col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val r = emb.select(col(blockCol).as("blk"), col(idCol).as("id_b"), col(vecCol).as("v_b"))
    l.join(r, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("v_a"), col("v_b")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= minCos)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Per-block centroids in long format (block, pos, avg component) —
    * the k-means/IVF training step's inner aggregate. Long format keeps
    * the aggregation a plain hash-agg on (block, pos). */
  def centroidsLong(emb: DataFrame, blockCol: String, vecCol: String): DataFrame =
    emb.select(col(blockCol), posexplode(col(vecCol)).as(Seq("pos0", "v")))
      .select(col(blockCol), (col("pos0") + 1).as("pos"), col("v").cast("double").as("v"))
      .groupBy(col(blockCol), col("pos"))
      .agg(round(avg(col("v")), 6).as("avg_v"))
      .orderBy(col(blockCol), col("pos"))
}
