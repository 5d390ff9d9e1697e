package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Coarse angular quantization for the auto-blocked embedding
  * similarity join (`SimilarityMethod.EmbeddingCosine` without a
  * caller-supplied block column).
  *
  * The blocking is EXACT, not probabilistic: every vector is assigned
  * to its single nearest centroid (a cell), each cell tracks its
  * angular radius r = max angle(member, centroid), and a pair of cells
  * (i, j) can contain a vector pair within angular distance θ only if
  * `angle(c_i, c_j) <= r_i + r_j + θ` (triangle inequality on the unit
  * sphere, where angle is a metric). Candidate generation enumerates
  * exactly the qualifying cell pairs, so — unlike multi-probe LSH-style
  * schemes — NO pair above the cosine threshold can be structurally
  * missed, at ANY centroid quality. Centroid quality affects cost
  * only: tight clusters ⇒ small radii ⇒ most of the K² cell pairs are
  * pruned; adversarially uniform data degrades gracefully toward the
  * all-cell-pairs join (which the hot-bucket cap still bounds).
  *
  * Scale shape: fitting is a K-row deterministic sample plus
  * `refineIters` k-means step(s) whose per-cell means fold map-side
  * ([[VectorAgg.vectorMean]]); the only driver-side state is the K
  * centroid vectors and K radii (model parameters, O(K·dim) — never
  * data rows). Assignment is a codegen'd expression over centroid
  * literals: zero shuffle, no crossJoin row blow-up.
  */
object AutoBlock {

  /** Clamped angle between two unit vectors. */
  private[graft] def angle(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    math.acos(math.min(1.0, math.max(-1.0, acc)))
  }

  /** Train K unit centroids over `(id, v, nrm)` rows (null/zero-norm
    * vectors already filtered by the caller).
    *
    * Seeds: the K DISTINCT vectors smallest by `xxhash64(vector)` — a
    * deterministic order-free sample over distinct VALUES, not rows.
    * Row-sampling would be a trap on exactly the corpora dedup exists
    * for: a 20k-copy boilerplate vector would win nearly every seed
    * slot and collapse all K centroids onto one point (one cell owns
    * the whole corpus; a fired hot-cell cap would then cull
    * everything). The groupBy collapses duplicates map-side, so the
    * seed scan's shuffle carries one row per distinct vector per
    * partition. Each refinement iteration re-assigns every vector to
    * its nearest centroid and replaces the centroid with the
    * (re-normalized) member mean; cells that go empty keep their
    * previous centroid. The collects here are the model-fit contract:
    * K vectors of `dim` doubles, never data. */
  private[graft] def fitCells(base: DataFrame, k: Int,
                              refineIters: Int): Array[Array[Double]] = {
    require(k >= 1, s"numCells must be >= 1, got $k")
    require(refineIters >= 0, s"refineIters must be >= 0, got $refineIters")
    val seeds = base
      .groupBy(xxhash64(col("v")).as("h"))
      .agg(first(col("v")).as("v"), first(col("nrm")).as("nrm"))
      .orderBy(col("h"))
      .limit(k)
      .select(col("v").cast("array<double>").as("vd"), col("nrm"))
      .collect()
      .map { r =>
        val v = r.getSeq[Double](0).toArray
        val n = r.getDouble(1)
        v.map(_ / n)
      }
    var cents = seeds
    var iter = 0
    while (iter < refineIters && cents.nonEmpty) {
      // SPHERICAL k-means: average the UNIT vectors (v / nrm), not the
      // raw ones — assignment is angular, and a few large-norm outliers
      // averaged raw would drag the centroid off the cell's angular
      // mass, inflating radii and gutting the triangle-inequality
      // pruning. The per-element divide is an interpreted HOF but runs
      // only in this training pass, never per pair.
      val means = base
        .withColumn("cell",
          nearestCellStruct(cents, col("v"), col("nrm")).getField("cell"))
        .groupBy(col("cell"))
        .agg(VectorAgg.vectorMeanCol(
          transform(col("v"), x => x / col("nrm")).cast("array<float>")).as("m"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
        .toMap
      cents = cents.zipWithIndex.map { case (old, i) =>
        means.get(i) match {
          case Some(m) if m.nonEmpty =>
            val n = math.sqrt(m.map(x => x * x).sum)
            if (n > 0) m.map(_ / n) else old
          case _ => old
        }
      }
      iter += 1
    }
    cents
  }

  /** `struct(cell, ang)`: the nearest centroid's index and the angle to
    * it, as ONE codegen'd expression over centroid literals — a
    * `greatest` over K `(cosine, -cell)` structs (struct ordering is
    * lexicographic, so ties break toward the SMALLER cell id — a
    * deterministic assignment even for duplicate seed vectors). */
  private[graft] def nearestCellStruct(cents: Array[Array[Double]],
                                       v: Column, nrm: Column): Column = {
    val scored = cents.toSeq.zipWithIndex.map { case (c, i) =>
      struct((graft.functions.GraftExtensions.dot(v, typedLit(c.toSeq)) / nrm)
        .as("c"), lit(-i).as("nc"))
    }
    val best = if (scored.size == 1) scored.head else greatest(scored: _*)
    struct((-best.getField("nc")).as("cell"),
      acos(least(greatest(best.getField("c"), lit(-1.0)), lit(1.0))).as("ang"))
  }

  /** The qualifying cell-pair list (BOTH directions + diagonal): the
    * pair join emits each unordered vector pair exactly once via its
    * own `(cell_a, cell_b)` direction under the `id_a < id_b` filter.
    * The 1e-9 margin absorbs driver-vs-codegen double rounding in the
    * angle computation — a false-positive cell pair only costs
    * verification work; a false negative would cost exactness. */
  private[graft] def qualifyingCellPairs(cents: Array[Array[Double]],
                                         radii: Map[Int, Double],
                                         theta: Double): Seq[(Int, Int)] =
    for {
      (ci, ri) <- radii.toSeq
      (cj, rj) <- radii.toSeq
      if angle(cents(ci), cents(cj)) <= ri + rj + theta + 1e-9
    } yield (ci, cj)
}
