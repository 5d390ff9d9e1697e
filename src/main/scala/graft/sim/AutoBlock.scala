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

  /** Target mean cell population for auto-K ([[resolveCells]]). The
    * verify stage inside one cell is quadratic (~size²/2 dot products),
    * so the mean cell must stay bounded as the corpus grows — a FIXED
    * K at 100× corpus scale means 100× cell populations and the
    * quadratic blow-up the blocking exists to avoid. ~1k members ⇒
    * ~0.5M dots per mean cell, comfortably partition-local. */
  val targetCellSize: Long = 1024L

  /** Upper bound for auto-K. The qualifying-cell-pair enumeration is an
    * O(K²·dim) DRIVER loop and the batch-ANN router sorts K structs per
    * probe row, so K must stay model-sized: 4096 cells ⇒ ≤16.7M driver
    * pair checks (sub-second) and caps auto-K corpora at ~4M vectors of
    * mean-sized cells — beyond that, raise [[targetCellSize]] via an
    * explicit `numCells`, don't widen K. */
  val maxAutoCells: Int = 4096

  /** Resolve the cell count: an explicit positive `numCells` wins
    * (the pre-round-7 knob, and what the gate queries pin); `0` derives
    * K ≈ n / [[targetCellSize]], clamped to [1, [[maxAutoCells]]]. The
    * count is by-name — only evaluated on the auto path. */
  private[graft] def resolveCells(numCells: Int, n: => Long): Int = {
    require(numCells >= 0, s"numCells must be >= 0 (0 = auto), got $numCells")
    if (numCells > 0) numCells
    else math.max(1L, math.min(maxAutoCells.toLong,
      (n + targetCellSize - 1) / targetCellSize)).toInt
  }

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

  /** `struct(cell, ang)`: the nearest centroid's index and the angle
    * to it. Since r20 this is the REFERENCE-OBJECT expression
    * ([[graft.functions.NearestUnitCell]] — the centroid table rides
    * the expression as a plain JVM array, the `might_contain` pattern),
    * so generated code and plan size are O(1) in K instead of the
    * previous O(K·dim) literal fold — the large-K scale fix the r19
    * verdict named, and a per-row win at small K too (one tight
    * primitive loop instead of K folded Catalyst aggregates).
    * Tie-break and arithmetic are decision-identical to the literal
    * fold ([[nearestCellStructLit]], kept for the pinning spec):
    * max cosine, ties to the smaller cell id, `acos` clamped the
    * `least(greatest(c,-1),1)` way. */
  private[graft] def nearestCellStruct(cents: Array[Array[Double]],
                                       v: Column, nrm: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(graft.functions.NearestUnitCell(
      bridge.expression(v), bridge.expression(nrm), cents))
  }

  /** The pre-r20 centroid-LITERAL fold — a `greatest` over K
    * `(cosine, -cell)` structs (lexicographic, so ties break toward
    * the SMALLER cell id). Kept as the pinning twin:
    * `AutoBlockSpec` asserts literal ≡ reference-object assignment on
    * real corpora including K = 256. */
  private[graft] def nearestCellStructLit(cents: Array[Array[Double]],
                                          v: Column, nrm: Column): Column = {
    val scored = cents.toSeq.zipWithIndex.map { case (c, i) =>
      struct((graft.functions.GraftExtensions.dot(v, typedLit(c.toSeq)) / nrm)
        .as("c"), lit(-i).as("nc"))
    }
    val best = if (scored.size == 1) scored.head else greatest(scored: _*)
    struct((-best.getField("nc")).as("cell"),
      acos(least(greatest(best.getField("c"), lit(-1.0)), lit(1.0))).as("ang"))
  }

  /** `array<int>` of the `nprobe` nearest cells for a probe row —
    * cosine descending, cell id ascending on ties — as the
    * reference-object router ([[graft.functions.RoutedUnitCells]]).
    * Replaces the per-site `sort_array(array(K structs), asc=false)`
    * construction (plan-size O(K·dim)); order is pinned identical by
    * AutoBlockSpec's routing twin test. */
  private[graft] def routedCellIds(cents: Array[Array[Double]],
                                   v: Column, nrm: Column,
                                   nprobe: Int): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(graft.functions.RoutedUnitCells(
      bridge.expression(v), bridge.expression(nrm), cents, nprobe))
  }

  /** The qualifying cell-pair list (BOTH directions + diagonal): the
    * pair join emits each unordered vector pair exactly once via its
    * own `(cell_a, cell_b)` direction under the `id_a < id_b` filter.
    * The 1e-6 RADIAN margin absorbs driver-vs-codegen double rounding
    * in the angle computation INCLUDING acos's error amplification: a
    * ~1e-15 cosine discrepancy near cosine ±1 maps to ~1e-8 of angle
    * (d/dx acos → ∞ as |x| → 1), so a bare-ulp margin could prune a
    * cell pair holding a rounding-band vector pair and break the
    * exactness guarantee. A false-positive cell pair only costs
    * verification work; a false negative would cost exactness — so the
    * margin is sized for the worst amplification, not the common
    * case. */
  private[graft] def qualifyingCellPairs(cents: Array[Array[Double]],
                                         radii: Map[Int, Double],
                                         theta: Double): Seq[(Int, Int)] =
    for {
      (ci, ri) <- radii.toSeq
      (cj, rj) <- radii.toSeq
      if angle(cents(ci), cents(cj)) <= ri + rj + theta + 1e-6
    } yield (ci, cj)

  /** DIRECTED qualifying cell pairs for the two-sided (A vs B) join:
    * `ci` ranges over the A side's occupied cells with A-side radii,
    * `cj` over the B side's with B-side radii. Triangle inequality as
    * in [[qualifyingCellPairs]]: for a ∈ cell(ci), b ∈ cell(cj) with
    * angle(a,b) <= θ, angle(c_i,c_j) <= rA_i + θ + rB_j — so
    * enumerating pairs within that bound (plus the same 1e-6 rounding
    * margin) can never structurally miss a qualifying (a, b). Both
    * sides are assigned against the SAME centroid set; the radii are
    * per-side because each side's members spread differently around
    * the shared centroids. */
  private[graft] def qualifyingCellPairsAB(cents: Array[Array[Double]],
                                           radiiA: Map[Int, Double],
                                           radiiB: Map[Int, Double],
                                           theta: Double): Seq[(Int, Int)] =
    for {
      (ci, ra) <- radiiA.toSeq
      (cj, rb) <- radiiB.toSeq
      if angle(cents(ci), cents(cj)) <= ra + rb + theta + 1e-6
    } yield (ci, cj)
}
