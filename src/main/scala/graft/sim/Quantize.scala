package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar (SQ8) embedding quantization + asymmetric-distance (ADC)
  * search — the compression leg of a production ANN stack (FAISS's
  * `SQ8` / IVF-ADC scheme): store 1 byte per dimension instead of a
  * 4-byte float (4× smaller index; at 100 TB of embeddings that is
  * the difference between an index that fits executor memory and one
  * that doesn't), and score queries against DEQUANTIZED codes so
  * only the query vector stays full-precision.
  *
  * Everything is deterministic arithmetic (min/max, one division,
  * floor — no transcendentals, no data-dependent iteration like
  * k-means), so an external engine reproduces codes and distances
  * bit-for-bit; the q100/q101 gates pin exactly that.
  *
  * Distributed shape: params = ONE corpus pass (posexplode →
  * map-side-combined per-dimension min/max → 64-row frame); coding =
  * broadcast params + a narrow per-row `transform`; ADC top-k =
  * narrow per-row fold + `orderBy(...).limit(k)` which Spark
  * executes as TakeOrdered (per-partition bounded heaps + driver
  * merge of k·partitions rows — no global sort, no full shuffle).
  */
object Quantize {

  /** Per-dimension quantization range over the corpus, as ONE
    * broadcastable row `(mins: array<double>, maxs: array<double>)`
    * in dimension order. */
  def sq8Params(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(min(col("v").cast("double")).as("mn"),
        max(col("v").cast("double")).as("mx"))
      .agg(array_sort(collect_list(struct(col("pos"), col("mn"),
        col("mx")))).as("pm"))
      .select(transform(col("pm"), s => s.getField("mn")).as("mins"),
        transform(col("pm"), s => s.getField("mx")).as("maxs"))

  /** Adds `codes: array<int>` — per dimension,
    * `floor((x - min) / (max - min) * 256)` clamped to [0, 255]
    * (x = max lands on 256 → 255; a constant dimension codes 0; the
    * low clamp matters when FROZEN params from [[saveParams]] code a
    * later batch whose values undershoot the trained range).
    * Carries `mins`/`maxs` along for the ADC consumer. */
  def withSq8Codes(df: DataFrame, vecCol: String,
                   params: DataFrame): DataFrame =
    df.crossJoin(broadcast(params))
      .withColumn("codes", transform(col(vecCol), (x, i) => {
        val mn = element_at(col("mins"), i + 1)
        val mx = element_at(col("maxs"), i + 1)
        when(mx === mn, lit(0)).otherwise(
          greatest(lit(0), least(lit(255),
            floor((x.cast("double") - mn) / (mx - mn) * 256).cast("int"))))
      }))

  /** The ADC scoring expression: squared L2 between the exact probe
    * array `q` and the midpoint-dequantized codes, summed in
    * dimension order (sequential fold — cross-engine reproducible),
    * rounded to 6dp. Expects `q`/`mins`/`maxs`/`codes` in scope. */
  private def adcDist: org.apache.spark.sql.Column = round(
    aggregate(sequence(lit(0), size(col("q")) - 1), lit(0.0),
      (acc, i) => {
        val qi = element_at(col("q"), i + 1)
        val mn = element_at(col("mins"), i + 1)
        val mx = element_at(col("maxs"), i + 1)
        val de = mn +
          (element_at(col("codes"), i + 1).cast("double") + 0.5) *
            (mx - mn) / 256
        acc + (qi - de) * (qi - de)
      }), 6)

  /** Asymmetric top-k: the probe vector stays exact, every other
    * vector is reconstructed from its codes at the cell midpoint
    * (`min + (code + 0.5) * (max - min) / 256`), scored by [[adcDist]],
    * smallest first with id tie-break. Returns `(idCol, adist)`. */
  def adcTopK(df: DataFrame, idCol: String, vecCol: String,
              probeId: Long, k: Int): DataFrame = {
    val coded = withSq8Codes(df, vecCol, sq8Params(df, vecCol))
    val probe = df.filter(col(idCol) === probeId)
      .select(col(vecCol).cast("array<double>").as("q"))
    coded.filter(col(idCol) =!= probeId).crossJoin(broadcast(probe))
      .withColumn("adist", adcDist)
      .orderBy(col("adist"), col(idCol))
      .limit(k)
      .select(col(idCol), col("adist"))
  }

  /** The full FAISS-style IVF-ADC shape: rank cells (`blockCol`) by
    * centroid cosine to the probe ([[Similarity.centroids]] — the
    * same tiny broadcast table the exact IVF path uses), then
    * ADC-score ONLY the `nprobe` nearest cells' codes. At 100 TB the
    * scan touches nprobe/#cells of a 4×-compressed index — the two
    * savings compose. Returns `(idCol, adist)` (k smallest). */
  def ivfAdcTopK(df: DataFrame, idCol: String, vecCol: String,
                 blockCol: String, probeId: Long, nprobe: Int,
                 k: Int): DataFrame = {
    val coded = withSq8Codes(df, vecCol, sq8Params(df, vecCol))
    val probeVec = df.filter(col(idCol) === probeId)
      .select(col(vecCol).as("probe_vec"))
    val topCells = Similarity.centroids(df, blockCol, vecCol)
      .crossJoin(broadcast(probeVec))
      // cell-id secondary key: cosine ties would otherwise make the
      // nprobe cutoff nondeterministic (the batch path + q106 oracle
      // both tie-break on the cell id).
      .orderBy(Similarity.cosine(col("centroid"), col("probe_vec")).desc,
        col(blockCol))
      .limit(nprobe)
      .select(col(blockCol))
    val probe = probeVec.select(col("probe_vec").cast("array<double>").as("q"))
    coded.join(broadcast(topCells), Seq(blockCol), "left_semi")
      .filter(col(idCol) =!= probeId)
      .crossJoin(broadcast(probe))
      .withColumn("adist", adcDist)
      .orderBy(col("adist"), col(idCol))
      .limit(k)
      .select(col(idCol), col("adist"))
  }

  /** Batch IVF-ADC: a whole probe TABLE against the compressed
    * index — every probe is routed to its `nprobe` centroid-nearest
    * cells (bounded-heap TopKPerGroup over the tiny
    * probe × centroid frame, cell-id tie-break so the cutoff is
    * deterministic), candidates come from ONE cell-keyed join of the
    * coded corpus against the broadcast (probe, cell) routing table,
    * and the final per-probe top-k is again TopKPerGroup — no full
    * sort, no corpus-sized shuffle beyond the cell join. Returns
    * `(probe_id, rank, idCol, adist)`. */
  def ivfAdcTopKBatch(corpus: DataFrame, probes: DataFrame,
                      idCol: String, vecCol: String, blockCol: String,
                      nprobe: Int, k: Int): DataFrame = {
    val coded = withSq8Codes(corpus, vecCol, sq8Params(corpus, vecCol))
    val cents = Similarity.centroids(corpus, blockCol, vecCol)
    val prep = probes.select(col(idCol).as("probe_id"),
      col(vecCol).cast("array<double>").as("q"), col(vecCol).as("_pv"))
    val routing = graft.ops.TopK.topKPerGroup(
        prep.crossJoin(broadcast(cents))
          .withColumn("_csim",
            Similarity.cosine(col("centroid"), col("_pv"))),
        Seq("probe_id"), Seq(("_csim", false), (blockCol, true)),
        nprobe, "_crank")
      .select(col("probe_id"), col("q"), col(blockCol))
    val cand = coded.join(broadcast(routing), Seq(blockCol))
      .filter(col(idCol) =!= col("probe_id"))
      .withColumn("adist", adcDist)
    graft.ops.TopK.topKPerGroup(cand, Seq("probe_id"),
        Seq(("adist", true), (idCol, true)), k, "rank")
      .select(col("probe_id"), col("rank"), col(idCol), col("adist"))
  }

  /** [[ivfAdcTopKBatch]] over SELF-TRAINED cells — no caller block
    * column: [[AutoBlock.fitCells]] trains `numCells` angular
    * centroids (deterministic distinct-vector seeds + spherical
    * k-means; `numCells = 0` derives K from the corpus count), or a
    * pre-trained [[CellIndex]] skips training entirely (the
    * train-once/query-many production shape — numCells/refineIters
    * are then ignored). Corpus codes are assigned by the codegen'd
    * centroid-literal expression (zero shuffle); probes route via ONE
    * codegen'd sort of the K (cosine, cell) structs (cell-id
    * tie-break — deterministic cutoff); the ADC scoring and
    * bounded-heap top-k are [[ivfAdcTopKBatch]]'s exactly. Zero-norm
    * vectors drop on both sides (angular routing has no direction
    * for them — [[Similarity.ivfTopKBatch]]'s rule). `nprobe >=
    * numCells` searches every cell ⇒ exactly the flat ADC top-k at
    * ANY centroid quality (the q148 gate pins that against an oracle
    * with no k-means in it). */
  def ivfAdcTopKBatchAuto(corpus: DataFrame, probes: DataFrame,
                          idCol: String, vecCol: String,
                          nprobe: Int, k: Int,
                          numCells: Int = 0, refineIters: Int = 1,
                          index: Option[CellIndex] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
        Similarity.norm(col(vecCol)).as("nrm"))
      .filter(col("v").isNotNull && Similarity.finiteNorm(col("nrm")))
    val cents = index.map(_.centroids).getOrElse(AutoBlock.fitCells(base,
      AutoBlock.resolveCells(numCells, base.count()), refineIters))
    val p0 = probes.select(col(idCol).as("probe_id"),
        col(vecCol).cast("array<double>").as("q"), col(vecCol).as("_pv"),
        Similarity.norm(col(vecCol)).as("_pnrm"))
      .filter(col("q").isNotNull && Similarity.finiteNorm(col("_pnrm")))
    if (cents.isEmpty)
      return p0.select(col("probe_id"), lit(1L).as("rank"),
        col("probe_id").as(idCol), lit(0.0).as("adist")).limit(0)
    val coded = withSq8Codes(corpus, vecCol, sq8Params(corpus, vecCol))
      .withColumn("_nrm", Similarity.norm(col(vecCol)))
      .filter(col(vecCol).isNotNull && Similarity.finiteNorm(col("_nrm")))
      .withColumn("_cell", AutoBlock
        .nearestCellStruct(cents, col(vecCol), col("_nrm")).getField("cell"))
    // reference-object router (r20): plan-size O(1) in K, order
    // pinned identical to the old K-struct sort_array construction
    val routed = p0
      .withColumn("_cells", AutoBlock.routedCellIds(cents, col("_pv"),
        col("_pnrm"), math.min(nprobe, cents.length)))
      .select(col("probe_id"), col("q"), explode(col("_cells")).as("_cell"))
    val cand = coded.join(broadcast(routed), Seq("_cell"))
      .filter(col(idCol) =!= col("probe_id"))
      .withColumn("adist", adcDist)
    graft.ops.TopK.topKPerGroup(cand, Seq("probe_id"),
        Seq(("adist", true), (idCol, true)), k, "rank")
      .select(col("probe_id"), col("rank"), col(idCol), col("adist"))
  }

  /** Recall audit for the compressed index — the "did quantization
    * hurt" gauge (q68's recall-contract pattern, applied to SQ8):
    * per probe, how many of the ADC top-k survive in the EXACT
    * squared-L2 top-k over the same candidates. Deliberately
    * brute-force (it measures the index, it IS not the index);
    * run on a sampled probe set in production. Integer output:
    * `(probe_id, n_overlap)` — exact cross-engine. */
  def adcRecallBatch(corpus: DataFrame, probes: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val coded = withSq8Codes(corpus, vecCol, sq8Params(corpus, vecCol))
      .withColumn("_v", col(vecCol).cast("array<double>"))
    val prep = probes.select(col(idCol).as("probe_id"),
      col(vecCol).cast("array<double>").as("q"))
    val exactDist = round(
      aggregate(sequence(lit(0), size(col("q")) - 1), lit(0.0),
        (acc, i) => {
          val qi = element_at(col("q"), i + 1)
          val vi = element_at(col("_v"), i + 1)
          acc + (qi - vi) * (qi - vi)
        }), 6)
    val scored = coded.crossJoin(broadcast(prep))
      .filter(col(idCol) =!= col("probe_id"))
      .withColumn("adist", adcDist)
      .withColumn("xdist", exactDist)
    val ar = graft.ops.TopK.topKPerGroup(scored, Seq("probe_id"),
      Seq(("adist", true), (idCol, true)), k, "_ar")
    val xr = graft.ops.TopK.topKPerGroup(scored, Seq("probe_id"),
      Seq(("xdist", true), (idCol, true)), k, "_xr")
    ar.select(col("probe_id"), col(idCol))
      .join(xr.select(col("probe_id"), col(idCol))
        .withColumn("_hit", lit(1)), Seq("probe_id", idCol), "left")
      .groupBy(col("probe_id"))
      .agg(count(col("_hit")).as("n_overlap"))
      .select(col("probe_id"), col("n_overlap"))
  }

  /** Persist SQ8 params as a 1-row parquet artifact — the train-once
    * half of the incremental matrix (like CellIndex / LSH sigs): a
    * daily batch codes new vectors with FROZEN ranges, so codes stay
    * comparable across batches without re-reading the corpus. */
  def saveParams(params: DataFrame, path: String): Unit =
    params.coalesce(1).write.mode("overwrite").parquet(path)

  /** Load a [[saveParams]] artifact; fails loudly if it does not
    * carry exactly one row of `mins`/`maxs`. */
  def loadParams(spark: org.apache.spark.sql.SparkSession,
                 path: String): DataFrame = {
    val p = spark.read.parquet(path)
    require(p.columns.toSet == Set("mins", "maxs"),
      s"not an SQ8 params artifact: ${p.columns.mkString(",")}")
    require(p.count() == 1, "SQ8 params artifact must be exactly one row")
    p
  }
}
