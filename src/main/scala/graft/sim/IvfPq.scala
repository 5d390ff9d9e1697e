package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TRAINED residual product quantization — the retrieval-quality tier
  * past [[Pq]]'s seeded-sample codebooks (FAISS's `IVFx,PQm` +
  * refine construction): a coarse K-cell quantizer is Lloyd-trained
  * over the corpus, every vector is coded as its cell plus the PQ
  * codes of its RESIDUAL against the cell centroid (residuals are
  * far smaller than raw vectors, so the same code budget buys much
  * tighter reconstruction), and queries re-rank an ADC shortlist by
  * exact distance fetched per id (the `IndexRefineFlat` stage). The
  * round-18 audit measured the sampled/raw construction at
  * recall@10 = 1.52/10; this path measures 8.2–8.8/10 at the same
  * m=8 code budget (q147 carries the audit).
  *
  * EVERYTHING here runs in 2^20 FIXED-POINT integer arithmetic:
  * coordinates quantize once (`floor(x * 2^20)` — exact in any IEEE
  * engine), and from there Lloyd sums, centroid means
  * (`Math.floorDiv`), assignment distances, residuals, ADC lookup
  * tables and refine distances are all plain integer adds and
  * multiplies. Integer addition is associative and commutative, so
  * NO step depends on partition order or fold association — the
  * whole train → code → search pipeline is bit-exact run-to-run and
  * engine-to-engine without the double-fold ordering discipline the
  * raw-[[Pq]] gates need (q145–q147 pin it against DuckDB with plain
  * SUMs). Quantization costs < 1e-6 per coordinate — invisible next
  * to the PQ approximation the recall audit actually measures.
  *
  * Distributed shape: training folds map-side over a bounded seeded
  * SAMPLE (`trainSample` — cost never grows past it); the model is
  * O((K + m·ks)·dim) longs of driver-held parameters broadcast as
  * expression literals (never data rows); coding is one narrow
  * codegen'd pass (cell + m codes per vector — ~9 small ints, the
  * 100 TB index); search routes probes to `nprobe` cells on the
  * broadcast side, builds each (probe, cell) ADC lookup table once,
  * joins candidates by cell key only, heaps top-`refine` per probe
  * ([[graft.ops.TopK.topKPerGroup]]), and only then fetches the
  * shortlisted ids' raw vectors for the exact re-rank — the index
  * never stores full-precision vectors.
  */
object IvfPq {

  /** Fixed-point scale: 2^20 — a power of two, so `cq / Scale` is
    * exact in double and `floor(x · Scale)` is the same integer in
    * every IEEE engine. */
  val ScaleBits: Int = 20
  val Scale: Long = 1L << ScaleBits

  /** Default training-sample bound: Lloyd iteration cost is
    * O(sample · K · dim) regardless of corpus size. */
  val DefaultTrainSample: Int = 1 << 16

  /** Samples up to this size train ON THE DRIVER after one collect
    * (64k × 64-dim longs ≈ 33 MB — model-fit input, the k-means
    * contract): integer arithmetic is order-free, so the local loop
    * is bit-identical to the distributed fold while paying ONE Spark
    * job instead of ~(coarseIters + pqIters) job round-trips whose
    * scheduling latency dominates at any scale (the corpus-sized
    * work — coding, search — is distributed either way; only the
    * bounded model fit moves). Larger `trainSample`s keep the
    * distributed iteration. IvfPqSpec pins local ≡ distributed. */
  val LocalTrainMax: Int = 1 << 16

  /** The trained model: `coarse(cell)(dim)` cell centroids and
    * `books(sub)(cid)(subDim)` per-subvector residual codebooks, all
    * in [[Scale]] fixed point — O((K + m·ks)·dim) driver-held longs,
    * broadcast as expression literals. */
  case class Model(coarse: Array[Array[Long]],
                   books: Array[Array[Array[Long]]]) {
    require(coarse.nonEmpty, "IvfPq.Model: no coarse centroids")
    require(books.nonEmpty, "IvfPq.Model: no codebooks")
    val dim: Int = coarse.head.length
    val m: Int = books.length
    val subDim: Int = books.head.head.length
    require(coarse.forall(_.length == dim),
      "IvfPq.Model: ragged coarse centroids")
    require(books.forall(b => b.nonEmpty && b.forall(_.length == subDim)),
      "IvfPq.Model: ragged codebooks")
    require(books.forall(_.length == books.head.length),
      "IvfPq.Model: codebooks differ in ks across subvectors")
    require(m * subDim == dim,
      s"IvfPq.Model: m=$m × subDim=$subDim does not tile dim=$dim")
    def kCells: Int = coarse.length
    def ks: Int = books.head.length

    /** Persist as parquet rows `(part, sub, cid, cent)` —
      * `part='coarse'` rows carry `sub=0, cid=cell`; `part='book'`
      * rows carry the per-subvector codebooks. Engine-readable longs,
      * not JVM serialization. */
    def save(spark: SparkSession, path: String): Unit = {
      import spark.implicits._
      val rows =
        coarse.zipWithIndex.map { case (c, i) => ("coarse", 0, i, c.toSeq) } ++
        books.zipWithIndex.flatMap { case (b, s) =>
          b.zipWithIndex.map { case (c, j) => ("book", s, j, c.toSeq) } }
      rows.toSeq.toDF("part", "sub", "cid", "cent")
        .coalesce(1).write.mode("overwrite").parquet(path)
    }
  }

  /** Load a [[Model.save]] artifact; fails loudly on wrong columns,
    * non-contiguous cell/sub/cid ranges, ragged dims, or a coarse
    * dim the books do not tile — the [[Pq.loadCodebook]] discipline
    * (codes index the model POSITIONALLY; a silent gap would
    * misalign every later code). */
  def loadModel(spark: SparkSession, path: String): Model = {
    val df = spark.read.parquet(path)
    require(df.columns.toSet == Set("part", "sub", "cid", "cent"),
      s"not an IvfPq model artifact: ${df.columns.mkString(",")}")
    val rows = df.select(col("part"), col("sub"), col("cid"), col("cent"))
      .collect()
    val coarseRows = rows.filter(_.getString(0) == "coarse")
      .map(r => r.getInt(2) -> r.getSeq[Long](3).toArray).sortBy(_._1)
    val bookRows = rows.filter(_.getString(0) == "book")
      .map(r => (r.getInt(1), r.getInt(2), r.getSeq[Long](3).toArray))
    require(coarseRows.nonEmpty && bookRows.nonEmpty,
      s"IvfPq model at $path is missing its coarse or book rows")
    require(coarseRows.map(_._1).toSeq == coarseRows.indices.toSeq,
      s"IvfPq model at $path: cell ids are not the contiguous range " +
        s"0..${coarseRows.length - 1}")
    val subs = bookRows.map(_._1).distinct.sorted.toSeq
    require(subs == (0 until subs.length).toSeq,
      s"IvfPq model at $path: subs are not the contiguous range " +
        s"0..${subs.length - 1}")
    val books = subs.map { s =>
      val cs = bookRows.filter(_._1 == s).map(r => r._2 -> r._3).sortBy(_._1)
      require(cs.map(_._1).toSeq == cs.indices.toSeq,
        s"IvfPq model at $path: sub $s cids are not contiguous 0..${cs.length - 1}")
      cs.map(_._2)
    }
    require(books.map(_.length).distinct.length == 1,
      s"IvfPq model at $path: ks differs across subvectors")
    Model(coarseRows.map(_._2), books.map(_.toArray).toArray)
  }

  /** `array<long>` fixed-point quantization of a float/double vector:
    * `floor(x · 2^20)` per coordinate. Prefer [[quantizeChecked]] at
    * any site that knows the dimension — this raw form has no
    * overflow guard. */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(Scale.toDouble)))

  /** Largest |coordinate| the fixed-point distance arithmetic can
    * carry at dimension `dim` with NO possibility of Long overflow:
    * [[iDist]] sums `dim` squares of differences, each difference at
    * most `2·max·Scale`, so safety needs
    * `dim · (2·max·Scale)² < Long.MaxValue`, i.e.
    * `max < sqrt(Long.MaxValue / dim) / 2 / Scale` (~181 at dim 64).
    * Embedding pipelines are far below this (unit-norm coordinates
    * are ≤ 1), but a caller feeding raw un-normalized features would
    * otherwise get silently garbled argmins — [[ilog2f]]'s
    * enforce-the-domain discipline applied here too (ADVICE r19). */
  def maxAbsCoord(dim: Int): Double =
    math.sqrt(Long.MaxValue.toDouble / dim) / 2.0 / Scale.toDouble

  /** [[quantize]] with the [[maxAbsCoord]] guard: any coordinate at
    * or beyond the bound fails LOUDLY instead of corrupting every
    * downstream distance. Identical output to [[quantize]] on all
    * in-range input. */
  def quantizeChecked(vec: Column, dim: Int): Column = {
    val bound = maxAbsCoord(dim)
    transform(vec, x =>
      when(abs(x.cast("double")) >= lit(bound) ||
          isnan(x.cast("double")),
        raise_error(concat(
          lit(s"IvfPq: |coordinate| >= $bound (or NaN) overflows the " +
            s"2^$ScaleBits fixed-point distance arithmetic at " +
            s"dim=$dim — normalize or rescale embeddings first (got "),
          x.cast("string"), lit(")"))).cast("long"))
        .otherwise(floor(x.cast("double") * lit(Scale.toDouble))))
  }

  /** Integer squared L2 between two `array<long>` columns — a plain
    * sum of per-dim squares (associative: fold order is irrelevant,
    * unlike the double-arithmetic [[Pq]] folds). */
  private def iDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, t) => acc + t)

  /** Argmin cell over a centroid-list LITERAL: fold over the list,
    * strict `<` so the SMALLEST index wins exact ties. Superseded in
    * every production path by the reference-object expression
    * ([[nearestCell]] — r20, the large-K fix: plan/codegen O(1) in K
    * instead of O(K·dim)); kept as the pinning twin IvfPqSpec asserts
    * bit-equal at K = 256. */
  private[graft] def nearestLit(vq: Column, cents: Column, n: Int): Column =
    aggregate(sequence(lit(0), lit(n - 1)),
      struct(lit(Long.MaxValue).as("d"), lit(-1).as("c")),
      (acc, c) => {
        val d = iDist(vq, element_at(cents, c + 1))
        when(d < acc.getField("d"),
          struct(d.as("d"), c.cast("int").as("c"))).otherwise(acc)
      }).getField("c")

  private[graft] def coarseLit(model: Model): Column =
    typedLit(model.coarse.map(_.toSeq).toSeq)

  private def booksLit(model: Model): Column =
    typedLit(model.books.map(_.map(_.toSeq).toSeq).toSeq)

  // ---- reference-object expression builders (r20) -------------------
  // The centroid/book tables ride the expression as plain JVM arrays
  // (graft.functions.CellOps — the `might_contain` pattern), so plan
  // size and generated code are O(1) in K at any cell count; the
  // argmin arithmetic and tie-breaks are decision-identical to the
  // literal folds above (IvfPqSpec pins it at K=256).

  private def nearestCell(vq: Column, cents: Array[Array[Long]]): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(graft.functions.NearestLongCell(
      bridge.expression(vq), cents))
  }

  private def nearestCellGrouped(vq: Column, g: Column,
                                 cents3: Array[Array[Array[Long]]]): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(graft.functions.NearestLongCellGrouped(
      bridge.expression(vq), bridge.expression(g), cents3))
  }

  private def residualCol(vq: Column, cell: Column,
                          cents: Array[Array[Long]]): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(graft.functions.LongCellResidual(
      bridge.expression(vq), bridge.expression(cell), cents))
  }

  private def probeLutCol(prl: Column,
                          books: Array[Array[Array[Long]]]): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(graft.functions.LongProbeLut(
      bridge.expression(prl), books))
  }

  private def routedCellsCol(vq: Column, cents: Array[Array[Long]],
                             nprobe: Int): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(graft.functions.RoutedLongCells(
      bridge.expression(vq), cents, nprobe))
  }

  /** One fixed-point Lloyd refinement pass shared by the coarse and
    * per-subvector trainings: rows are `(g, vq)` with `g` the
    * codebook group (0 for coarse; the subvector index for PQ),
    * centroids are `cents(g)(cid)(dim)`. Assignment is the codegen'd
    * [[nearestLit]] fold per group; the update is ONE map-side-
    * combined `(g, cid, pos) → (Σ, n)` aggregate whose collect is
    * model-sized (≤ groups·k·dim rows), with `Math.floorDiv` means
    * (long sums — partition-order-exact) and empty cells keeping
    * their previous centroid. */
  private def lloyd(rows: DataFrame, cents: Array[Array[Array[Long]]],
                    iters: Int): Array[Array[Array[Long]]] = {
    var cur = cents
    var it = 0
    while (it < iters) {
      val sums = rows
        .withColumn("_cell", nearestCellGrouped(col("vq"), col("g"), cur))
        .select(col("g"), col("_cell"),
          posexplode(col("vq")).as(Seq("_p", "_v")))
        .groupBy(col("g"), col("_cell"), col("_p"))
        .agg(sum(col("_v")).as("_s"), count(lit(1)).as("_n"))
        .collect()
      val next = cur.map(_.map(_.clone()))
      sums.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
          Math.floorDiv(r.getLong(3), r.getLong(4))
      }
      cur = next
      it += 1
    }
    cur
  }

  /** Validate + project the corpus to `(id, xq)` — null vectors
    * dropped, uniform dimension divisible by `m` enforced (ONE
    * size-only aggregate, the [[Pq]] compatibility discipline). */
  private def quantized(df: DataFrame, idCol: String, vecCol: String,
                        m: Int, site: String): DataFrame = {
    val base = df.filter(col(vecCol).isNotNull)
    val dims = base.agg(min(size(col(vecCol))), max(size(col(vecCol)))).head()
    require(!dims.isNullAt(0), s"$site: empty corpus")
    require(dims.getInt(0) == dims.getInt(1),
      s"$site: ragged vectors (dims ${dims.getInt(0)}..${dims.getInt(1)})")
    require(dims.getInt(0) % m == 0,
      s"$site: dimension ${dims.getInt(0)} not divisible by m=$m")
    base.select(col(idCol).as("_tid"),
      quantizeChecked(col(vecCol), dims.getInt(0)).as("xq"))
  }

  /** Validate a frame against a (possibly FROZEN) model — dimension
    * must equal `model.dim` exactly, or the artifact belongs to a
    * different embedding space. */
  private def requireDim(df: DataFrame, vecCol: String, model: Model,
                         site: String): Unit = {
    val dims = df.filter(col(vecCol).isNotNull)
      .agg(min(size(col(vecCol))), max(size(col(vecCol)))).head()
    require(!dims.isNullAt(0), s"$site: empty frame")
    require(dims.getInt(0) == dims.getInt(1) && dims.getInt(0) == model.dim,
      s"$site: frame dims ${dims.getInt(0)}..${dims.getInt(1)} do not " +
        s"match the model's dim=${model.dim} — the artifact belongs to " +
        "a different embedding space")
  }

  /** Train the full model: seeded-sample init (first `kCells` / `ks`
    * corpus vectors by `(md5_32(seed|id), id)` — [[Pq.pqCodebook]]'s
    * donor rule), `coarseIters` fixed-point Lloyd passes for the
    * K-cell coarse quantizer, then `pqIters` passes per subvector
    * over the coarse RESIDUALS (the FAISS IVF-PQ construction — the
    * codebooks model what the cells do not). Training reads only the
    * `trainSample` seeded-first rows (cost bounded at any corpus
    * size); the returned [[Model]] codes any number of batches. */
  def train(df: DataFrame, idCol: String, vecCol: String,
            kCells: Int, m: Int, ks: Int,
            coarseIters: Int = 4, pqIters: Int = 3, seed: Int = 0,
            trainSample: Int = DefaultTrainSample): Model = {
    require(kCells >= 1 && ks >= 1 && m >= 1 &&
      coarseIters >= 0 && pqIters >= 0,
      s"IvfPq.train: bad params kCells=$kCells m=$m ks=$ks " +
        s"coarseIters=$coarseIters pqIters=$pqIters")
    require(trainSample >= math.max(kCells, ks),
      s"IvfPq.train: trainSample=$trainSample smaller than the donor " +
        s"count max(kCells=$kCells, ks=$ks)")
    val q = quantized(df, idCol, vecCol, m, "IvfPq.train")
    val u = graft.text.TextOps.md5_32(
      concat(lit(s"$seed|"), col("_tid").cast("string")))
    if (trainSample <= LocalTrainMax) {
      // bounded sample ⇒ one collect, local integer Lloyd — bit-equal
      // to the distributed path below (order-free arithmetic), minus
      // its per-iteration job latency. TakeOrdered keeps donor order.
      val data = q.withColumn("_u", u)
        .orderBy(col("_u"), col("_tid"))
        .limit(trainSample)
        .select(col("xq")).collect()
        .map(_.getSeq[Long](0).toArray)
      require(data.nonEmpty, "IvfPq.train: empty corpus")
      return trainLocal(data, kCells, m, ks, coarseIters, pqIters)
    }
    val smp = q.withColumn("_u", u)
      .orderBy(col("_u"), col("_tid"))
      .limit(trainSample)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // donors: the seeded-first rows of the SAME ordering (⊆ sample)
      val donors = smp.orderBy(col("_u"), col("_tid"))
        .limit(math.max(kCells, ks))
        .select(col("xq")).collect()
        .map(_.getSeq[Long](0).toArray)
      require(donors.length >= 1, "IvfPq.train: empty corpus")
      val coarse0 = Array(donors.take(math.min(kCells, donors.length)))
      val coarse = lloyd(
        smp.select(lit(0).as("g"), col("xq").as("vq")),
        coarse0, coarseIters).head
      // residuals of the sample against the trained coarse cells
      val res = smp.withColumn("_cell", nearestCell(col("xq"), coarse))
        .withColumn("_rq", residualCol(col("xq"), col("_cell"), coarse))
      val subDim = donors.head.length / m
      // book init: the donors' residuals, sliced per subvector
      val donorRes = res.orderBy(col("_u"), col("_tid"))
        .limit(math.min(ks, donors.length))
        .select(col("_rq")).collect()
        .map(_.getSeq[Long](0).toArray)
      val books0 = Array.tabulate(m)(s =>
        donorRes.map(_.slice(s * subDim, (s + 1) * subDim)))
      val subRows = res.select(
        posexplode(transform(sequence(lit(0), lit(m - 1)), s =>
          slice(col("_rq"), s * subDim + 1, lit(subDim))))
          .as(Seq("g", "vq")))
      val books = lloyd(subRows, books0, pqIters)
      Model(coarse, books)
    } finally { smp.unpersist(); () }
  }

  /** The driver-local training loop — the same donors (`data` arrives
    * in seeded order), the same integer Lloyd (strict-< argmin,
    * `Math.floorDiv` means, empty cells keep their centroid), the
    * same residual book construction as the distributed path. */
  private def trainLocal(data: Array[Array[Long]], kCells: Int, m: Int,
                         ks: Int, ci: Int, pi: Int): Model = {
    val dim = data.head.length
    val sd = dim / m
    def iD(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    def argmin(v: Array[Long], cents: Array[Array[Long]]): Int = {
      var bi = 0; var bd = Long.MaxValue; var j = 0
      while (j < cents.length) {
        val d = iD(v, cents(j))
        if (d < bd) { bd = d; bi = j }
        j += 1
      }
      bi
    }
    def lloyd(pts: Array[Array[Long]], init: Array[Array[Long]],
              iters: Int): Array[Array[Long]] = {
      var c = init
      var it = 0
      while (it < iters) {
        val asg = pts.map(argmin(_, c))
        val next = c.map(_.clone())
        val sums = Array.fill(c.length, c.head.length)(0L)
        val cnt = new Array[Long](c.length)
        var r = 0
        while (r < pts.length) {
          val cell = asg(r); val v = pts(r)
          var p = 0
          while (p < v.length) { sums(cell)(p) += v(p); p += 1 }
          cnt(cell) += 1
          r += 1
        }
        var cell = 0
        while (cell < c.length) {
          if (cnt(cell) > 0) {
            var p = 0
            while (p < next(cell).length) {
              next(cell)(p) = Math.floorDiv(sums(cell)(p), cnt(cell))
              p += 1
            }
          }
          cell += 1
        }
        c = next
        it += 1
      }
      c
    }
    val coarse = lloyd(data,
      data.take(math.min(kCells, data.length)).map(_.clone()), ci)
    val resid = data.map { v =>
      val c = coarse(argmin(v, coarse))
      Array.tabulate(v.length)(i => v(i) - c(i))
    }
    val donorRes = resid.take(math.min(ks, resid.length))
    val books = Array.tabulate(m) { s =>
      lloyd(resid.map(_.slice(s * sd, (s + 1) * sd)),
        donorRes.map(_.slice(s * sd, (s + 1) * sd)), pi)
    }
    Model(coarse, books)
  }

  /** Code a frame against a trained model: adds `xq` (fixed-point
    * vector), `cell` (nearest coarse centroid, integer argmin,
    * smallest-cell tie-break) and `codes` (per subvector, the argmin
    * codebook entry for the RESIDUAL) — one narrow codegen'd pass;
    * `cell` + `codes` (~m+1 small ints) are the stored index. */
  def withCodes(df: DataFrame, vecCol: String, model: Model): DataFrame = {
    requireDim(df, vecCol, model, "IvfPq.withCodes")
    val sd = model.subDim
    // reference-object assignment (r20): cell, residual and per-sub
    // codes each via one tight-loop expression — same integer argmins
    // and tie-breaks as the literal-fold construction (spec-pinned),
    // but the plan no longer carries the K·dim coarse table or the
    // m·ks·subDim books as literals. `m` is model-sized and static,
    // so the codes array is built by a Scala-level loop.
    df.filter(col(vecCol).isNotNull)
      .withColumn("xq", quantizeChecked(col(vecCol), model.dim))
      .withColumn("cell", nearestCell(col("xq"), model.coarse))
      .withColumn("_rq", residualCol(col("xq"), col("cell"), model.coarse))
      .withColumn("codes", array((0 until model.m).map(s =>
        nearestCell(slice(col("_rq"), s * sd + 1, sd),
          model.books(s))): _*))
      .drop("_rq")
  }

  /** The routed probe frame `(probe_id, pq, cell, lut)`: each probe
    * keeps its `nprobe` integer-nearest cells (sorted-struct slice —
    * ties to the smaller cell, the [[Similarity.ivfTopKBatch]]
    * routing shape) and builds that cell's m×ks ADC lookup table
    * ONCE — `lut(s)(j)` = integer squared L2 between subvector `s`
    * of the probe's residual against THIS cell and book entry
    * `(s, j)`. Candidate scoring is then m array lookups per row. */
  private def routedProbes(probes: DataFrame, idCol: String,
                           vecCol: String, model: Model,
                           nprobe: Int): DataFrame = {
    // reference-object routing (r20): cells by one integer-L2 sort
    // (ascending distance, cell-id tie-break — the literal path's
    // sort_array order), residual + m×ks LUT off the model arrays —
    // the plan carries none of them as literals.
    probes.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("probe_id"),
        quantizeChecked(col(vecCol), model.dim).as("pq"))
      .withColumn("_cells", routedCellsCol(col("pq"), model.coarse,
        math.min(nprobe, model.kCells)))
      .select(col("probe_id"), col("pq"),
        explode(col("_cells")).as("cell"))
      .withColumn("_prl", residualCol(col("pq"), col("cell"), model.coarse))
      .withColumn("lut", probeLutCol(col("_prl"), model.books))
      .drop("_prl")
  }

  /** ADC distance off the per-(probe, cell) LUT — integer, plain
    * associative sum. Expects `lut`/`codes` in scope. */
  private def adcFromLut: Column =
    aggregate(sequence(lit(0), size(col("codes")) - 1), lit(0L),
      (acc, s) => acc + element_at(element_at(col("lut"), s + 1),
        element_at(col("codes"), s + 1) + 1))

  /** Batch IVF-PQ search with exact refine — the full production
    * shape. Probes route to `nprobe` cells (broadcast routing +
    * per-cell LUTs), candidates come from ONE cell-keyed join
    * against the coded corpus, the ADC top-`refine` shortlist per
    * probe is a bounded heap, and ONLY the shortlisted ids fetch
    * their raw vectors (by-id join — the index itself never stores
    * full precision) for the exact integer re-rank. Returns
    * `(probe_id, rank, idCol, xdist)` with `xdist` the fixed-point
    * exact squared L2 — smallest first, id tie-break. `model` absent
    * trains inline at the given config; pass a [[loadModel]] FROZEN
    * artifact for the train-once/query-many production shape. */
  def topKBatch(corpus: DataFrame, probes: DataFrame,
                idCol: String, vecCol: String,
                kCells: Int, m: Int, ks: Int, nprobe: Int, k: Int,
                refine: Int,
                coarseIters: Int = 4, pqIters: Int = 3, seed: Int = 0,
                model: Option[Model] = None): DataFrame = {
    require(refine >= k, s"refine=$refine must be >= k=$k")
    val mdl = model.getOrElse(train(corpus, idCol, vecCol, kCells, m, ks,
      coarseIters, pqIters, seed))
    requireDim(probes, vecCol, mdl, "IvfPq.topKBatch(probes)")
    val coded = withCodes(corpus, vecCol, mdl)
      .select(col(idCol), col("cell"), col("codes"))
    val routed = routedProbes(probes, idCol, vecCol, mdl, nprobe)
    val cand = coded
      .join(broadcast(routed.select(col("probe_id"), col("cell"),
        col("lut"))), Seq("cell"))
      .filter(col(idCol) =!= col("probe_id"))
      .withColumn("_adc", adcFromLut)
    val short = graft.ops.TopK.topKPerGroup(cand, Seq("probe_id"),
        Seq(("_adc", true), (idCol, true)), refine, "_sr")
      .select(col("probe_id"), col(idCol))
    // late fetch: raw vectors only for the shortlist (probes×refine
    // rows — broadcast), then the exact integer re-rank
    val raw = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol), quantizeChecked(col(vecCol), mdl.dim).as("_cxq"))
    val pq = probes.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("probe_id"),
        quantizeChecked(col(vecCol), mdl.dim).as("pq"))
    val refined = raw.join(broadcast(short), Seq(idCol))
      .join(broadcast(pq), Seq("probe_id"))
      .withColumn("xdist", iDist(col("pq"), col("_cxq")))
    graft.ops.TopK.topKPerGroup(refined, Seq("probe_id"),
        Seq(("xdist", true), (idCol, true)), k, "rank")
      .select(col("probe_id"), col("rank"), col(idCol), col("xdist"))
  }

  /** Recall audit for the trained/residual path — per probe, how
    * many of (a) the raw ADC top-k and (b) the refined top-k survive
    * in the EXACT fixed-point top-k: `(probe_id, n_overlap_adc,
    * n_overlap)`. Integer-exact cross-engine; brute-force on
    * purpose (it measures the index); sample probes in production.
    * q147 gates it and IvfPqSpec asserts the refined mean ≥ 7/10 —
    * the round-18 number this tier exists to fix. */
  def recallBatch(corpus: DataFrame, probes: DataFrame,
                  idCol: String, vecCol: String,
                  kCells: Int, m: Int, ks: Int, nprobe: Int, k: Int,
                  refine: Int,
                  coarseIters: Int = 4, pqIters: Int = 3, seed: Int = 0,
                  model: Option[Model] = None): DataFrame = {
    require(refine >= k, s"refine=$refine must be >= k=$k")
    val mdl = model.getOrElse(train(corpus, idCol, vecCol, kCells, m, ks,
      coarseIters, pqIters, seed))
    requireDim(probes, vecCol, mdl, "IvfPq.recallBatch(probes)")
    val coded = withCodes(corpus, vecCol, mdl)
      .select(col(idCol), col("cell"), col("codes"), col("xq"))
    val routed = routedProbes(probes, idCol, vecCol, mdl, nprobe)
    val cand = coded
      .join(broadcast(routed), Seq("cell"))
      .filter(col(idCol) =!= col("probe_id"))
      .withColumn("_adc", adcFromLut)
      .withColumn("_xd", iDist(col("pq"), col("xq")))
    val ar = graft.ops.TopK.topKPerGroup(cand, Seq("probe_id"),
      Seq(("_adc", true), (idCol, true)), k, "_ar")
    val short = graft.ops.TopK.topKPerGroup(cand, Seq("probe_id"),
      Seq(("_adc", true), (idCol, true)), refine, "_sr")
    val rr = graft.ops.TopK.topKPerGroup(
      short.select(col("probe_id"), col(idCol), col("_xd")),
      Seq("probe_id"), Seq(("_xd", true), (idCol, true)), k, "_rr")
    // exact top-k: integer brute force over all (probe, corpus) pairs
    val pqf = probes.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("probe_id"),
        quantizeChecked(col(vecCol), mdl.dim).as("pq"))
    val brute = coded.select(col(idCol), col("xq"))
      .crossJoin(broadcast(pqf))
      .filter(col(idCol) =!= col("probe_id"))
      .withColumn("_xd", iDist(col("pq"), col("xq")))
    val xr = graft.ops.TopK.topKPerGroup(brute, Seq("probe_id"),
        Seq(("_xd", true), (idCol, true)), k, "_xr")
      .select(col("probe_id"), col(idCol), lit(1).as("_hit"))
    val aHits = ar.select(col("probe_id"), col(idCol))
      .join(xr, Seq("probe_id", idCol), "left")
      .groupBy(col("probe_id"))
      .agg(count(col("_hit")).as("n_overlap_adc"))
    val rHits = rr.select(col("probe_id"), col(idCol))
      .join(xr, Seq("probe_id", idCol), "left")
      .groupBy(col("probe_id"))
      .agg(count(col("_hit")).as("n_overlap"))
    aHits.join(rHits, Seq("probe_id"))
      .select(col("probe_id"), col("n_overlap_adc"), col("n_overlap"))
  }

  /** The model as gate-comparable rows `(part, sub, cid, pos, cv)` —
    * every trained parameter exploded to one long per row (q145's
    * output shape; the DuckDB oracle re-derives the full training). */
  def modelRows(spark: SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    val rows =
      (for { (c, cell) <- model.coarse.zipWithIndex.iterator
             (v, p) <- c.zipWithIndex.iterator }
        yield ("coarse", 0, cell, p, v)).toSeq ++
      (for { (b, s) <- model.books.zipWithIndex.iterator
             (c, j) <- b.zipWithIndex.iterator
             (v, p) <- c.zipWithIndex.iterator }
        yield ("book", s, j, p, v)).toSeq
    rows.toDF("part", "sub", "cid", "pos", "cv")
  }
}
