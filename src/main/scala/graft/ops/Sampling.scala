package graft.ops

import graft.text.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines:
  * domain-weighted subsampling (data mixing a la The Pile / C4 corpus
  * mixtures) and hash-based train/val/test assignment. Everything is a
  * pure function of (seed, id) — no RNG state, so results are
  * reproducible run-to-run, engine-to-engine (the md5-derived uniform
  * is the same formula any SQL oracle can compute), and stable under
  * repartitioning — unlike `DataFrame.sample`, whose output depends on
  * partitioning and evaluation order. Narrow maps only; no shuffle.
  */
object Sampling {

  /** Deterministic uniform in [0, 1): the md5-32 of `<seed>|<id>`
    * scaled by 2^-32. Changing the seed re-draws every document
    * independently. */
  def uniform01(idCol: Column, seed: Int): Column =
    TextOps.md5_32(concat(lit(s"$seed|"), idCol.cast("string"))) /
      lit(4294967296.0)

  /** Keep each row with probability `rates(domain)` (default rate for
    * unlisted domains), decided by the per-row deterministic uniform —
    * the domain-mixing primitive: downsample over-represented sources,
    * keep the rest. Rates ride a BROADCAST join against a tiny
    * (domain, rate) frame, so the plan stays one narrow pass over the
    * corpus regardless of how many domains are configured. */
  def sampleByDomain(df: DataFrame, idCol: String, domainCol: String,
                     rates: Map[String, Double], seed: Int = 0,
                     defaultRate: Double = 1.0): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0),
      s"sampling rates must be in [0,1]: $rates")
    require(defaultRate >= 0.0 && defaultRate <= 1.0,
      s"default rate must be in [0,1]: $defaultRate")
    val spark = df.sparkSession
    import spark.implicits._
    val ratesDf = rates.toSeq.toDF(domainCol, "_rate")
    df.join(broadcast(ratesDf), Seq(domainCol), "left")
      .filter(uniform01(col(idCol), seed) <
        coalesce(col("_rate"), lit(defaultRate)))
      .select(df.columns.map(col): _*) // caller's column order, join key un-fronted
  }

  /** Epoch-replicated mixture construction — the "repeat source s
    * x.y times" training recipe (the published LLaMA/Pile mixture
    * shape): given per-source weights and a total token budget, each
    * source contributes `floor(budget·wᵢ)` tokens as
    * `full = wanted DIV tokensᵢ` complete epochs of every document
    * plus a PARTIAL epoch holding each document with probability
    * `(wanted mod tokensᵢ) / tokensᵢ` — decided by the same
    * deterministic [[uniform01]] draw as [[sampleByDomain]], so the
    * emitted `(id, epoch)` multiset is reproducible, engine-checkable
    * and repartition-invariant. Sources absent from `weights` are
    * excluded (weight 0). Partial-epoch token counts are exact in
    * expectation (per-doc Bernoulli), matching the sampling
    * primitive's contract.
    *
    * Shape at 100 TB: per-source totals are one map-side-combined
    * aggregate; the tiny (source, epochs, frac) plan broadcasts back;
    * the epoch explode is narrow (each row emits its own repeat
    * count). No corpus-sized shuffle at all. */
  def mixtureEpochs(df: DataFrame, idCol: String, srcCol: String,
                    tokCol: String, weights: Map[String, Double],
                    budgetTokens: Long, seed: Int = 0): DataFrame = {
    require(weights.values.forall(_ >= 0.0),
      s"mixture weights must be non-negative: $weights")
    require(budgetTokens >= 0, s"budget must be non-negative: $budgetTokens")
    val spark = df.sparkSession
    import spark.implicits._
    val wDf = weights.toSeq.toDF(srcCol, "_w")
    val plan = df.groupBy(col(srcCol))
      .agg(sum(col(tokCol)).cast("long").as("_toks"))
      .join(broadcast(wDf), Seq(srcCol))
      .filter(col("_toks") > 0)
      .withColumn("_wanted",
        floor(lit(budgetTokens.toDouble) * col("_w")).cast("long"))
      .withColumn("_full", expr("_wanted DIV _toks"))
      .withColumn("_frac", (col("_wanted") % col("_toks")).cast("double")
        / col("_toks").cast("double"))
      .select(col(srcCol), col("_full"), col("_frac"))
    df.join(broadcast(plan), Seq(srcCol))
      .withColumn("epoch", explode(sequence(lit(0L), col("_full"))))
      .filter(col("epoch") < col("_full") ||
        uniform01(col(idCol), seed) < col("_frac"))
      .select(col(idCol), col(srcCol), col("epoch"))
  }

  /** Stratified EXACT-n sample: precisely `n` rows per group (fewer
    * if the group is smaller), chosen as the n smallest seeded
    * uniforms with id tie-break — deterministic, repartition-
    * invariant, and engine-checkable (the md5 uniform is an exact
    * dyadic rational, no transcendentals anywhere). The eval-set
    * construction primitive `DataFrame.sample` cannot express
    * (per-group counts are only approximate there). Ranked by the
    * bounded-heap [[graft.plans.TopKPerGroup]] — no per-group sort.
    * Adds `rank` (1..n within the group). */
  def stratifiedSample(df: DataFrame, idCol: String, groupCol: String,
                       n: Int, seed: Int = 0): DataFrame =
    graft.ops.TopK.topKPerGroup(
        df.withColumn("_u", uniform01(col(idCol), seed)),
        Seq(groupCol), Seq(("_u", true), (idCol, true)), n, "rank")
      .drop("_u")

  /** Weighted sample without replacement, n per group — the
    * Efraimidis–Spirakis A-ES scheme made deterministic: each row's
    * key is `ln(u)/w` (u = seeded uniform shifted off zero, w > 0
    * weight; taking the LARGEST keys ≡ largest `u^(1/w)`), so
    * heavier rows win more often but every row can appear. The key
    * is rounded to 9dp BEFORE ranking with id tie-break, making the
    * cross-engine order robust to last-ulp `ln` differences (the
    * q99 rounding-before-ranking discipline). */
  def weightedSample(df: DataFrame, idCol: String, groupCol: String,
                     weightCol: String, n: Int,
                     seed: Int = 0): DataFrame = {
    // +0.5 shifts the 2^-32 grid off u=0 (ln(0) = -Inf) while staying
    // an exact dyadic rational both engines compute identically
    val u = (TextOps.md5_32(concat(lit(s"$seed|"),
      col(idCol).cast("string"))) + 0.5) / lit(4294967296.0)
    val key = round(log(u) / col(weightCol).cast("double"), 9)
    graft.ops.TopK.topKPerGroup(
        df.filter(col(weightCol) > 0).withColumn("_k", key),
        Seq(groupCol), Seq(("_k", false), (idCol, true)), n, "rank")
      .drop("_k")
  }

  /** Keep rows whose `valueCol` lies inside the corpus's
    * [pLo, pHi] exact-percentile band — the length-outlier trim every
    * curation pipeline runs (drop the truncated stubs and the
    * mega-documents). Thresholds come from ONE exact-percentile
    * aggregate (R-7 linear interpolation in both engines) broadcast
    * back; since the filtered column is integral, a threshold only
    * binds when it lands exactly ON an integer — where both engines
    * hold it float-error-free — so the kept set is engine-exact. */
  def quantileTrim(df: DataFrame, valueCol: String,
                   pLo: Double, pHi: Double): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi,
      s"need 0 <= pLo < pHi <= 1, got $pLo, $pHi")
    val qs = df.agg(
      expr(s"percentile($valueCol, $pLo)").as("_lo"),
      expr(s"percentile($valueCol, $pHi)").as("_hi"))
    df.crossJoin(broadcast(qs))
      .filter(col(valueCol) >= col("_lo") && col(valueCol) <= col("_hi"))
      .select(df.columns.map(col): _*)
  }

  /** Assign every row a split label ("train"/"val"/"test"/...) by
    * cumulative ranges of the deterministic uniform: fractions
    * `[(train, 0.9), (val, 0.05), (test, 0.05)]` map u < 0.9 to train,
    * u < 0.95 to val, the rest to test — the LAST label absorbs the
    * remainder, so the assignment is total even when the fractions
    * don't sum to exactly 1 in floating point. Order matters and is
    * part of the contract (same list ⇒ same split, forever). */
  def withSplit(df: DataFrame, idCol: String, out: String,
                fractions: Seq[(String, Double)],
                seed: Int = 0): DataFrame = {
    require(fractions.nonEmpty, "at least one split label required")
    require(fractions.forall(_._2 >= 0.0),
      s"split fractions must be non-negative: $fractions")
    // the label CASE references the uniform k-1 times; staged as a
    // named column it reads as one draw, and evaluation stays
    // single-hash even off the codegen path (codegen CSE would
    // de-duplicate an inlined copy, but interpreted eval would not)
    val u = col("_split_u")
    val cuts = fractions.init.scanLeft(0.0)(_ + _._2).tail
    val expr = fractions.init.zip(cuts)
      .foldRight(lit(fractions.last._1): Column) {
        case (((label, _), cut), rest) => when(u < cut, label).otherwise(rest)
      }
    df.withColumn("_split_u", uniform01(col(idCol), seed))
      .withColumn(out, expr)
      .drop("_split_u")
  }

  /** Per-group row quota — C4's "at most N pages per domain" rule and
    * every other keep-the-best-K-per-key curation step: rows ranked by
    * `orderCols` (supply tie-breakers; the order must be total for a
    * deterministic cut) keep the top `k` within each `groupCols`
    * bucket, with the rank exposed as `rn`. Rides the custom
    * bounded-heap [[graft.plans.TopKPerGroup]] operator: per-key
    * O(k) heaps instead of the window form's full per-partition
    * sort — at 100 TB the difference between "sort every domain's
    * millions of pages" and "keep 20 in a heap". */
  def capPerGroup(df: DataFrame, groupCols: Seq[String],
                  orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(k >= 1, s"quota must be >= 1, got $k")
    TopK.topKPerGroup(df, groupCols, orderCols, k)
  }

  /** Deterministic global shuffle into training shards — the
    * before-training "shuffle the corpus" step, as a pure function of
    * (seed, id) like everything else here: `shard` =
    * md5-hash-mod-`nShards`, `pos` = the row's rank within its shard
    * under an independent md5 order key (full 32-hex-digit string —
    * ties only on identical ids). Same seed ⇒ same shards and same
    * intra-shard order, forever, on any engine and any partitioning;
    * changing the seed re-shuffles everything.
    *
    * Scale shape: one hash-partition exchange on `shard` + a
    * per-shard sort — shards are the parallel unit (pick thousands at
    * 100 TB so each sorts a sliver); downstream, feed `shard` to
    * [[graft.io.Publish]]'s partitioned layout and the written files
    * ARE the shuffled epoch. */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int,
                    seed: Int = 0): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    // distinct derivations for shard vs order: the 32-bit shard hash
    // reads the md5 PREFIX, so reusing one digest would sort each
    // shard by the very prefix that chose it
    val shard = pmod(TextOps.md5_32(
      concat(lit(s"$seed|s|"), col(idCol).cast("string"))), lit(nShards))
    val okey = md5(concat(lit(s"$seed|o|"), col(idCol).cast("string")))
    import org.apache.spark.sql.expressions.Window
    df.withColumn("shard", shard)
      .withColumn("_okey", okey)
      .withColumn("pos", row_number().over(
          Window.partitionBy(col("shard"))
            .orderBy(col("_okey"), col(idCol)))
        .cast("long"))
      .drop("_okey")
  }

  /** Greedy token-budget selection — the corpus-ASSEMBLY step of a
    * training-data pipeline ("fill a 15T-token budget with the
    * best-scoring documents"): rows are ranked by `(scoreCol DESC,
    * idCol ASC)` and the maximal PREFIX whose `tokensCol` sum stays
    * within `budget` is kept (strict prefix, not a knapsack — once
    * the running total would exceed the budget, everything after the
    * cutoff is out, zero-token rows included).
    *
    * The naive plan — global sort + running-sum window — single-
    * threads the whole corpus through one partition. This instead
    * finds the cutoff `(score θ, id)` by DRIVER-SIDE RANGE NARROWING
    * (the [[graft.dedup.Dedup.dropHotBuckets]] eager-decision
    * discipline): each level aggregates per-bucket token sums over
    * the current score interval (`buckets` value-range buckets — a
    * map-side-combined agg whose output is driver-scale), walks the
    * buckets in score order accepting whole buckets while they fit,
    * and recurses into the single boundary bucket; a bucket pinned to
    * ONE score value (a tie mass) narrows the same way over the id
    * axis, which always terminates because ids are unique. Once the
    * boundary region is under `maxLocal` rows the exact prefix is
    * resolved with one BOUNDED single-partition window. The returned
    * frame is `df.filter(score > θ OR (score = θ AND id <= idCut))` —
    * at 100 TB the selection itself is ONE scan-stage filter with no
    * sort, no window, and no exchange of the data; the decision costs
    * ~`log_buckets(rows / maxLocal)` extra aggregation passes (2-3 at
    * any realistic scale) over the three projected columns at plan
    * BUILD time, each logged.
    *
    * Determinism: the cutoff is a pure function of the data (value-
    * range buckets, no sampling), and the prefix order is total, so
    * the result is reproducible run-to-run and matches the windowed
    * SQL oracle row-for-row. Preconditions, validated in the first
    * aggregation pass and failed loudly: `idCol` integral and unique,
    * `scoreCol` non-null and non-NaN (engines disagree on NaN/NULL
    * ordering), `tokensCol` non-null and non-negative (the prefix sum
    * must be monotone). Integer token sums keep the boundary exact —
    * no float-accumulation drift between this and any oracle. */
  def tokenBudgetSelect(df: DataFrame, idCol: String, scoreCol: String,
                        tokensCol: String, budget: Long,
                        buckets: Int = 4096, maxLocal: Long = 1000000L,
                        log: String => Unit =
                          m => System.err.println(m)): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(maxLocal >= 1, s"maxLocal must be >= 1, got $maxLocal")
    require(Set("long", "int", "integer", "short", "byte")
        .contains(df.schema(idCol).dataType.typeName),
      s"$idCol must be an integral column for the tie-mass narrowing, " +
        s"got ${df.schema(idCol).dataType.typeName}")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol).cast("long").as("_id"),
      col(scoreCol).cast("double").as("_s"),
      col(tokensCol).cast("long").as("_n"))
    val g = base.agg(coalesce(sum(col("_n")), lit(0L)),
      count(lit(1)), min(col("_s")), max(col("_s")),
      coalesce(min(col("_n")), lit(0L)),
      count(when(col("_s").isNull || isnan(col("_s")) ||
        col("_n").isNull, 1)),
      count_distinct(col("_id"))).head()
    require(g.getLong(1) == g.getLong(6),
      s"tokenBudgetSelect: $idCol must be unique " +
        s"(${g.getLong(1)} rows, ${g.getLong(6)} distinct ids) — " +
        "duplicates make the id tie-break, the RANGE-framed boundary " +
        "window and the final `id <= cutoff` filter all ill-defined")
    require(g.getLong(5) == 0L,
      s"tokenBudgetSelect: $scoreCol must be non-null/non-NaN and " +
        s"$tokensCol non-null (${g.getLong(5)} offending rows) — " +
        "engines disagree on NULL/NaN ordering, so the prefix would " +
        "not be well-defined")
    require(g.getLong(4) >= 0L,
      s"tokenBudgetSelect: $tokensCol must be non-negative " +
        s"(min ${g.getLong(4)}) — the prefix sum must be monotone")
    val total = g.getLong(0)
    val nAll = g.getLong(1)
    if (budget <= 0L || nAll == 0L) return df.filter(lit(false))
    if (total <= budget) {
      log(s"[token-budget] budget $budget >= total $total tokens — " +
        "everything selected")
      return df
    }
    var remaining = budget
    var lo = g.getDouble(2)
    var hi = g.getDouble(3)
    var nRegion = nAll
    // the cutoff: last kept row's (score, Some(id)); idCut None means
    // "no row AT score θ is kept" (accept is then score > θ only)
    var cut: Option[(Double, Option[Long])] = None
    var level = 0
    while (cut.isEmpty && java.lang.Double.compare(lo, hi) != 0 &&
        nRegion > maxLocal) {
      level += 1
      require(level <= 64, "tokenBudgetSelect: score narrowing did not " +
        "converge in 64 levels (adversarial score distribution?) — " +
        "raise maxLocal")
      val width = hi - lo
      val hist = base.filter(col("_s") >= lo && col("_s") <= hi)
        .groupBy(least(lit(buckets - 1),
          floor((col("_s") - lit(lo)) / lit(width) * buckets))
          .cast("int").as("_b"))
        .agg(sum(col("_n")).as("tn"), count(lit(1)).as("c"),
          min(col("_s")).as("mn"), max(col("_s")).as("mx"))
        .collect().sortBy(r => -r.getInt(0))
      var found = false
      for (r <- hist if !found) {
        val tn = r.getLong(1)
        if (tn <= remaining) remaining -= tn
        else {
          found = true
          lo = r.getDouble(3); hi = r.getDouble(4); nRegion = r.getLong(2)
        }
      }
      assert(found, "tokenBudgetSelect: internal — remaining budget " +
        "must land inside the region")
      log(s"[token-budget] level $level: boundary scores [$lo, $hi], " +
        s"$nRegion rows, $remaining tokens remaining")
    }
    if (cut.isEmpty && nRegion > maxLocal) {
      // tie mass: every region row shares one score — narrow over ids
      // (ascending: the prefix order within a tie). Always terminates:
      // ids are unique, so each level shrinks the id range ~buckets-fold
      val v = lo
      val tie = base.filter(col("_s") === v)
      val bounds = tie.agg(min(col("_id")), max(col("_id"))).head()
      var idLo = bounds.getLong(0)
      var idHi = bounds.getLong(1)
      var n2 = nRegion
      while (cut.isEmpty && n2 > maxLocal) {
        level += 1
        require(level <= 128, "tokenBudgetSelect: internal — id " +
          "narrowing must converge")
        val blockSize =
          (((BigInt(idHi) - BigInt(idLo)) / buckets) + 1).toLong
        // ids in the filtered range are >= idLo, so DIV == floor
        val hist = tie.filter(col("_id").between(idLo, idHi))
          .groupBy(expr(s"(_id - ${idLo}L) DIV ${blockSize}L").as("_b"))
          .agg(sum(col("_n")).as("tn"), count(lit(1)).as("c"),
            min(col("_id")).as("mn"), max(col("_id")).as("mx"))
          .collect().sortBy(_.getLong(0))
        var found = false
        for (r <- hist if !found) {
          val tn = r.getLong(1)
          if (tn <= remaining) remaining -= tn
          else {
            found = true
            idLo = r.getLong(3); idHi = r.getLong(4); n2 = r.getLong(2)
          }
        }
        assert(found, "tokenBudgetSelect: internal — remaining budget " +
          "must land inside the tie mass")
        log(s"[token-budget] level $level: tie at score $v, id " +
          s"block [$idLo, $idHi], $n2 rows, $remaining tokens remaining")
      }
      if (cut.isEmpty) {
        val w = Window.orderBy(col("_id"))
        val tail = tie.filter(col("_id").between(idLo, idHi))
          .withColumn("_ct", sum(col("_n")).over(w))
          .filter(col("_ct") <= remaining)
          .orderBy(col("_id").desc).limit(1).collect()
        cut = Some((v, tail.headOption.map(_.getLong(0))
          .orElse(if (idLo == Long.MinValue) None else Some(idLo - 1))))
      }
    }
    if (cut.isEmpty) {
      // exact prefix over the bounded boundary region
      val w = Window.orderBy(col("_s").desc, col("_id"))
      val tail = base.filter(col("_s") >= lo && col("_s") <= hi)
        .withColumn("_ct", sum(col("_n")).over(w))
        .filter(col("_ct") <= remaining)
        .orderBy(col("_s").asc, col("_id").desc).limit(1).collect()
      cut = Some(tail.headOption match {
        case Some(r) => (r.getDouble(1), Some(r.getLong(0)))
        case None => (hi, None) // nothing kept inside the region
      })
    }
    val (theta, idCut) = cut.get
    log(s"[token-budget] cutoff: score $theta, id ${idCut.orNull} " +
      s"(budget $budget of $total total tokens)")
    val sc = col(scoreCol).cast("double")
    idCut match {
      case Some(ic) => df.filter(sc > theta ||
        (sc === theta && col(idCol).cast("long") <= ic))
      case None => df.filter(sc > theta)
    }
  }

  /** Per-group [[tokenBudgetSelect]] — the mixture-assembly form
    * ("10T of web, 3T of code, 1T of wiki"): within each group the
    * maximal `(scoreCol DESC, idCol ASC)` prefix whose `tokensCol`
    * sum fits that group's budget is kept; groups absent from
    * `budgets` use `defaultBudget` (default unlimited; a budget <= 0
    * keeps nothing of that group). This differs from [[capPerGroup]]
    * (top-K by COUNT) in that the cap is a token MASS — which is what
    * a training mixture actually specifies.
    *
    * Scale shape — the [[tokenBudgetSelect]] narrowing run for ALL
    * groups at once: each level is ONE `(group, bucket)` map-side-
    * combined aggregation over the still-unresolved groups' regions
    * (region predicates ride a broadcast table; the collected
    * histogram is <= #activeGroups x `buckets` rows, which is why the
    * group form defaults to coarser buckets — more levels, each
    * driver-cheap), score-tie masses narrow the same way over the
    * unique-id axis, and every terminal region resolves in ONE
    * `partitionBy(group)` window whose partitions are each <=
    * `maxLocal` rows by construction. The final selection joins the
    * per-group cutoff table back by BROADCAST and filters — the data
    * itself is never sorted, windowed, or exchanged. Same
    * preconditions as [[tokenBudgetSelect]] (plus: no NULL group
    * keys), validated in the first pass. */
  def tokenBudgetByGroup(df: DataFrame, idCol: String, groupCol: String,
                         scoreCol: String, tokensCol: String,
                         budgets: Map[String, Long],
                         defaultBudget: Long = Long.MaxValue,
                         buckets: Int = 256, maxLocal: Long = 1000000L,
                         log: String => Unit =
                           m => System.err.println(m)): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(maxLocal >= 1, s"maxLocal must be >= 1, got $maxLocal")
    require(Set("long", "int", "integer", "short", "byte")
        .contains(df.schema(idCol).dataType.typeName),
      s"$idCol must be an integral column, got " +
        df.schema(idCol).dataType.typeName)
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(groupCol).cast("string").as("_g"),
      col(idCol).cast("long").as("_id"),
      col(scoreCol).cast("double").as("_s"),
      col(tokensCol).cast("long").as("_n"))
    // pass 1: per-group totals + the shared precondition sweep
    val g0 = base.groupBy(col("_g")).agg(
      coalesce(sum(col("_n")), lit(0L)).as("t"), count(lit(1)).as("c"),
      min(col("_s")).as("mn"), max(col("_s")).as("mx"),
      coalesce(min(col("_n")), lit(0L)).as("nn"),
      count(when(col("_s").isNull || isnan(col("_s")) ||
        col("_n").isNull, 1)).as("bad"),
      count_distinct(col("_id")).as("d")).collect()
    require(g0.forall(!_.isNullAt(0)),
      s"tokenBudgetByGroup: $groupCol must be non-null")
    g0.find(r => r.getAs[Long]("c") != r.getAs[Long]("d")).foreach { r =>
      throw new IllegalArgumentException(
        s"tokenBudgetByGroup: $idCol must be unique within each group " +
          s"(group ${r.getAs[String]("_g")}: ${r.getAs[Long]("c")} rows, " +
          s"${r.getAs[Long]("d")} distinct ids)")
    }
    val nBad = g0.map(_.getAs[Long]("bad")).sum
    require(nBad == 0L,
      s"tokenBudgetByGroup: $scoreCol must be non-null/non-NaN and " +
        s"$tokensCol non-null ($nBad offending rows)")
    require(g0.forall(_.getAs[Long]("nn") >= 0L),
      s"tokenBudgetByGroup: $tokensCol must be non-negative")
    // per-group narrowing state; idLo/idHi only bind once `tie`
    final class St(var lo: Double, var hi: Double, var n: Long,
                   var remaining: Long,
                   var tie: Boolean = false,
                   var idLo: Long = Long.MinValue,
                   var idHi: Long = Long.MaxValue)
    // resolved: group -> (mode 2=all 0=none 1=cut, theta, idCut)
    val done = scala.collection.mutable.Map
      .empty[String, (Int, Double, Option[Long])]
    val open = scala.collection.mutable.Map.empty[String, St]
    g0.foreach { r =>
      val g = r.getAs[String]("_g")
      val b = budgets.getOrElse(g, defaultBudget)
      if (b <= 0L) done(g) = (0, 0.0, None)
      else if (r.getAs[Long]("t") <= b) done(g) = (2, 0.0, None)
      else {
        val st = new St(r.getAs[Double]("mn"),
          r.getAs[Double]("mx"), r.getAs[Long]("c"), b)
        // a group born on one score value is already a tie mass
        if (java.lang.Double.compare(st.lo, st.hi) == 0) st.tie = true
        open(g) = st
      }
    }
    log(s"[token-budget/group] ${g0.length} groups: " +
      s"${done.count(_._2._1 == 2)} fit whole, " +
      s"${done.count(_._2._1 == 0)} zero-budget, ${open.size} narrowing")
    var level = 0
    // score-axis levels over the groups still wide and untied
    def wide() = open.filter { case (_, s) => !s.tie && s.n > maxLocal }
    while (wide().nonEmpty) {
      level += 1
      require(level <= 64, "tokenBudgetByGroup: score narrowing did " +
        "not converge in 64 levels — raise maxLocal")
      val act = wide()
      val regions = act.toSeq.map { case (g, s) =>
        (g, s.lo, s.hi, s.hi - s.lo) }.toDF("_g", "_lo", "_hi", "_w")
      val hist = base.join(broadcast(regions), Seq("_g"))
        .filter(col("_s") >= col("_lo") && col("_s") <= col("_hi"))
        .groupBy(col("_g"), least(lit(buckets - 1),
          floor((col("_s") - col("_lo")) / col("_w") * buckets))
          .cast("int").as("_b"))
        .agg(sum(col("_n")).as("tn"), count(lit(1)).as("c"),
          min(col("_s")).as("bmn"), max(col("_s")).as("bmx"))
        .collect().groupBy(_.getAs[String]("_g"))
      act.foreach { case (g, s) =>
        val rows = hist(g).sortBy(r => -r.getAs[Int]("_b"))
        var found = false
        for (r <- rows if !found) {
          val tn = r.getAs[Long]("tn")
          if (tn <= s.remaining) s.remaining -= tn
          else {
            found = true
            s.lo = r.getAs[Double]("bmn"); s.hi = r.getAs[Double]("bmx")
            s.n = r.getAs[Long]("c")
            if (java.lang.Double.compare(s.lo, s.hi) == 0) s.tie = true
          }
        }
        assert(found, s"tokenBudgetByGroup: internal — group $g's " +
          "remaining budget must land inside its region")
      }
      log(s"[token-budget/group] level $level: ${act.size} groups narrowed")
    }
    // id-axis narrowing for oversized score-tie masses (ids unique ->
    // the range shrinks ~buckets-fold per level, always terminates)
    def ties() = open.filter { case (_, s) =>
      s.tie && s.n > maxLocal && s.idLo == Long.MinValue }
    if (ties().nonEmpty) {
      val vals = ties().toSeq.map { case (g, s) => (g, s.lo) }
        .toDF("_g", "_v")
      base.join(broadcast(vals), Seq("_g"))
        .filter(col("_s") === col("_v"))
        .groupBy(col("_g"))
        .agg(min(col("_id")).as("mn"), max(col("_id")).as("mx"))
        .collect().foreach { r =>
          val s = open(r.getAs[String]("_g"))
          s.idLo = r.getAs[Long]("mn"); s.idHi = r.getAs[Long]("mx")
        }
    }
    def tieWide() = open.filter { case (_, s) => s.tie && s.n > maxLocal }
    while (tieWide().nonEmpty) {
      level += 1
      require(level <= 128, "tokenBudgetByGroup: internal — id " +
        "narrowing must converge")
      val act = tieWide()
      val blocks = act.toSeq.map { case (g, s) =>
        (g, s.lo, s.idLo, s.idHi,
          (((BigInt(s.idHi) - BigInt(s.idLo)) / buckets) + 1).toLong)
      }.toDF("_g", "_v", "_il", "_ih", "_bs")
      val hist = base.join(broadcast(blocks), Seq("_g"))
        .filter(col("_s") === col("_v") &&
          col("_id") >= col("_il") && col("_id") <= col("_ih"))
        .groupBy(col("_g"),
          expr("(_id - _il) DIV _bs").as("_b"))
        .agg(sum(col("_n")).as("tn"), count(lit(1)).as("c"),
          min(col("_id")).as("bmn"), max(col("_id")).as("bmx"))
        .collect().groupBy(_.getAs[String]("_g"))
      act.foreach { case (g, s) =>
        val rows = hist(g).sortBy(_.getAs[Long]("_b"))
        var found = false
        for (r <- rows if !found) {
          val tn = r.getAs[Long]("tn")
          if (tn <= s.remaining) s.remaining -= tn
          else {
            found = true
            s.idLo = r.getAs[Long]("bmn"); s.idHi = r.getAs[Long]("bmx")
            s.n = r.getAs[Long]("c")
          }
        }
        assert(found, s"tokenBudgetByGroup: internal — group $g's " +
          "tie mass must contain the cutoff")
      }
      log(s"[token-budget/group] level $level: ${act.size} tie groups " +
        "narrowed")
    }
    // terminal: ONE partitionBy(group) window over every boundary
    // region (each group's slice <= maxLocal rows); the last kept row
    // per group is the cutoff
    if (open.nonEmpty) {
      val regions = open.toSeq.map { case (g, s) =>
        (g, s.lo, s.hi, s.idLo, s.idHi, s.remaining)
      }.toDF("_g", "_lo", "_hi", "_il", "_ih", "_rem")
      val wSum = Window.partitionBy(col("_g"))
        .orderBy(col("_s").desc, col("_id"))
      val wLast = Window.partitionBy(col("_g"))
        .orderBy(col("_s").asc, col("_id").desc)
      val cutRows = base.join(broadcast(regions), Seq("_g"))
        .filter(col("_s") >= col("_lo") && col("_s") <= col("_hi") &&
          col("_id") >= col("_il") && col("_id") <= col("_ih"))
        .withColumn("_ct", sum(col("_n")).over(wSum))
        .filter(col("_ct") <= col("_rem"))
        .withColumn("_rk", row_number().over(wLast))
        .filter(col("_rk") === 1)
        .select(col("_g"), col("_s"), col("_id"))
        .collect()
      cutRows.foreach { r =>
        done(r.getString(0)) = (1, r.getDouble(1), Some(r.getLong(2)))
      }
      // groups whose boundary region kept nothing: everything above
      // the region (score, or id for a tie) is the whole kept set
      open.keys.filterNot(done.contains).foreach { g =>
        val s = open(g)
        done(g) =
          if (s.tie)
            (1, s.lo,
              if (s.idLo == Long.MinValue) None else Some(s.idLo - 1))
          else (1, s.hi, None)
      }
    }
    val dec = done.toSeq.map { case (g, (m, th, ic)) =>
      (g, m, th, ic.map(java.lang.Long.valueOf).orNull)
    }.toDF("_dg", "_mode", "_theta", "_idcut")
    // resolve through DataFrame references (not bare names) so a caller
    // frame that already contains _dg/_mode/_theta/_idcut never hits an
    // ambiguous-reference analysis error
    val sc = df(scoreCol).cast("double")
    val idc = df(idCol).cast("long")
    df.join(broadcast(dec),
        df(groupCol).cast("string") === dec("_dg"))
      .filter(dec("_mode") === 2 ||
        (dec("_mode") === 1 && (sc > dec("_theta") ||
          (sc === dec("_theta") && dec("_idcut").isNotNull &&
            idc <= dec("_idcut")))))
      .select(df.columns.map(df(_)): _*)
  }
}

