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
}
