package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sampling.sampleByDomain / withSplit — determinism, rate behavior,
  * seed independence, split totality. The q80/q81 gates pin the exact
  * kept sets / labels against the DuckDB md5 oracle at sf0.01/sf0.1.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0L until 400L).map { i =>
    (i, if (i % 4 == 0) "a" else if (i % 4 == 1) "b" else "c")
  }.toDF("id", "dom")

  test("rate 0 drops a domain entirely; rate 1 keeps it entirely") {
    val out = Sampling.sampleByDomain(docs, "id", "dom",
      Map("a" -> 0.0, "b" -> 1.0), defaultRate = 1.0)
    val byDom = out.groupBy("dom").count().as[(String, Long)]
      .collect().toMap
    assert(!byDom.contains("a"))
    assert(byDom("b") == 100L)
    assert(byDom("c") == 200L) // default rate 1.0
  }

  test("sampling is deterministic and repartition-invariant") {
    val a = Sampling.sampleByDomain(docs, "id", "dom",
      Map("a" -> 0.3, "b" -> 0.6), seed = 3)
      .select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.sampleByDomain(docs.repartition(13), "id", "dom",
      Map("a" -> 0.3, "b" -> 0.6), seed = 3)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b)
    assert(a.nonEmpty && a.size < 400)
  }

  test("different seeds draw different subsets at the same rates") {
    def kept(seed: Int): Seq[Long] =
      Sampling.sampleByDomain(docs, "id", "dom", Map.empty,
        seed = seed, defaultRate = 0.5)
        .select("id").as[Long].collect().sorted.toSeq
    assert(kept(1) != kept(2))
  }

  test("sample rate lands near the target on a uniform hash") {
    val n = Sampling.sampleByDomain(docs, "id", "dom", Map.empty,
      defaultRate = 0.5).count()
    assert(n > 140 && n < 260) // 400 draws at p=.5, generous bounds
  }

  test("withSplit is total, deterministic, and respects fractions") {
    val out = Sampling.withSplit(docs, "id", "split",
      Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125), seed = 5)
    val counts = out.groupBy("split").count().as[(String, Long)]
      .collect().toMap
    assert(counts.values.sum == 400L)
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > 250L) // ~300 expected
    // stable across recomputation
    val again = Sampling.withSplit(docs, "id", "split",
      Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125), seed = 5)
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
  }

  test("single-label split assigns everything to that label") {
    val out = Sampling.withSplit(docs, "id", "s", Seq("all" -> 1.0))
    assert(out.filter(col("s") =!= "all").isEmpty)
  }

  test("invalid rates are rejected loudly") {
    intercept[IllegalArgumentException] {
      Sampling.sampleByDomain(docs, "id", "dom", Map("a" -> 1.5))
    }
    intercept[IllegalArgumentException] {
      Sampling.withSplit(docs, "id", "s", Seq.empty)
    }
  }

  test("stratifiedSample: exactly n per group, small groups whole") {
    val df = (1L to 20L).map(i => (i, if (i <= 17) "big" else "small"))
      .toDF("id", "g")
    val out = Sampling.stratifiedSample(df, "id", "g", n = 5, seed = 1)
      .select("g", "id", "rank").as[(String, Long, Long)]
      .collect().toSeq
    assert(out.count(_._1 == "big") == 5)
    assert(out.count(_._1 == "small") == 3)
    assert(out.filter(_._1 == "big").map(_._3).sorted == Seq(1L, 2, 3, 4, 5))
    // deterministic: same seed, same set
    val again = Sampling.stratifiedSample(df, "id", "g", n = 5, seed = 1)
      .select("id").as[Long].collect().toSet
    assert(again == out.map(_._2).toSet)
  }

  test("weightedSample: heavy rows dominate; weight<=0 excluded") {
    // one row with overwhelming weight must essentially always rank 1
    val df = Seq((1L, "g", 1000000L), (2L, "g", 1L), (3L, "g", 1L),
      (4L, "g", 0L)).toDF("id", "g", "w")
    val out = Sampling.weightedSample(df, "id", "g", "w", n = 3, seed = 9)
      .select("id", "rank").as[(Long, Long)].collect().toMap
    assert(out(1L) == 1L)           // ln(u)/1e6 ≈ 0 beats ln(u)/1
    assert(!out.contains(4L))       // zero weight can never be drawn
    assert(out.keySet == Set(1L, 2L, 3L))
  }

  test("quantileTrim keeps the inclusive percentile band") {
    val df = (1L to 100L).map(i => (i, i)).toDF("id", "v")
    val out = Sampling.quantileTrim(df, "v", 0.10, 0.90)
      .select("v").as[Long].collect().sorted.toSeq
    // p10 of 1..100 = 10.9, p90 = 90.1 → kept 11..90
    assert(out == (11L to 90L))
    intercept[IllegalArgumentException] {
      Sampling.quantileTrim(df, "v", 0.9, 0.1)
    }
  }

  test("shuffleShards: total, deterministic, balanced-ish, seed-sensitive") {
    val df = spark.range(1000).select(col("id"))
    val out = Sampling.shuffleShards(df, "id", 8, seed = 1)
      .as[(Long, Long, Long)].collect().toSeq
    // total: every row exactly once
    assert(out.size == 1000 && out.map(_._1).distinct.size == 1000)
    // pos is 1..n within each shard, no gaps
    out.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted == (1L to rows.size), s"shard $shard")
    }
    // md5 balance: no shard degenerate at n=1000, k=8
    val sizes = out.groupBy(_._2).view.mapValues(_.size)
    assert(sizes.values.min > 60 && sizes.values.max < 190, sizes.toMap)
    // deterministic; a different seed reshuffles
    val again = Sampling.shuffleShards(df, "id", 8, seed = 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.toSet == again.toSet)
    val other = Sampling.shuffleShards(df, "id", 8, seed = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.toSet != other.toSet)
    // intra-shard order is NOT id order (it actually shuffles)
    val firstShard = out.filter(_._2 == out.head._2).sortBy(_._3).map(_._1)
    assert(firstShard != firstShard.sorted)
  }

  // ------------------------------------------------ tokenBudgetSelect

  /** Brute-force prefix oracle: (score desc, id asc) order, running
    * token sum, keep while <= budget. */
  private def prefixOracle(rows: Seq[(Long, Double, Long)],
                           budget: Long): Set[Long] = {
    var acc = 0L
    rows.sortBy { case (id, s, _) => (-s, id) }
      .takeWhile { case (_, _, n) => { acc += n; acc <= budget } }
      .map(_._1).toSet
  }

  private def selected(df: org.apache.spark.sql.DataFrame, budget: Long,
                       buckets: Int = 8, maxLocal: Long = 4L): Set[Long] =
    Sampling.tokenBudgetSelect(df, "id", "score", "n", budget,
        buckets = buckets, maxLocal = maxLocal, log = _ => ())
      .select("id").as[Long].collect().toSet

  test("tokenBudgetSelect matches the windowed prefix oracle at every " +
      "budget (tiny maxLocal forces the multi-level narrowing)") {
    // distinct scores, varied token counts, ids deliberately unordered
    // relative to score
    val rows = (0L until 300L).map { i =>
      (i, ((i * 37) % 101).toDouble / 101.0, (i % 13) + 1L)
    }
    val df = rows.toDF("id", "score", "n")
    val total = rows.map(_._3).sum
    for (budget <- Seq(0L, 1L, 7L, total / 10, total / 3, total - 1, total,
        total + 5)) {
      assert(selected(df, budget) == prefixOracle(rows, budget),
        s"divergence at budget $budget")
    }
  }

  test("tokenBudgetSelect resolves tie masses by id (all rows one score, " +
      "id narrowing forced through multiple levels)") {
    val rows = (0L until 500L).map(i => (i * 7 + 3, 0.5, (i % 5) + 1L))
    val df = rows.toDF("id", "score", "n")
    val total = rows.map(_._3).sum
    for (budget <- Seq(1L, total / 4, total / 2, total - 1))
      assert(selected(df, budget) == prefixOracle(rows, budget),
        s"divergence at budget $budget")
  }

  test("tokenBudgetSelect mixes distinct scores with a dominant tie " +
      "mass straddling the cutoff; zero-token rows ride the prefix") {
    val tie = (0L until 200L).map(i => (i, 0.25, if (i % 4 == 0) 0L else 2L))
    val high = (200L until 220L).map(i => (i, 0.9, 10L))
    val low = (220L until 240L).map(i => (i, 0.1, 1L))
    val rows = tie ++ high ++ low
    val df = rows.toDF("id", "score", "n")
    for (budget <- Seq(150L, 200L, 201L, 350L, 420L))
      assert(selected(df, budget) == prefixOracle(rows, budget),
        s"divergence at budget $budget")
  }

  test("tokenBudgetSelect fails loudly on NaN/NULL scores and negative " +
      "tokens; keeps original columns") {
    val bad = Seq((1L, Double.NaN, 2L)).toDF("id", "score", "n")
    val e = intercept[IllegalArgumentException] {
      Sampling.tokenBudgetSelect(bad, "id", "score", "n", 10L, log = _ => ())
    }
    assert(e.getMessage.contains("non-null/non-NaN"))
    val neg = Seq((1L, 0.5, -2L)).toDF("id", "score", "n")
    val e2 = intercept[IllegalArgumentException] {
      Sampling.tokenBudgetSelect(neg, "id", "score", "n", 10L, log = _ => ())
    }
    assert(e2.getMessage.contains("non-negative"))
    val ok = Seq((1L, 0.5, 2L, "keep-me")).toDF("id", "score", "n", "tag")
    assert(Sampling.tokenBudgetSelect(ok, "id", "score", "n", 10L,
      log = _ => ()).columns.toSeq == Seq("id", "score", "n", "tag"))
  }

  test("tokenBudgetSelect/ByGroup reject duplicate ids in the first " +
      "pass — the documented uniqueness check exists") {
    val dup = Seq((1L, 0.9, 2L), (1L, 0.5, 3L), (2L, 0.7, 1L))
      .toDF("id", "score", "n")
    val e = intercept[IllegalArgumentException] {
      Sampling.tokenBudgetSelect(dup, "id", "score", "n", 4L, log = _ => ())
    }
    assert(e.getMessage.contains("unique"), e.getMessage)
    val dupG = Seq((1L, "a", 0.9, 2L), (1L, "a", 0.5, 3L))
      .toDF("id", "grp", "score", "n")
    val e2 = intercept[IllegalArgumentException] {
      Sampling.tokenBudgetByGroup(dupG, "id", "grp", "score", "n",
        Map("a" -> 4L), log = _ => ())
    }
    assert(e2.getMessage.contains("unique"), e2.getMessage)
    // the same id in DIFFERENT groups is fine (uniqueness is per group)
    val cross = Seq((1L, "a", 0.9, 2L), (1L, "b", 0.5, 3L))
      .toDF("id", "grp", "score", "n")
    assert(Sampling.tokenBudgetByGroup(cross, "id", "grp", "score", "n",
      Map.empty, log = _ => ()).count() == 2L)
  }

  test("tokenBudgetByGroup survives a caller frame that already has " +
      "decision-table column names (_dg/_mode/_theta/_idcut)") {
    val rows = (0L until 60L).map(i =>
      (i, s"g${i % 2}", (i % 13).toDouble, (i % 4) + 1L))
    val df = rows.toDF("id", "grp", "score", "n")
      .withColumn("_dg", lit("x")).withColumn("_mode", lit(7))
      .withColumn("_theta", lit(0.0)).withColumn("_idcut", lit(-1L))
    val got = Sampling.tokenBudgetByGroup(df, "id", "grp", "score", "n",
        Map("g0" -> 20L, "g1" -> 25L), buckets = 4, maxLocal = 5L,
        log = _ => ())
    assert(got.columns.toSeq == df.columns.toSeq,
      "caller columns (collisions included) must pass through")
    val want = groupOracle(rows.map { case (id, g, s, n) => (id, g, s, n) },
      Map("g0" -> 20L, "g1" -> 25L), Long.MaxValue)
    assert(got.select("id").as[Long].collect().toSet == want)
  }

  // ---------------------------------------------- tokenBudgetByGroup

  private def groupOracle(rows: Seq[(Long, String, Double, Long)],
                          budgets: Map[String, Long],
                          dflt: Long): Set[Long] =
    rows.groupBy(_._2).flatMap { case (g, rs) =>
      val b = budgets.getOrElse(g, dflt)
      var acc = 0L
      rs.sortBy { case (id, _, s, _) => (-s, id) }
        .takeWhile { case (_, _, _, n) => { acc += n; acc <= b } }
        .map(_._1)
    }.toSet

  test("tokenBudgetByGroup matches the per-group prefix oracle — " +
      "mixed whole/zero/cut groups, ties, multi-level narrowing") {
    // g=a distinct scores; g=b one big tie mass; g=c fits whole;
    // g=d unlisted (default budget); g=e zero budget
    val rows =
      (0L until 120L).map(i => (i, "a", (i % 37).toDouble, (i % 7) + 1L)) ++
      (200L until 400L).map(i => (i, "b", 5.0, (i % 3) + 1L)) ++
      (400L until 410L).map(i => (i, "c", 1.0, 2L)) ++
      (500L until 540L).map(i => (i, "d", (i % 11).toDouble, 3L)) ++
      (600L until 610L).map(i => (i, "e", 9.9, 1L))
    val df = rows.toDF("id", "grp", "score", "n")
    val budgets = Map("a" -> 60L, "b" -> 111L, "c" -> 1000L, "e" -> 0L)
    for (dflt <- Seq(Long.MaxValue, 50L)) {
      val got = Sampling.tokenBudgetByGroup(df, "id", "grp", "score",
          "n", budgets, defaultBudget = dflt, buckets = 8, maxLocal = 6L,
          log = _ => ())
        .select("id").as[Long].collect().toSet
      assert(got == groupOracle(rows, budgets, dflt),
        s"divergence at defaultBudget $dflt")
    }
  }

  test("tokenBudgetByGroup: selection joins a broadcast cutoff table — " +
      "the data is never sorted, windowed, or exchanged; null groups " +
      "fail loudly") {
    val df = spark.range(0, 500).select(col("id"),
      concat(lit("g"), col("id") % 3) as "grp",
      (col("id") % 23).cast("double") as "score",
      (col("id") % 5 + 1) as "n")
    val out = Sampling.tokenBudgetByGroup(df, "id", "grp", "score", "n",
      Map("g0" -> 30L, "g1" -> 40L, "g2" -> 50L), log = _ => ())
    val p = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("SortMergeJoin") && !p.contains("Window") &&
      !p.contains("Exchange hashpartitioning"),
      "selection must be broadcast-join + filter:\n" + p)
    assert(p.contains("BroadcastHashJoin"), p)
    import spark.implicits._
    val nullG = Seq((1L, null.asInstanceOf[String], 1.0, 1L))
      .toDF("id", "grp", "score", "n")
    val e = intercept[IllegalArgumentException] {
      Sampling.tokenBudgetByGroup(nullG, "id", "grp", "score", "n",
        Map.empty, log = _ => ())
    }
    assert(e.getMessage.contains("non-null"))
  }

  test("tokenBudgetSelect plan: the selection is a filter over the " +
      "input — no sort, no window, no exchange of the data") {
    val rows = (0L until 300L).map { i =>
      (i, ((i * 37) % 101).toDouble / 101.0, (i % 13) + 1L)
    }
    // range-backed so ConvertToLocalRelation can't fold the filter away
    val df = spark.range(0, 300).select(col("id"),
      (col("id") * 37 % 101).cast("double") / 101.0 as "score",
      (col("id") % 13 + 1) as "n")
    val out = Sampling.tokenBudgetSelect(df, "id", "score", "n",
      rows.map(_._3).sum / 3, log = _ => ())
    val p = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Exchange") && !p.contains("Sort") &&
      !p.contains("Window"),
      "selection must be a pure scan-side filter:\n" + p)
  }
}
