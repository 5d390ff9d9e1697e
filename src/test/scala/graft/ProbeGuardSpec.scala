package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.ProbeGuard

/** The forced-broadcast probe contract must be SELF-ENFORCING: every
  * probe shape (corpus fingerprint probe, LSH/Hamming band probes, the
  * fuzzy key probe) counts its batch-derived key set and, above
  * `graft.probe.maxKeys`, falls back to the sort-merge shape loudly
  * instead of collecting an oversized frame onto the driver. Each test
  * drives an over-threshold "batch" through one probe site and asserts
  * (a) the plan carries NO forced broadcast (auto-broadcast is off, so
  * any BroadcastExchange would be a hint), (b) the results equal the
  * contracted-shape run bit for bit, (c) the fallback is logged. The
  * contracted shape itself is pinned in PlanQualitySpec (q69/q73/fp
  * probes) — those pins plus these fallbacks are the two halves of the
  * guard's "done" contract. */
class ProbeGuardSpec extends SparkSpec {

  private def withCap[T](cap: String)(body: => T): T = {
    spark.conf.set(ProbeGuard.ConfKey, cap)
    try body finally spark.conf.unset(ProbeGuard.ConfKey)
  }

  private def withLogCapture[T](body: => T): (T, Seq[String]) = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    val old = ProbeGuard.log
    ProbeGuard.log = m => buf.synchronized { buf += m }
    try (body, ()) match { case (r, _) => (r, buf.toSeq) }
    finally ProbeGuard.log = old
  }

  private def noAutoBroadcast[T](body: => T): T = {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  // ---------------------------------------------------------- unit level

  test("hinted: broadcast within cap, bare frame + loud log above it") {
    import spark.implicits._
    val keys = (1 to 100).toDF("k")
    val big = spark.range(0, 1000).select(col("id").as("k"))
    noAutoBroadcast {
      // within contract → the hint is attached
      val okJoin = big.join(ProbeGuard.hinted(keys, "spec-site"), Seq("k"))
      assert(planOf(okJoin).contains("BroadcastExchange"),
        "within the cap the probe must stay broadcast")
      // over contract → no hint, one warning naming the site and the knob
      withCap("10") {
        val (fbJoin, logs) = withLogCapture {
          big.join(ProbeGuard.hinted(keys, "spec-site"), Seq("k"))
        }
        assert(!planOf(fbJoin).contains("BroadcastExchange"),
          "over the cap the forced hint must be dropped:\n" + planOf(fbJoin))
        assert(logs.exists(m => m.contains("spec-site") &&
          m.contains(ProbeGuard.ConfKey)),
          s"fallback must log the site and the knob, got: $logs")
        assert(rows(fbJoin) == rows(big.join(broadcast(keys), Seq("k"))),
          "fallback must not change results")
      }
    }
  }

  test("onOverflow=fail turns the fallback into a loud error with the " +
      "same guidance; bad policy values are rejected") {
    import spark.implicits._
    val keys = (1 to 100).toDF("k")
    withCap("10") {
      spark.conf.set(ProbeGuard.PolicyKey, "fail")
      try {
        val e = intercept[IllegalStateException] {
          ProbeGuard.fits(keys, "spec-site")
        }
        assert(e.getMessage.contains("spec-site") &&
          e.getMessage.contains(ProbeGuard.ConfKey))
        spark.conf.set(ProbeGuard.PolicyKey, "explode")
        val e2 = intercept[IllegalArgumentException] {
          ProbeGuard.fits(keys, "spec-site")
        }
        assert(e2.getMessage.contains(ProbeGuard.PolicyKey))
      } finally spark.conf.unset(ProbeGuard.PolicyKey)
    }
  }

  test("cap <= 0 disables the guard; a non-numeric cap fails loudly") {
    import spark.implicits._
    val keys = (1 to 50).toDF("k")
    withCap("0") {
      val j = spark.range(0, 100).select(col("id").as("k"))
        .join(ProbeGuard.hinted(keys, "spec-site"), Seq("k"))
      noAutoBroadcast {
        assert(planOf(j).contains("BroadcastExchange"),
          "cap 0 must disable the guard (always hint)")
      }
    }
    withCap("not-a-number") {
      val e = intercept[IllegalArgumentException] {
        ProbeGuard.fits(keys, "spec-site")
      }
      assert(e.getMessage.contains(ProbeGuard.ConfKey))
    }
  }

  // ------------------------------------------------------- probe sites

  test("corpusFpHits: over-threshold batch falls back, results identical") {
    import spark.implicits._
    val cfps = (1 to 2000).map(i => s"fp$i").toDF("_fp")
    // one duplicate corpus row — the hit set must stay fp-distinct
    val cfpsDup = cfps.union(Seq("fp7").toDF("_fp"))
    val batch = (1 to 300).map(i => s"fp${i * 7}").toDF("_fp")
    noAutoBroadcast {
      val contracted = graft.apps.Curate.corpusFpHits(batch, "_fp", cfpsDup)
      assert(planOf(contracted).contains("BroadcastExchange"),
        "contracted shape must broadcast the batch keys")
      val expect = rows(contracted)
      assert(expect.distinct.size == expect.size,
        "hit set must be fingerprint-distinct even off a per-doc corpus table")
      withCap("10") {
        val (fb, logs) = withLogCapture {
          graft.apps.Curate.corpusFpHits(batch, "_fp", cfpsDup)
        }
        assert(!planOf(fb).contains("BroadcastExchange"),
          "over-threshold batch must drop BOTH forced hints:\n" + planOf(fb))
        assert(logs.exists(_.contains("Curate.corpusFpHits")))
        assert(rows(fb) == expect, "fallback must not change the hit set")
      }
    }
  }

  test("lshPlanAgainst: over-threshold batch reverts to sort-merge, same pairs") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val batch = docs.filter("doc_id % 5 = 0")
    val corpus = docs.filter("doc_id % 5 <> 0")
    noAutoBroadcast {
      // collect-then-unpersist: a still-cached contracted result would
      // hijack the fallback run via canonicalized cache matching
      // (broadcast hints are erased there) and mask a broken fallback
      val first = graft.dedup.Dedup.lshNearDupPairsAgainst(
        batch, corpus, "doc_id", "text", minJaccard = 0.5)
      val expect = rows(first)
      first.unpersist()
      withCap("10") {
        val ((cachesFb, planFb), logs) = withLogCapture {
          graft.dedup.Dedup.lshPlanAgainst(batch, corpus, "doc_id", "text",
            nGram = 3, bands = 4, minJaccard = 0.5, cacheSignatures = true)
        }
        val p = planOf(planFb)
        assert(!p.contains("BroadcastExchange"),
          "over-threshold batch must drop the band AND verify-fetch hints:\n" + p)
        assert(p.contains("Join type: LeftSemi"),
          "the semi-join verify-fetch filter must survive the fallback")
        assert(logs.exists(_.contains("Dedup.lshPlanAgainst")))
        assert(rows(planFb) == expect, "fallback must not change the pairs")
        cachesFb.foreach(_.unpersist())
      }
    }
  }

  test("hammingAbPlan (via simhash A-vs-B): fallback keeps results identical") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val batch = docs.filter("doc_id % 2 = 1")
    val corpus = docs.filter("doc_id % 2 = 0")
    def run(): DataFrame = graft.dedup.Dedup.simhashNearDupPairsAgainst(
      batch, corpus, "doc_id", "text", maxHamming = 3)
    noAutoBroadcast {
      val first = run()
      val expect = rows(first)
      first.unpersist() // see the lshPlanAgainst cache-hijack note
      withCap("10") {
        val (fb, logs) = withLogCapture(run())
        assert(logs.exists(_.contains("simhashNearDupPairsAgainst")),
          s"fallback must name the operator, got: $logs")
        assert(rows(fb) == expect, "fallback must not change the pairs")
        fb.unpersist()
      }
      // the uncached form exposes the plan: no forced hint above cap
      withCap("10") {
        val p = planOf(graft.dedup.Dedup.simhashNearDupPairsAgainst(
          batch, corpus, "doc_id", "text", maxHamming = 3,
          cacheSignatures = false))
        assert(!p.contains("BroadcastExchange"),
          "over-threshold batch bands must not broadcast:\n" + p)
      }
    }
  }

  test("fuzzyJoinAgainst: guard picks sort-merge for an over-cap A side") {
    import spark.implicits._
    val a = Seq((1L, "acme corp"), (2L, "globex inc"), (3L, "initech llc"))
      .toDF("id_a", "s")
    val b = Seq((10L, "acme corpz"), (20L, "globexx inc"), (30L, "unrelated co"))
      .toDF("id_b", "s")
    noAutoBroadcast {
      val expect = rows(graft.dedup.Fuzzy.fuzzyJoinAgainst(
        a, b, "id_a", "s", "id_b", "s", maxDist = 2))
      withCap("2") {
        val (fb, logs) = withLogCapture {
          graft.dedup.Fuzzy.fuzzyJoinAgainst(
            a, b, "id_a", "s", "id_b", "s", maxDist = 2)
        }
        assert(!planOf(fb).contains("BroadcastExchange"),
          "over-cap A side must take the symmetric shape:\n" + planOf(fb))
        assert(logs.exists(_.contains("Fuzzy.fuzzyJoinAgainst")))
        assert(rows(fb) == expect, "fallback must not change the matches")
      }
      // probeScale=false skips the probe shape (and the guard count)
      val (off, logs) = withLogCapture {
        graft.dedup.Fuzzy.fuzzyJoinAgainst(
          a, b, "id_a", "s", "id_b", "s", maxDist = 2, probeScale = false)
      }
      assert(logs.isEmpty, "probeScale=false must not consult the guard")
      assert(rows(off) == expect)
    }
  }

  test("decontaminate: a corpus-sized 'benchmark' gram set falls back " +
      "instead of force-broadcasting") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val corpus = docs.filter("doc_id % 3 <> 0")
    val bench = docs.filter("doc_id % 3 = 0")
    def run(): Seq[String] = rows(graft.text.Decontaminate.decontaminate(
      corpus, bench, "doc_id", "text", 5).select(col("doc_id")))
    noAutoBroadcast {
      val expect = run()
      withCap("10") {
        val (fb, logs) = withLogCapture {
          graft.text.Decontaminate.decontaminate(
            corpus, bench, "doc_id", "text", 5).select(col("doc_id"))
        }
        assert(!planOf(fb).contains("BroadcastExchange"),
          "over-cap gram set must not broadcast:\n" + planOf(fb))
        assert(logs.exists(_.contains("Decontaminate.benchGrams")))
        assert(rows(fb) == expect, "fallback must not change the clean set")
      }
    }
  }

  test("resolveBatch threads probeScale to both internal fuzzy joins") {
    import spark.implicits._
    val master = Seq((100L, "acme corp"), (200L, "globex inc"))
      .toDF("m_id", "name")
    val batch = Seq((1L, "acme corpz"), (2L, "stark industries"),
      (3L, "stark industriez"), (4L, "wayne enterprises"))
      .toDF("b_id", "name")
    def run(ps: Boolean): Seq[String] = {
      val r = graft.dedup.EntityResolve.resolveBatch(batch, master,
        "b_id", "name", "m_id", "name", maxDist = 2, probeScale = ps)
      val out = rows(r)
      graft.ops.StageCut.release(r)
      out
    }
    val probe = run(ps = true)
    val (symmetric, logs) = withLogCapture(run(ps = false))
    assert(logs.isEmpty, "probeScale=false must skip the guard entirely")
    assert(symmetric == probe,
      "assignment semantics must not depend on the join shape")
  }
}
