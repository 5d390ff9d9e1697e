package graft

/** Benchmark main: runs every gate query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Each query is timed twice and reports the MIN —
  * run 1 pays per-query codegen compilation (a one-time cost a resident
  * engine amortizes); min-of-2 is the steady-state number and halves
  * run-to-run variance on a shared machine.
  *
  * The two timing passes are INTERLEAVED across the whole query list
  * (pass A: q1..qN, then pass B: q1..qN) rather than back-to-back per
  * query, so end-of-run JVM/GC pressure or machine contention lands on
  * different queries in each pass instead of doubling up on whichever
  * queries happen to run last — a back-to-back tail spike mis-signaled a
  * 5-11x "regression" on unchanged code in round 2. When the two passes
  * STILL disagree by >1.5x, a tie-break third timing runs and the query
  * reports min-of-3 with a "noisy" stderr marker — interleaving cannot
  * absorb a spike that hits the same query in both passes (round 5's
  * phantom q05 1.94x). Per-query run1/run2[/run3] go to stderr so
  * variance is visible without breaking the one-line stdout contract. A
  * generic warm-up covers the common operator shapes before timing
  * starts.
  *
  * `--until-clean N` (first arg): every committed bench artifact in
  * rounds 14–17 was ambient-inflated — the canaries DETECTED it but
  * nothing acted on it. With the flag, the whole suite re-runs up to N
  * times and the FIRST `contended:false` attempt's artifact is the one
  * emitted; if every attempt is contended, the artifact is the
  * per-query MIN-COMPOSITE across attempts, stamped
  * `"min_composite":true` with every attempt's canary quadruple on the
  * summary line — still an upper bound, and self-describing as one. */
object Bench {

  private final case class Attempt(results: Seq[(String, Double)],
                                   canaryStart: Double, canaryEnd: Double,
                                   shuffleStart: Double, shuffleEnd: Double) {
    // TWO-SIDED drift test: round 9's driver run started contended and
    // settled — canary 6.7s → 1.1s — and the old `end > 1.5*start`
    // one-sided test stamped contended=false while ~1.3-1.5x inflation
    // sat on dozens of untouched queries. Contention at EITHER end of
    // the run means the numbers in between are suspect — and EITHER
    // canary (the scan canary misses exchange-bound load).
    private def drifted(s: Double, e: Double): Boolean =
      s > 0 && e > 0 && math.max(s, e) > 1.5 * math.min(s, e)
    def contended: Boolean = drifted(canaryStart, canaryEnd) ||
      drifted(shuffleStart, shuffleEnd)
  }

  def main(args: Array[String]): Unit = {
    // `--until-clean N` must lead; everything after (or everything,
    // without the flag) is the optional query-name filter
    val (maxAttempts, nameArgs) = args.toSeq match {
      case Seq("--until-clean", n, tail @ _*) =>
        val k =
          try n.toInt
          catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"--until-clean needs an attempt count, got '$n'")
          }
        require(k >= 1 && k <= 10, s"--until-clean attempts must be in [1,10], got $k")
        (k, tail)
      case other => (1, other)
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build("graft-bench", s"local[$cpus]")
    spark.sparkContext.setLogLevel("WARN")
    locally { // untimed warm-up: scan/agg/join/window/sort codegen
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val a = spark.range(100000).select(col("id"), (col("id") % 97).as("k"),
        rand(7).as("v"))
      val b = spark.range(1000).select(col("id").as("k"))
      a.join(b, a("k") === b("k")).groupBy(a("k")).agg(sum("v").as("s"))
        .withColumn("rn", row_number().over(Window.orderBy(col("s"))))
        .orderBy(col("s").desc).limit(10).count()
    }
    def one(name: String,
            fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      // queries that persist internally (q30/q61 pair lists) must not let
      // pass B time an InMemoryTableScan of pass A's blocks — the cache
      // manager matches identical plans across separate calls
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      // Timed action is a noop-SINK WRITE, not count(): under
      // Dataset.count() Catalyst prunes every deterministic projection
      // and final sort (the optimized plan of a map-shaped query is a
      // bare scan-count), so ~14 text/render queries were under-measured
      // 2-7x (q35 real ~1.5s vs 0.27 reported). The noop sink consumes
      // every output row, so the full expression work is evaluated and
      // timed while still writing nothing.
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() } catch {
        case e: Throwable =>
          // a broken query must not masquerade as a fast one — say why
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }
    // optional name filter: `runMain graft.Bench q72_… q70_…` times
    // only those queries — the per-query adjudication tool (the
    // driver's full run passes no args; unknown names fail loudly)
    val names =
      if (nameArgs.isEmpty) SparkEntry.queries.keys.toSeq
      else {
        val unknown = nameArgs.filterNot(SparkEntry.queries.contains)
        require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
        nameArgs.toSeq
      }
    // RUN-LEVEL contention canary (rounds 5-7 each published a phantom
    // per-query "regression" that judge re-measurement traced to
    // whole-run machine load — uniform contention the per-query
    // tie-break cannot see). One fixed sentinel query is timed at run
    // START (after its own untimed codegen warm-up, so both canary
    // timings are steady-state) and again at run END; >1.5x drift
    // stamps "contended": true so a slow-looking run self-identifies
    // instead of burning a judge re-adjudication.
    val sentinel = "q01_pricing_summary"
    // SECOND canary, shuffle-heavy: q01 is a scan+agg over pushed
    // filters — too small to sense contention that lands on WIDE
    // stages. Round 16's driver artifact carried ~20% uniform
    // inflation on shuffle-heavy queries under a CLEAN q01 canary
    // (judge re-bench disproved every "regression"). This synthetic
    // pays two full 32-way exchanges (hash agg + distinct) over a
    // fixed generated frame, so executor-thread contention that only
    // shows up on exchange-bound work moves THIS number too.
    def shuffleCanary(): Double = {
      import org.apache.spark.sql.functions.{col, countDistinct, sum}
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      spark.range(4000000L)
        .select((col("id") % 100000).as("k"),
          (col("id") * 2654435761L % 9973).as("v"))
        .groupBy(col("k"))
        .agg(sum(col("v")).as("s"), countDistinct(col("v")).as("d"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    one(sentinel, SparkEntry.queries(sentinel)) // untimed: compile the plan
    shuffleCanary() // untimed: codegen + first-shuffle setup

    def runSuite(): Attempt = {
      val canaryStart = one(sentinel, SparkEntry.queries(sentinel))
      val shuffleStart = shuffleCanary()
      val passA = names.map(n => n -> one(n, SparkEntry.queries(n))).toMap
      val passB = names.map(n => n -> one(n, SparkEntry.queries(n))).toMap
      val results = names.map { n =>
        val (a, b) = (passA(n), passB(n))
        // noise self-adjudication: round 5 published a 1.94x phantom
        // regression (q05) that a judge re-measure disproved. When the
        // LATER pass is >1.5x slower than the earlier one, contention hit
        // pass B and the min may still be contaminated — a tie-break third
        // timing runs and the query reports min-of-3, marked "noisy" on
        // stderr. The trigger is deliberately one-sided: run1 > run2 by
        // any factor is the EXPECTED cold-codegen pattern (pass A compiles
        // every plan), where run2 already is the steady-state min — a
        // symmetric trigger would re-run nearly every query for nothing.
        if (a >= 0 && b >= 0 && b > 1.5 * a) {
          val c = one(n, SparkEntry.queries(n))
          System.err.println(f"[bench] $n%-28s run1=$a%8.3f run2=$b%8.3f run3=$c%8.3f noisy")
          n -> (if (c < 0) math.min(a, b) else math.min(math.min(a, b), c))
        } else {
          System.err.println(f"[bench] $n%-28s run1=$a%8.3f run2=$b%8.3f")
          n -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
        }
      }
      val canaryEnd = one(sentinel, SparkEntry.queries(sentinel))
      val shuffleEnd = shuffleCanary()
      Attempt(results, canaryStart, canaryEnd, shuffleStart, shuffleEnd)
    }

    // 3-decimal rounding roughly halves the line (61 queries of
    // full-precision doubles overflowed the driver's tail capture in r3
    // → parsed:null); "value" stays FIRST so truncation can only eat
    // per-query detail, never the headline total
    def r3dec(v: Double): String =
      if (v < 0) "-1"
      // Locale.ROOT: a comma-decimal default locale would render "1,234"
      // and break the JSON line this formatting exists to protect
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    val attempts = scala.collection.mutable.ArrayBuffer.empty[Attempt]
    var clean: Option[Attempt] = None
    while (clean.isEmpty && attempts.size < maxAttempts) {
      val at = runSuite()
      attempts += at
      System.err.println(f"[bench] attempt ${attempts.size}/$maxAttempts: " +
        f"canary ${at.canaryStart}%.3f->${at.canaryEnd}%.3f shuffle " +
        f"${at.shuffleStart}%.3f->${at.shuffleEnd}%.3f contended=${at.contended}")
      if (!at.contended) clean = Some(at)
    }
    // the emitted artifact: the first clean attempt, else the per-query
    // MIN across every (contended) attempt — still an upper bound, and
    // stamped as a composite so the reader knows
    val minComposite = clean.isEmpty && attempts.size > 1
    val emit = clean.getOrElse {
      if (attempts.size == 1) attempts.head
      else {
        val byQuery = names.map { n =>
          val vs = attempts.map(_.results.toMap.apply(n)).filter(_ >= 0)
          n -> (if (vs.isEmpty) -1.0 else vs.min)
        }
        val last = attempts.last
        Attempt(byQuery, last.canaryStart, last.canaryEnd,
          last.shuffleStart, last.shuffleEnd)
      }
    }
    val results = emit.results
    val contended = clean.isEmpty
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r3dec(v) }
      .mkString("{", ",", "}")
    // a failed query's -1 sentinel must not SHRINK the total (a broken
    // query would read as a speedup); sum successes, surface failures
    val failed = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    // every attempt's canary quadruple rides the summary line so a
    // min-composite artifact still carries the full contention record
    val canariesJson = attempts.map(a =>
      s"[${r3dec(a.canaryStart)},${r3dec(a.canaryEnd)}," +
        s"${r3dec(a.shuffleStart)},${r3dec(a.shuffleEnd)}]")
      .mkString("[", ",", "]")
    println(s"""{"metric":"total","value":${r3dec(total)},"unit":"sec","failed":$failed,"contended":$contended,"min_composite":$minComposite,"attempts":${attempts.size},"canary_start":${r3dec(emit.canaryStart)},"canary_end":${r3dec(emit.canaryEnd)},"shuffle_canary_start":${r3dec(emit.shuffleStart)},"shuffle_canary_end":${r3dec(emit.shuffleEnd)},"sf":"$sfDir","queries":$qs}""")
    // The driver's bench artifact keeps only the LAST 2000 chars of
    // stdout; with 70+ queries the big line overflows that window and
    // truncation eats the HEAD (total/contended/canary) — in round 8 the
    // canary verdict that would have adjudicated a phantom per-query
    // outlier in seconds was exactly the part cut off. A second, compact
    // summary line (no per-query map) printed AFTER the big line sits at
    // the tail, so any tail-capture always preserves the run verdict.
    println(s"""{"metric":"summary","value":${r3dec(total)},"unit":"sec","nqueries":${results.size},"failed":$failed,"contended":$contended,"min_composite":$minComposite,"attempts":${attempts.size},"attempt_canaries":$canariesJson,"canary_start":${r3dec(emit.canaryStart)},"canary_end":${r3dec(emit.canaryEnd)},"shuffle_canary_start":${r3dec(emit.shuffleStart)},"shuffle_canary_end":${r3dec(emit.shuffleEnd)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
