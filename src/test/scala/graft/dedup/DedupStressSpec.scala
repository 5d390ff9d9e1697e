package graft.dedup

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.Tag

/** Marks the adversarial scale-stress tests (~60-90s on local[4]).
  * They run in the default `sbt test` — the tag exists so a hurried
  * inner loop can exclude them: `testOnly -- -l graft.SlowStress`. */
object SlowStress extends Tag("graft.SlowStress")

/** Adversarial scale-stress for the dedup suite: an order of magnitude
  * past the sf0.1 gate corpus, with DELIBERATE skew.
  *
  * Corpus = 50,000 salted near-dup documents (every sf0.1 doc exploded
  * into a 10-copy family, each copy's text perturbed so families are
  * near- but not exact duplicates) + a 20,000-document boilerplate tail
  * sharing ONE text — the degenerate common-signature case that turns
  * a banded design quadratic (20k members ⇒ ~2e8 candidate pairs from
  * a single bucket) unless the hot-bucket cap intervenes.
  *
  * Asserted, for both text pair finders and clustering: the run
  * COMPLETES with bounded output, the cap FIRES and logs the cull, and
  * no boilerplate pair leaks through. This is the cheapest available
  * falsification of the 100 TB scale story: every claim the scaladocs
  * make about skew survival is exercised here at 14x the gate corpus.
  *
  * Measured runtime (local[4], 4 shuffle partitions, 8g heap): ~2m05s
  * for the four stress tests together, suite overhead included (the
  * LSH run is shared between the pair-finder and clustering tests and
  * got ~40% cheaper when graft_jaccard replaced the per-pair
  * array_intersect verify in round 6; the SimHash pass over 70k docs
  * with ~38M banded candidates now dominates, and the embedding
  * hot-block test adds ~15s). */
class DedupStressSpec extends SparkSpec with HotBucketLogCapture {

  /** 70k docs: 5000 families x 10 salted copies + 20k boilerplate. */
  private lazy val corpus: DataFrame = {
    val copies = Tables.load(spark, sf("sf0.1"), "documents")
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), lit(9L))).as("copy"))
      .select((col("doc_id") * 100 + col("copy")).as("doc_id"),
        concat(col("text"), lit(" stress variant "), col("copy")).as("text"))
    val boiler = spark.range(20000)
      .select((col("id") + BoilerBase).as("doc_id"),
        lit("all rights reserved this document is provided as is without " +
          "warranty of any kind see terms of service for details").as("text"))
    copies.unionByName(boiler)
  }

  private val BoilerBase = 10000000L

  private def isBoiler(c: org.apache.spark.sql.Column) = c >= BoilerBase

  /** The LSH run is the expensive part (~80s): compute it ONCE, with
    * the cap log captured, and let both the pair-finder test and the
    * clustering test read it. maxBucket 2000: far above any family
    * bucket (10 members) and any healthy natural bucket, far below the
    * 20k boilerplate bucket. */
  private lazy val lshRun: (DataFrame, Seq[String]) = withLogCapture {
    Dedup.lshNearDupPairs(corpus, "doc_id", "text",
      nGram = 3, bands = 4, minJaccard = 0.5, cacheSignatures = true,
      maxBucket = 2000)
  }

  test("LSH pair finder survives the 70k-doc skewed corpus; cap culls the boilerplate", SlowStress) {
    {
      val (pairs, logged) = lshRun
      val total = pairs.count()
      val boilerPairs = pairs.filter(
        isBoiler(col("id_a")) || isBoiler(col("id_b"))).count()
      val familyPairs = pairs.filter(
        floor(col("id_a") / 100) === floor(col("id_b") / 100)).count()
      // bounded: families contribute <= C(10,2) * 5000 = 225k pairs;
      // anything wildly past that means the cull failed
      assert(total > 0 && total < 500000L, s"unbounded pair list: $total")
      assert(boilerPairs == 0L,
        s"boilerplate pairs leaked through the cap: $boilerPairs")
      // the salted families are the signal the finder must KEEP finding
      // under skew: near-total recall of the 225k within-family pairs
      assert(familyPairs > 150000L, s"family recall collapsed: $familyPairs")
      assert(logged.exists(m => m.contains("lshNearDupPairs")
        && m.contains("maxBucket=2000")), s"cap never logged: $logged")
    }
  }

  test("SimHash pair finder survives the same corpus; identical tail is culled not paired", SlowStress) {
    // 20k identical signatures would emit ~2e8 hamming-0 pairs; the
    // cap must cull those buckets. maxBucket 5000 leaves the healthy
    // (bi, bv) buckets (~70k/256 per band) untouched.
    val ((total, boilerPairs), logged) = withLogCapture {
      val pairs = Dedup.simhashNearDupPairs(corpus, "doc_id", "text",
        maxHamming = 3, cacheSignatures = true, maxBucket = 5000)
      val t = pairs.count()
      val b = pairs.filter(
        isBoiler(col("id_a")) || isBoiler(col("id_b"))).count()
      pairs.unpersist()
      (t, b)
    }
    // the synthetic vocabulary is small, so signatures cluster and
    // hamming<=3 genuinely holds for ~6.5M cross-family pairs — the
    // bound is about QUADRATIC failure, not the data's true density:
    // all-pairs would be C(70k,2) ~ 2.4e9; a surviving cull keeps the
    // verified list under 1% of that
    assert(total < 24000000L, s"unbounded pair list: $total")
    assert(boilerPairs == 0L,
      s"boilerplate pairs leaked through the cap: $boilerPairs")
    assert(logged.exists(m => m.contains("simhashNearDupPairs")),
      s"cap never logged: $logged")
  }

  private val HotVecBase = 20000000L

  /** 23k vectors: 300 families x 10 near-identical copies (clustered
    * into 20 superclusters so the corpus has real structure for the
    * cell-pair bound to prune) + a 20,000-copy IDENTICAL vector — the
    * embedding twin of the boilerplate tail: one cell owns it, C(20k,2)
    * ~ 2e8 cosine-1 pairs unless the cap culls the cell. */
  private lazy val embCorpus: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 32
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    def gauss(scale: Float): Array[Float] =
      Array.fill(dim)((rnd.nextGaussian() * scale).toFloat)
    val superC = Array.fill(20)(unit(gauss(1.0f)))
    val fams = (0 until 300).flatMap { f =>
      val base = unit(superC(f % 20).zip(gauss(0.5f)).map { case (x, e) => x + e })
      (0 until 10).map { c =>
        ((f * 10 + c).toLong,
          unit(base.zip(gauss(0.01f)).map { case (x, e) => x + e }))
      }
    }
    val hotVec = unit(Array.fill(dim)(1.0f))
    val hot = (0 until 20000).map(i => (HotVecBase + i, hotVec))
    (fams ++ hot).toDF("vec_id", "embedding")
  }

  test("auto-blocked embedding join survives a 20k identical-vector hot block", SlowStress) {
    val (pairs, logged) = withLogCapture {
      SimilarJoin.similarJoin(embCorpus, "vec_id", "embedding",
        SimilarityMethod.EmbeddingCosine(0.95, None, numCells = 16),
        maxBucket = 2000)
    }
    val total = pairs.count()
    val hotPairs = pairs.filter(
      col("id_a") >= HotVecBase || col("id_b") >= HotVecBase).count()
    val familyPairs = pairs.filter(
      floor(col("id_a") / 10) === floor(col("id_b") / 10)).count()
    pairs.unpersist()
    // bounded: families contribute C(10,2) * 300 = 13500 pairs, plus
    // whatever same-supercluster cross-family cosines clear 0.95
    assert(total > 0 && total < 100000L, s"unbounded pair list: $total")
    assert(hotPairs == 0L,
      s"identical-vector hot-block pairs leaked through the cap: $hotPairs")
    // the method is EXACT outside culled cells, so within-family recall
    // only dips where a family member strayed into the culled hot cell
    assert(familyPairs > 12000L, s"family recall collapsed: $familyPairs")
    assert(logged.exists(m => m.contains("similarJoin(EmbeddingCosine)")
      && m.contains("maxBucket=2000")), s"cap never logged: $logged")
  }

  test("A-vs-B LSH join survives the boilerplate tail on BOTH sides", SlowStress) {
    // the incremental shape under the same adversary: the 20k-copy
    // boilerplate split across new batch AND standing corpus. An A-vs-B
    // band bucket costs |A| × |B| pairs — 10k × 10k = 1e8 from ONE band
    // unless BOTH per-side caps fire. Sides split by id parity so every
    // family also straddles the sides and keeps contributing signal.
    val newSide = corpus.filter(col("doc_id") % 2 === 1)
    val corpusSide = corpus.filter(col("doc_id") % 2 === 0)
    val ((total, boilerPairs, familyPairs), logged) = withLogCapture {
      val pairs = Dedup.lshNearDupPairsAgainst(newSide, corpusSide,
        "doc_id", "text", nGram = 3, bands = 4, minJaccard = 0.5,
        cacheSignatures = true, maxBucket = 2000)
      val t = pairs.count()
      val b = pairs.filter(
        isBoiler(col("id_a")) || isBoiler(col("id_b"))).count()
      val f = pairs.filter(
        floor(col("id_a") / 100) === floor(col("id_b") / 100)).count()
      pairs.unpersist()
      (t, b, f)
    }
    // cross-side family pairs: each 10-copy family splits ~5 odd / ~5
    // even ⇒ ~25 cross pairs × 5000 families = ~125k at full recall
    assert(total > 0 && total < 500000L, s"unbounded pair list: $total")
    assert(boilerPairs == 0L,
      s"boilerplate pairs leaked through the per-side caps: $boilerPairs")
    assert(familyPairs > 80000L, s"cross-side family recall collapsed: $familyPairs")
    assert(logged.exists(_.contains("lshNearDupPairsAgainst(new)")),
      s"new-side cap never logged: $logged")
    assert(logged.exists(_.contains("lshNearDupPairsAgainst(corpus)")),
      s"corpus-side cap never logged: $logged")
  }

  test("auto-K (numCells = 0) embedding join survives stress scale, stays exact", SlowStress) {
    // round 7 made auto-K the DEFAULT for every embedding API but every
    // gate and spec pinned K (tiny corpora resolve to K = 1) — this is
    // the first run of the K > 1 auto regime: 23k vectors ⇒ K = 23
    // trained cells. Two halves, because the hot-cell CULL is
    // K-dependent (which family strays into the culled cell differs
    // between K = 23 and K = 16, so full-corpus pair sets may
    // legitimately differ at the margin):
    // (a) the full 23k corpus with the hot block — auto-K must survive
    //     exactly like pinned-16 does: bounded output, hot cell culled
    //     loudly, zero leaks, family recall held;
    assert(graft.sim.AutoBlock.resolveCells(0, 23000L) == 23)
    val (autoPairs, logged) = withLogCapture {
      SimilarJoin.similarJoin(embCorpus, "vec_id", "embedding",
        SimilarityMethod.EmbeddingCosine(0.95, None, numCells = 0),
        maxBucket = 2000)
    }
    val total = autoPairs.count()
    val hotLeaks = autoPairs.filter(
      col("id_a") >= HotVecBase || col("id_b") >= HotVecBase).count()
    val familyPairs = autoPairs.filter(
      floor(col("id_a") / 10) === floor(col("id_b") / 10)).count()
    autoPairs.unpersist()
    assert(logged.exists(m => m.contains("similarJoin(EmbeddingCosine)")
      && m.contains("maxBucket=2000")),
      s"the hot cell must be culled under auto-K too: $logged")
    assert(total > 0 && total < 100000L, s"unbounded pair list: $total")
    assert(hotLeaks == 0L, s"hot-block pairs leaked under auto-K: $hotLeaks")
    assert(familyPairs > 12000L, s"family recall collapsed under auto-K: $familyPairs")
    // (b) the 3k family corpus with NO cull in play (default cap) —
    //     here exactness is unconditional, so auto-K (→ 3 cells) and a
    //     pinned K must produce the IDENTICAL pair set: K steers cost,
    //     never results
    val fams = embCorpus.filter(col("vec_id") < HotVecBase)
    val auto = SimilarJoin.similarJoin(fams, "vec_id", "embedding",
      SimilarityMethod.EmbeddingCosine(0.95, None, numCells = 0))
    val autoSet = auto.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    auto.unpersist()
    val pinned = SimilarJoin.similarJoin(fams, "vec_id", "embedding",
      SimilarityMethod.EmbeddingCosine(0.95, None, numCells = 16))
    val pinnedSet = pinned.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    pinned.unpersist()
    assert(autoSet == pinnedSet,
      "K must steer cost only — auto-K and pinned-K pair sets diverged")
    assert(autoSet.nonEmpty)
  }

  test("clustering the stressed pair list converges to family components", SlowStress) {
    val (pairs, _) = lshRun
    val clusters = Dedup.dupClusters(pairs)
    // every label is the min id of its component, so label <= id; and
    // component count stays in the family ballpark (cross-family
    // merges from natural near-dups are allowed, explosions are not)
    val bad = clusters.filter(col("cluster") > col("id")).count()
    val nClusters = clusters.select("cluster").distinct().count()
    val nIds = clusters.count()
    pairs.unpersist()
    assert(bad == 0L, "a cluster label exceeded a member id")
    assert(nIds > 40000L, s"clustering lost members: $nIds")
    assert(nClusters > 1000L && nClusters < 6000L,
      s"implausible component count: $nClusters")
  }

  test("fuzzy join survives a 50k shared-prefix+band hot block", SlowStress) {
    import spark.implicits._
    // 50k entity names all starting "ma" with identical length (one
    // prefix block, one band) — uncapped, that single block is
    // 50k × 50k candidate Levenshteins (~2.5e9 DP cells × string len).
    // With the cap the block is culled loudly and the run completes;
    // the distinctive cold pair still matches.
    val hot = (0L until 50000L).map(i => (i, f"ma${i}%05d-entity-rec"))
    val a = (hot :+ (90001L -> "zq distinctive name")).toDF("id_a", "s")
    val b = (hot.map { case (i, s) => (i + 200000L, s) } :+
      (90002L -> "zq distinctive nam")).toDF("id_b", "s")
    val t0 = System.nanoTime()
    val (out, logs) = withLogCapture {
      Fuzzy.fuzzyJoinAgainst(a, b, "id_a", "s", "id_b", "s",
          maxDist = 1, maxBucket = 1000)
        .as[(Long, Long, Long)].collect().toSeq
    }
    val ms = (System.nanoTime() - t0) / 1000000L
    assert(out.contains((90001L, 90002L, 1L)),
      "cold-block pair lost under the cap")
    assert(logs.exists(_.contains("fuzzyJoinAgainst")),
      "cap never fired on the 50k hot block")
    // every emitted pair must be a genuine <=1-edit match
    assert(out.forall(_._3 <= 1L))
    info(s"fuzzy stress completed in ${ms}ms, ${out.size} pairs")
  }
}
