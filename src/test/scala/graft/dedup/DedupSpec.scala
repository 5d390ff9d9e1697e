package graft.dedup

import graft.SparkSpec
import graft.ops.Skew
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different content about spark engines"),
    (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
  ).toDF("doc_id", "text")

  test("exactDupGroups finds only the exact pair") {
    val got = Dedup.exactDupGroups(docs, "doc_id", "text").collect()
    assert(got.length == 1)
    assert(got.head.getLong(1) == 2L) // cnt
    assert(got.head.getLong(2) == 1L) // min_id
  }

  test("lshNearDupPairs surfaces exact and near dups, not unrelated docs") {
    val pairs = Dedup.lshNearDupPairs(docs, "doc_id", "text", 3, 4, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // exact dup: jaccard 1.0
    assert(pairs.contains((1L, 2L))) // near dup shares most shingles
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("lsh jaccard values are exact (verified against hand computation)") {
    val j = Dedup.lshNearDupPairs(docs, "doc_id", "text", 3, 4, 0.0)
      .filter(col("id_a") === 1 && col("id_b") === 4)
      .select("jaccard").as[Double].collect().head
    assert(j == 1.0)
  }

  test("simhash: identical texts equal, near texts hamming-close, far texts not") {
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val sh = docs.select(col("doc_id"), Dedup.simhash32(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(4L))
    assert(hamming(sh(1L), sh(2L)) < hamming(sh(1L), sh(3L)))
  }

  test("saltedJoin returns the same rows as a plain join") {
    val big = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i))
      .toDF("k", "v")
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "label")
    val plain = big.join(dim, Seq("k")).select("k", "v", "label").collect().toSet
    val salted = Skew.saltedJoin(big, dim, "k", 8)
      .select("k", "v", "label").collect().toSet
    assert(salted == plain)
    assert(salted.count(_.getString(0) == "hot") == 100)
  }

  test("keyHistogram ranks heavy keys first") {
    val df = (Seq.fill(50)("hot") ++ Seq("a", "b")).toDF("k")
    val top = Skew.keyHistogram(df, "k", 1).collect().head
    assert(top.getString(0) == "hot" && top.getLong(1) == 50L)
    assert(top.getDouble(2) == math.round(50.0 / 52.0 * 1e6) / 1e6)
  }

  test("saltedJoin rejects salt-unsafe join types") {
    val big = Seq(("k", 1)).toDF("k", "v")
    val dim = Seq(("k", "A")).toDF("k", "label")
    // right/full outer would emit each unmatched small-side row once per salt
    intercept[IllegalArgumentException] { Skew.saltedJoin(big, dim, "k", 4, "right") }
    intercept[IllegalArgumentException] { Skew.saltedJoin(big, dim, "k", 4, "full_outer") }
    // the safe set still works, including underscore spellings
    assert(Skew.saltedJoin(big, dim, "k", 4, "left_semi").count() == 1)
    assert(Skew.saltedJoin(big, dim, "k", 4, "left").count() == 1)
  }
}

/** Staged text-op paths must stay value-identical to the unstaged
  * Column forms, and the banded simhash pair operator must honor its
  * pigeonhole recall bound. */
class StagedEquivalenceSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private lazy val docs = graft.Tables.load(spark, sf("sf0.01"), "documents")
    .select(col("doc_id"), col("text")).limit(200)

  test("withSimhash32 equals the unstaged simhash32 on real docs") {
    val staged = Dedup.withSimhash32(docs, "text", "s")
      .select("doc_id", "s").as[(Long, Long)].collect().toMap
    val unstaged = docs.select(col("doc_id"),
        Dedup.simhash32(col("text")).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(staged == unstaged)
  }

  test("minhashBands (native graft_lsh_sig) equals per-band interpreted minhash on real docs") {
    val sh = graft.text.TextOps.shingles(col("text"), 3)
    val unstaged = docs.select(col("doc_id"),
        (0 until 4).map(b => graft.text.TextOps.minhash(sh, b)).reduce(concat_ws("|", _, _)).as("m"))
      .as[(Long, String)].collect().toMap
    val staged = Dedup.minhashBands(docs, "doc_id", "text", 3, 4)
      .select(col("doc_id"),
        concat_ws("|", col("mh0"), col("mh1"), col("mh2"), col("mh3")).as("m"))
      .as[(Long, String)].collect().toMap
    assert(staged == unstaged)
  }

  test("simhashNearDupPairs: hamming bound holds and near-identical docs pair") {
    // identical texts → hamming 0, deterministically within any bound
    // (simhash distance on SHORT texts is noisy for single-word edits —
    // the operator's domain is long documents)
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content about database engines and parquet files"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDupPairs(d, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.get((1L, 2L)).contains(0L), s"identical docs must pair at 0: $pairs")
    assert(pairs.values.forall(_ <= 3))
  }
}

/** The hot-bucket escape hatch: a degenerate band bucket (here: 1k
  * identical boilerplate docs — every band collides) must not go
  * quadratic; oversized buckets are dropped LOUDLY and pairs outside
  * them survive untouched. */
class HotBucketSpec extends SparkSpec with HotBucketLogCapture {
  import spark.implicits._

  /** n boilerplate clones + one genuinely distinct near-dup pair. */
  private def adversarial(n: Int) = {
    val hot = (1 to n).map(i =>
      (i.toLong, "spam spam boilerplate navigation text repeated on every mirrored page of the crawl"))
    val pair = Seq(
      (900001L, "a genuinely unique document describing catalyst expression codegen internals"),
      (900002L, "a genuinely unique document describing catalyst expression codegen internals"))
    (hot ++ pair).toDF("doc_id", "text")
  }

  test("lsh: hot bucket dropped loudly; disjoint pair survives; output bounded") {
    val (got, logs) = withLogCapture {
      Dedup.lshNearDupPairs(adversarial(1000), "doc_id", "text", 3, 4, 0.0,
        cacheSignatures = true, maxBucket = 100).collect()
    }
    // without the cap this corpus emits C(1000,2)+1 = 499501 pairs; the
    // capped run keeps ONLY the pair outside the hot bucket
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((900001L, 900002L)), s"got ${got.length} pairs")
    assert(logs.exists(m => m.contains("lshNearDupPairs") &&
      m.contains("maxBucket=100")), s"cap must not be silent: $logs")
  }

  test("simhash: capped vs uncapped pair counts; cap is loud; bound is real") {
    val docs = adversarial(1000)
    val (capped, logs) = withLogCapture {
      Dedup.simhashNearDupPairs(docs, "doc_id", "text", 3,
        cacheSignatures = true, maxBucket = 100).collect()
    }
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((900001L, 900002L)))
    assert(logs.exists(m => m.contains("simhashNearDupPairs") &&
      m.contains("maxBucket=100")), s"cap must not be silent: $logs")
    // the uncapped run REALLY is quadratic on this corpus — the cap is
    // load-bearing, not decorative
    val (uncapped, noLogs) = withLogCapture {
      Dedup.simhashNearDupPairs(docs, "doc_id", "text", 3,
        cacheSignatures = true, maxBucket = Int.MaxValue).count()
    }
    assert(uncapped == 1000L * 999 / 2 + 1, s"uncapped = $uncapped")
    assert(noLogs.isEmpty, "disabled cap must log nothing")
  }

  test("capped plan culls candidates via a broadcast left-anti join") {
    val (sig, verified) = Dedup.simhashPairPlan(adversarial(300), "doc_id",
      "text", 3, cacheSignatures = false, maxBucket = 100)
    val p = verified.queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"), s"expected anti-join cull in:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop"),
      "hot-key list must broadcast, never shuffle the band rows again")
    assert(sig != null)
  }

  test("default cap does not fire at gate scale (sf0.01 documents)") {
    val docs = graft.Tables.load(spark, sf("sf0.01"), "documents")
    val (_, lshLogs) = withLogCapture {
      Dedup.lshNearDupPairs(docs, "doc_id", "text", 3, 4, 0.1).count()
    }
    val (_, shLogs) = withLogCapture {
      Dedup.simhashNearDupPairs(docs, "doc_id", "text", 3).count()
    }
    assert(lshLogs.isEmpty && shLogs.isEmpty,
      s"gate-scale corpora must not trip the default cap: $lshLogs $shLogs")
  }
}
