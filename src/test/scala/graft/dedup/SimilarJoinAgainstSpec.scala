package graft.dedup

import graft.{SparkSpec, Tables}
import graft.dedup.SimilarityMethod._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The round-7 A-vs-B (incremental) join contract, promised as the
  * round-7 "done" criterion and paid here: for every method,
  * `similarJoinAgainst(A, B)` equals the CROSS-SIDE subset of the
  * self-join `similarJoin(A ∪ B)` — the incremental form finds exactly
  * the new×corpus pairs the batch form would, never more, never fewer.
  * Covers the two paths no gate exercises (SimHash A-vs-B,
  * caller-blocked embedding A-vs-B) plus the empty-side edges fixed
  * data never visits. */
class SimilarJoinAgainstSpec extends SparkSpec with HotBucketLogCapture {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf(), "documents")
  private lazy val emb = Tables.load(spark, sf(), "embeddings")

  private def partsOf(df: DataFrame, idCol: String): (DataFrame, DataFrame) =
    (df.filter(col(idCol) % 5 === 0), df.filter(col(idCol) % 5 =!= 0))

  /** Collect (id_a, id_b, score) rows into a canonical set. */
  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  /** The self-join's cross-side pairs, re-oriented to (A-side, B-side):
    * the self-join canonicalizes id_a < id_b, the A-vs-B form keeps
    * id_a ∈ A — normalize before comparing. */
  private def crossSubset(selfPairs: DataFrame,
                          inA: Long => Boolean): Set[(Long, Long, Double)] =
    selfPairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .collect {
        case (x, y, s) if inA(x) && !inA(y) => (x, y, s)
        case (x, y, s) if !inA(x) && inA(y) => (y, x, s)
      }.toSet

  test("MinHashLsh: against(A, B) equals the cross-side subset of similarJoin(A ∪ B)") {
    val (a, b) = partsOf(docs, "doc_id")
    val against = pairSet(SimilarJoin.similarJoinAgainst(
      a, b, "doc_id", "text", MinHashLsh(minJaccard = 0.1)))
    val self = crossSubset(
      SimilarJoin.similarJoin(docs, "doc_id", "text", MinHashLsh(minJaccard = 0.1)),
      _ % 5 == 0)
    assert(against == self)
    assert(against.nonEmpty, "the equivalence must be exercised on real pairs")
  }

  test("SimHash: against(A, B) equals the cross-side subset of similarJoin(A ∪ B)") {
    val (a, b) = partsOf(docs, "doc_id")
    val against = pairSet(SimilarJoin.similarJoinAgainst(
      a, b, "doc_id", "text", SimHash(maxHamming = 3)))
    val self = crossSubset(
      SimilarJoin.similarJoin(docs, "doc_id", "text", SimHash(maxHamming = 3)),
      _ % 5 == 0)
    assert(against == self)
    assert(against.nonEmpty)
  }

  test("EmbeddingCosine (auto-blocked): against(A, B) equals the cross-side subset") {
    val (a, b) = partsOf(emb, "vec_id")
    // corpus-side training (against) vs union training (self): both are
    // EXACT by the triangle-inequality bound, so the subsets agree at
    // any centroid quality — this is the strongest available check that
    // the directed A-vs-B bound misses nothing the undirected one finds
    val against = pairSet(SimilarJoin.similarJoinAgainst(
      a, b, "vec_id", "embedding", EmbeddingCosine(0.25, numCells = 8)))
    val self = crossSubset(
      SimilarJoin.similarJoin(emb, "vec_id", "embedding",
        EmbeddingCosine(0.25, numCells = 8)),
      _ % 5 == 0)
    assert(against == self)
    assert(against.nonEmpty)
  }

  test("EmbeddingCosine (caller-blocked): against equals the cross-side brute force") {
    val (a, b) = partsOf(emb, "vec_id")
    val against = pairSet(SimilarJoin.similarJoinAgainst(
      a, b, "vec_id", "embedding", EmbeddingCosine("label", 0.2)))
    // brute-force oracle: same-label cross pairs above the threshold
    val expect = pairSet(
      a.select(col("label").as("blk"), col("vec_id").as("id_a"),
          col("embedding").as("v_a"))
        .join(b.select(col("label").as("blk"), col("vec_id").as("id_b"),
          col("embedding").as("v_b")), Seq("blk"))
        .select(col("id_a"), col("id_b"),
          round(graft.sim.Similarity.dot(col("v_a"), col("v_b"))
            / (graft.sim.Similarity.norm(col("v_a"))
               * graft.sim.Similarity.norm(col("v_b"))), 6).as("score"))
        .filter(col("score") >= 0.2))
    assert(against == expect)
    assert(against.nonEmpty)
  }

  test("auto-K (numCells = 0) A-vs-B equals the pinned-K result") {
    val (a, b) = partsOf(emb, "vec_id")
    // K only steers pruning cost on the exact join — auto-derived K and
    // pinned K must produce the same pair set
    val auto = pairSet(SimilarJoin.similarJoinAgainst(
      a, b, "vec_id", "embedding", EmbeddingCosine(0.25)))
    val pinned = pairSet(SimilarJoin.similarJoinAgainst(
      a, b, "vec_id", "embedding", EmbeddingCosine(0.25, numCells = 8)))
    assert(auto == pinned)
    assert(auto.nonEmpty)
  }

  test("empty NEW side yields an empty pair list for every method") {
    val emptyDocs = docs.limit(0)
    val emptyEmb = emb.limit(0)
    for (m <- Seq(MinHashLsh(minJaccard = 0.1), SimHash(3)))
      assert(SimilarJoin.similarJoinAgainst(
        emptyDocs, docs, "doc_id", "text", m).count() == 0)
    assert(SimilarJoin.similarJoinAgainst(
      emptyEmb, emb, "vec_id", "embedding",
      EmbeddingCosine(0.25, numCells = 4)).count() == 0)
  }

  test("empty CORPUS side yields an empty pair list for every method") {
    val emptyDocs = docs.limit(0)
    val emptyEmb = emb.limit(0)
    for (m <- Seq(MinHashLsh(minJaccard = 0.1), SimHash(3)))
      assert(SimilarJoin.similarJoinAgainst(
        docs, emptyDocs, "doc_id", "text", m).count() == 0)
    // the embedding path trains cells on the corpus side: an empty
    // corpus means no centroids — must short-circuit, not throw
    assert(SimilarJoin.similarJoinAgainst(
      emb, emptyEmb, "vec_id", "embedding",
      EmbeddingCosine(0.25)).count() == 0)
  }

  test("precomputed corpus signatures (parquet round trip) equal the inline path") {
    val (a, b) = partsOf(docs, "doc_id")
    val inline = pairSet(Dedup.lshNearDupPairsAgainst(
      a, b, "doc_id", "text", nGram = 3, bands = 4, minJaccard = 0.1))
    val dir = java.nio.file.Files.createTempDirectory("graft-lshsigs").toFile
    try {
      // the train-once shape: build the corpus signature table, store
      // it as parquet, hand the LOADED frame to the incremental join —
      // the corpus text is never re-shingled
      val path = new java.io.File(dir, "sigs").getAbsolutePath
      Dedup.lshSignatures(b, "doc_id", "text", nGram = 3, bands = 4)
        .write.mode("overwrite").parquet(path)
      val loaded = spark.read.parquet(path)
      val viaSigs = pairSet(Dedup.lshNearDupPairsAgainst(
        a, b.limit(0) /* corpus frame ignored when sigs are supplied */,
        "doc_id", "text", nGram = 3, bands = 4, minJaccard = 0.1,
        corpusSigs = Some(loaded)))
      assert(viaSigs == inline)
      assert(viaSigs.nonEmpty)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("precomputed SimHash corpus signatures equal the inline path") {
    val (a, b) = partsOf(docs, "doc_id")
    val inline = pairSet(SimilarJoin.similarJoinAgainst(
      a, b, "doc_id", "text", SimHash(maxHamming = 3)))
    val sigs = Dedup.simhashSignatures(b, "doc_id", "text")
    val viaSigs = pairSet(SimilarJoin.similarJoinAgainst(
      a, b.limit(0), "doc_id", "text", SimHash(maxHamming = 3),
      corpusSigs = Some(sigs)))
    assert(viaSigs == inline)
    assert(viaSigs.nonEmpty)
    // cross-wiring the LSH table into the SimHash path fails loudly
    val lshTable = Dedup.lshSignatures(b, "doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      SimilarJoin.similarJoinAgainst(a, b, "doc_id", "text",
        SimHash(maxHamming = 3), corpusSigs = Some(lshTable))
    }
    assert(e.getMessage.contains("simhashSignatures"))
  }

  test("a mismatched or malformed corpus signature table is rejected loudly") {
    val (a, b) = partsOf(docs, "doc_id")
    // band-count mismatch: built with 2, call expects 4
    val twoBands = Dedup.lshSignatures(b, "doc_id", "text", nGram = 3, bands = 2)
    val e1 = intercept[IllegalArgumentException] {
      Dedup.lshNearDupPairsAgainst(a, b, "doc_id", "text", bands = 4,
        corpusSigs = Some(twoBands))
    }
    assert(e1.getMessage.contains("band count differs from the expected 4"))
    // a UNION of builds with different band counts (the append
    // maintenance move gone wrong) must also fail — the validation
    // checks every row's band count, not one arbitrary probe row
    val good = Dedup.lshSignatures(b, "doc_id", "text", bands = 4)
    val mixed = good.unionByName(twoBands)
    val e3 = intercept[IllegalArgumentException] {
      Dedup.lshNearDupPairsAgainst(a, b, "doc_id", "text", bands = 4,
        corpusSigs = Some(mixed))
    }
    assert(e3.getMessage.contains("band count differs from the expected 4"))
    // nGram mismatch: hashes are indistinguishable by value, so only
    // the stamped ngram column can catch it — built with 2, call
    // expects the default 3
    val twoGram = Dedup.lshSignatures(b, "doc_id", "text", nGram = 2, bands = 4)
    val e4 = intercept[IllegalArgumentException] {
      Dedup.lshNearDupPairsAgainst(a, b, "doc_id", "text", bands = 4,
        corpusSigs = Some(twoGram))
    }
    assert(e4.getMessage.contains("nGram other than the expected 3"))
    // an appended row with NULL bands passes any min/max-shaped check
    // yet contributes zero candidates — must fail, not silently miss
    val nullRow = good.limit(1).select(col("id"), col("sh"),
      lit(null).cast(good.schema("bands").dataType).as("bands"), col("ngram"))
    val e5 = intercept[IllegalArgumentException] {
      Dedup.lshNearDupPairsAgainst(a, b, "doc_id", "text", bands = 4,
        corpusSigs = Some(good.unionByName(nullRow)))
    }
    assert(e5.getMessage.contains("band count differs from the expected 4"))
    // wrong schema entirely
    val e2 = intercept[IllegalArgumentException] {
      Dedup.lshNearDupPairsAgainst(a, b, "doc_id", "text",
        corpusSigs = Some(b))
    }
    assert(e2.getMessage.contains("lshSignatures"))
  }

  test("per-SIDE hot-bucket caps fire independently and loudly") {
    // one shared label block, corpus side bigger than the cap: the
    // corpus-side cull fires, the new side's doesn't — pairs touching
    // the culled block are gone
    val a = emb.limit(5).withColumn("label", lit(0))
    val b = emb.limit(50).withColumn("label", lit(0))
    val (n, logged) = withLogCapture {
      SimilarJoin.similarJoinAgainst(a, b, "vec_id", "embedding",
        EmbeddingCosine("label", -1.0), maxBucket = 10).count()
    }
    assert(n == 0)
    assert(logged.exists(_.contains("corpus")),
      s"the corpus-side cull must log its side tag: $logged")
    assert(!logged.exists(_.contains("(EmbeddingCosine/new)")),
      s"the 5-row new side must NOT be culled: $logged")
  }
}
