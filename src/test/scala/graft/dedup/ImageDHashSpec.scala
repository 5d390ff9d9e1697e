package graft.dedup

import graft.SparkSpec
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** The perceptual image near-dup pair finder: planted near-dup groups
  * (brightness shifts, one-cell perturbations — edits byte-equality
  * cannot see) must pair, independent patterns must not, and the
  * undecodable row must vanish silently. Mirrors the SimHash spec
  * shapes one level up the abstraction: both ride the same 8/4-band
  * Hamming core. */
class ImageDHashSpec extends SparkSpec {
  import spark.implicits._

  // three groups + a singleton + an undecodable row; every group
  // member differs BYTE-wise from its relatives
  private def media = Seq(
    1L -> Multimodal.synthGridImage(10L, 0),
    2L -> Multimodal.synthGridImage(10L, 1), // +15 brightness: Hamming 0
    3L -> Multimodal.synthGridImage(10L, 3), // one cell perturbed: <= 2
    4L -> Multimodal.synthGridImage(20L, 0),
    5L -> Multimodal.synthGridImage(20L, 2), // +40 brightness: Hamming 0
    6L -> Multimodal.synthGridImage(30L, 0), // singleton base
    7L -> Array[Byte](1, 2, 3)               // undecodable: no hash
  ).toDF("media_id", "payload")

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("imageNearDupPairs finds exactly the planted groups") {
    val pairs = Dedup.imageNearDupPairs(media, "media_id", "payload")
    assert(pairSet(pairs) == Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)))
    // brightness variants are hash-identical, the perturbed one close
    val ham = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(ham((1L, 2L)) == 0L && ham((4L, 5L)) == 0L)
    assert(ham((1L, 3L)) <= 2L)
    pairs.unpersist()
  }

  test("similarJoin and similarClusters route ImageDHash") {
    val viaJoin = SimilarJoin.similarJoin(media, "media_id", "payload",
      SimilarityMethod.ImageDHash(maxHamming = 7))
    assert(pairSet(viaJoin) == Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)))
    assert(viaJoin.columns.toSeq == Seq("id_a", "id_b", "score"))
    viaJoin.unpersist()
    val clusters = SimilarJoin.similarClusters(media, "media_id", "payload",
      SimilarityMethod.ImageDHash(maxHamming = 7))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // pair-connected rows only (dupClusters' contract): both groups
    // collapse to their min id
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L))
  }

  test("A-vs-B probe, inline and via the stored dhashSignatures artifact") {
    val a = media.filter(col("media_id").isin(1L, 3L, 6L, 7L))
    val b = media.filter(col("media_id").isin(2L, 4L, 5L))
    val inline = Dedup.imageNearDupPairsAgainst(a, b, "media_id", "payload")
    // id_a from the new side, id_b from the corpus; no < canonicalization
    assert(pairSet(inline) == Set((1L, 2L), (3L, 2L)))
    inline.unpersist()
    val dir = java.nio.file.Files.createTempDirectory("graft-dhashsigs").toFile
    try {
      val path = new java.io.File(dir, "sigs").getAbsolutePath
      Dedup.dhashSignatures(b, "media_id", "payload")
        .write.mode("overwrite").parquet(path)
      val loaded = spark.read.parquet(path)
      assert(loaded.columns.toSet == Set("id", "dsig"))
      // corpus frame ignored when sigs are supplied: zero decodes on B
      val viaSigs = Dedup.imageNearDupPairsAgainst(a, b.limit(0),
        "media_id", "payload", corpusSigs = Some(loaded))
      assert(pairSet(viaSigs) == Set((1L, 2L), (3L, 2L)))
      viaSigs.unpersist()
      // ...and the same through the unified front door
      val viaMethod = SimilarJoin.similarJoinAgainst(a, b.limit(0),
        "media_id", "payload", SimilarityMethod.ImageDHash(maxHamming = 7),
        corpusSigs = Some(loaded))
      assert(pairSet(viaMethod) == Set((1L, 2L), (3L, 2L)))
      viaMethod.unpersist()
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("cross-wired signature tables fail loudly in both directions") {
    val docs = Seq(1L -> "some words here", 2L -> "other words there")
      .toDF("doc_id", "text")
    // a text SimHash table into the image path
    val simhashTable = Dedup.simhashSignatures(docs, "doc_id", "text")
    val e1 = intercept[IllegalArgumentException] {
      Dedup.imageNearDupPairsAgainst(media, media, "media_id", "payload",
        corpusSigs = Some(simhashTable))
    }
    assert(e1.getMessage.contains("dsig") &&
      e1.getMessage.contains("TEXT method"))
    // an image table into the text SimHash path
    val dhashTable = Dedup.dhashSignatures(media, "media_id", "payload")
    val e2 = intercept[IllegalArgumentException] {
      Dedup.simhashNearDupPairsAgainst(docs, docs, "doc_id", "text",
        corpusSigs = Some(dhashTable))
    }
    assert(e2.getMessage.contains("simhashSignatures"))
  }

  test("empty sides and all-undecodable corpora yield empty pair lists") {
    val none = media.limit(0)
    assert(Dedup.imageNearDupPairs(none, "media_id", "payload").count() == 0)
    val junk = Seq(8L -> Array[Byte](0, 1), 9L -> Array[Byte](2, 3))
      .toDF("media_id", "payload")
    assert(Dedup.imageNearDupPairs(junk, "media_id", "payload").count() == 0)
    assert(Dedup.imageNearDupPairsAgainst(media, junk,
      "media_id", "payload").count() == 0)
    assert(Dedup.imageNearDupPairsAgainst(none, media,
      "media_id", "payload").count() == 0)
  }
}
