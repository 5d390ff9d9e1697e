package graft.dedup

import graft.SparkSpec
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** The perceptual AUDIO near-dup pair finder: planted near-dup groups
  * (gain shifts, container re-encodes, one-window perturbations — the
  * edits byte-equality cannot see) must pair, independent signals must
  * not, and undecodable rows vanish silently. Mirrors ImageDHashSpec
  * one medium over: both ride the same 8-band Hamming core. */
class AudioHashSpec extends SparkSpec {
  import spark.implicits._

  // three groups + a singleton + an undecodable row; every group
  // member differs BYTE-wise from its relatives
  private def media = Seq(
    1L -> Multimodal.synthStepWav(10L, 0),
    2L -> Multimodal.synthStepWav(10L, 1), // gain-half: Hamming 0
    3L -> Multimodal.synthStepWav(10L, 3), // one window poked: <= 2
    4L -> Multimodal.synthStepWav(20L, 0),
    5L -> Multimodal.synthStepAu(20L, 0),  // AU re-encode: Hamming 0
    6L -> Multimodal.synthStepWav(30L, 0), // singleton base
    7L -> Array[Byte](1, 2, 3)             // undecodable: no hash
  ).toDF("media_id", "payload")

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("audioNearDupPairs finds exactly the planted groups") {
    val pairs = Dedup.audioNearDupPairs(media, "media_id", "payload")
    assert(pairSet(pairs) == Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)))
    // gain / container variants are hash-identical, the poked one close
    val ham = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(ham((1L, 2L)) == 0L && ham((4L, 5L)) == 0L)
    assert(ham((1L, 3L)) <= 2L)
    pairs.unpersist()
  }

  test("similarJoin and similarClusters route AudioHash") {
    val viaJoin = SimilarJoin.similarJoin(media, "media_id", "payload",
      SimilarityMethod.AudioHash(maxHamming = 7))
    assert(pairSet(viaJoin) == Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)))
    assert(viaJoin.columns.toSeq == Seq("id_a", "id_b", "score"))
    viaJoin.unpersist()
    val clusters = SimilarJoin.similarClusters(media, "media_id", "payload",
      SimilarityMethod.AudioHash(maxHamming = 7))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L))
  }

  test("A-vs-B probe, inline and via the stored audioSignatures artifact") {
    val a = media.filter(col("media_id").isin(1L, 3L, 6L, 7L))
    val b = media.filter(col("media_id").isin(2L, 4L, 5L))
    val inline = Dedup.audioNearDupPairsAgainst(a, b, "media_id", "payload")
    assert(pairSet(inline) == Set((1L, 2L), (3L, 2L)))
    inline.unpersist()
    val dir = java.nio.file.Files.createTempDirectory("graft-asigs").toFile
    try {
      val path = new java.io.File(dir, "sigs").getAbsolutePath
      Dedup.audioSignatures(b, "media_id", "payload")
        .write.mode("overwrite").parquet(path)
      val loaded = spark.read.parquet(path)
      assert(loaded.columns.toSet == Set("id", "asig"))
      // corpus frame ignored when sigs are supplied: zero decodes on B
      val viaSigs = Dedup.audioNearDupPairsAgainst(a, b.limit(0),
        "media_id", "payload", corpusSigs = Some(loaded))
      assert(pairSet(viaSigs) == Set((1L, 2L), (3L, 2L)))
      viaSigs.unpersist()
      val viaMethod = SimilarJoin.similarJoinAgainst(a, b.limit(0),
        "media_id", "payload", SimilarityMethod.AudioHash(maxHamming = 7),
        corpusSigs = Some(loaded))
      assert(pairSet(viaMethod) == Set((1L, 2L), (3L, 2L)))
      viaMethod.unpersist()
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("cross-wired signature tables fail loudly (image vs audio both " +
      "directions)") {
    val images = Seq(1L -> Multimodal.synthGridImage(1L, 0))
      .toDF("media_id", "payload")
    val dhashTable = Dedup.dhashSignatures(images, "media_id", "payload")
    val e1 = intercept[IllegalArgumentException] {
      Dedup.audioNearDupPairsAgainst(media, media, "media_id", "payload",
        corpusSigs = Some(dhashTable))
    }
    assert(e1.getMessage.contains("asig") &&
      e1.getMessage.contains("IMAGE method"))
    val audioTable = Dedup.audioSignatures(media, "media_id", "payload")
    val e2 = intercept[IllegalArgumentException] {
      Dedup.imageNearDupPairsAgainst(images, images, "media_id", "payload",
        corpusSigs = Some(audioTable))
    }
    assert(e2.getMessage.contains("dhashSignatures"))
  }

  test("empty sides and all-undecodable corpora yield empty pair lists") {
    val none = media.limit(0)
    assert(Dedup.audioNearDupPairs(none, "media_id", "payload").count() == 0)
    val junk = Seq(8L -> Array[Byte](0, 1), 9L -> Array[Byte](2, 3))
      .toDF("media_id", "payload")
    assert(Dedup.audioNearDupPairs(junk, "media_id", "payload").count() == 0)
    assert(Dedup.audioNearDupPairsAgainst(media, junk,
      "media_id", "payload").count() == 0)
    assert(Dedup.audioNearDupPairsAgainst(none, media,
      "media_id", "payload").count() == 0)
  }
}
