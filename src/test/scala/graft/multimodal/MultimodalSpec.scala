package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import Multimodal._
  import spark.implicits._

  private def fakeMedia: Seq[(Long, Array[Byte])] = Seq(
    1L -> StubCodec.encodeFake(1, 1920, 1080, 0L, Array[Byte](1, 2, 3)),
    2L -> StubCodec.encodeFake(2, 0, 0, 180000L, Array[Byte](9)),
    3L -> StubCodec.encodeFake(3, 1280, 720, 2500L, Array[Byte](7, 7)))

  test("decode → features pipeline over binary column") {
    val df = fakeMedia.toDF("media_id", "payload")
    val feats = extractFeatures(decodeMeta(df, "media_id", "payload"))
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).kind == "image")
    assert(feats(1L).width == 1920 && feats(1L).height == 1080)
    assert(math.abs(feats(1L).aspect - 16.0 / 9) < 1e-9)
    assert(feats(2L).kind == "audio")
    assert(feats(3L).kind == "video")
    assert(feats(3L).n_bytes == 19L) // 17-byte header + 2 body bytes
  }

  test("resize caps the longer dimension, no-ops small media") {
    val rows = decodeMeta(fakeMedia.toDF("media_id", "payload"), "media_id", "payload")
    val resized = resize(rows, 960).collect().map(r => r.media_id -> r.meta).toMap
    assert(resized(1L).width == 960 && resized(1L).height == 540)
    assert(resized(3L).width == 960 && resized(3L).height == 540)
    assert(resized(2L).width == 0) // audio untouched
  }

  private def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff8040) // deterministic non-zero pixel
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"JDK must encode $fmt")
    out.toByteArray
  }

  test("ImageIoCodec decodes REAL image bytes for all four JDK formats") {
    // real encoded images, produced by the JDK itself — the decode side
    // must recover dimensions header-only through the same decodeMeta
    // entry point the pipeline uses
    val media = Seq(
      10L -> imageBytes("png", 321, 17),
      11L -> imageBytes("jpeg", 64, 48),
      12L -> imageBytes("gif", 33, 9),
      13L -> imageBytes("bmp", 5, 80))
    val metas = decodeMeta(media.toDF("media_id", "payload"), "media_id", "payload")
      .collect().map(r => r.media_id -> r.meta).toMap
    assert(metas(10L) == MediaMeta("image", 321, 17, 0L, "png"))
    assert(metas(11L) == MediaMeta("image", 64, 48, 0L, "jpeg"))
    assert(metas(12L) == MediaMeta("image", 33, 9, 0L, "gif"))
    assert(metas(13L) == MediaMeta("image", 5, 80, 0L, "bmp"))
  }

  test("magic-byte dispatch: real and fake payloads coexist in one partition") {
    val mixed = (fakeMedia ++ Seq(20L -> imageBytes("png", 200, 100)))
      .toDF("media_id", "payload").repartition(1)
    val metas = decodeMeta(mixed, "media_id", "payload")
      .collect().map(r => r.media_id -> r.meta).toMap
    // fake-header rows keep StubCodec semantics bit-for-bit (q53's gate)
    assert(metas(1L) == MediaMeta("image", 1920, 1080, 0L, "fake"))
    assert(metas(2L) == MediaMeta("audio", 0, 0, 180000L, "fake"))
    // the real PNG in the same partition decodes through ImageIO
    assert(metas(20L) == MediaMeta("image", 200, 100, 0L, "png"))
  }

  test("corrupt bytes behind a valid image magic degrade to unknown, not a task failure") {
    // PNG magic + garbage where the IHDR should be — the crawl-scale
    // poison payload; decode must degrade per-row, never kill the job
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10,
      0x42, 0x42, 0x42, 0x42)
    val truncated = imageBytes("png", 64, 64).take(16)
    val metas = decodeMeta(
      Seq(40L -> corrupt, 41L -> truncated, 42L -> imageBytes("png", 8, 8))
        .toDF("media_id", "payload").repartition(1),
      "media_id", "payload")
      .collect().map(r => r.media_id -> r.meta).toMap
    assert(metas(40L).kind == "unknown" && metas(40L).codec == "png")
    assert(metas(41L).kind == "unknown")
    assert(metas(42L) == MediaMeta("image", 8, 8, 0L, "png")) // healthy row unaffected
  }

  test("real images flow through the downstream feature/resize steps") {
    val rows = decodeMeta(
      Seq(30L -> imageBytes("png", 1920, 1080)).toDF("media_id", "payload"),
      "media_id", "payload")
    val f = extractFeatures(rows).collect().head
    assert(f.kind == "image" && f.width == 1920 && f.height == 1080)
    assert(math.abs(f.aspect - 16.0 / 9) < 1e-9)
    val resized = resize(rows, 960).collect().head.meta
    assert(resized.width == 960 && resized.height == 540)
  }

  test("sampleFrames explodes video timeline only") {
    val rows = decodeMeta(fakeMedia.toDF("media_id", "payload"), "media_id", "payload")
    val frames = sampleFrames(rows, 1000L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // only media 3 (video, 2500ms) → frames at 0, 1000, 2000
    assert(frames.toSet == Set((3L, 0L, 0L), (3L, 1L, 1000L), (3L, 2L, 2000L)))
  }
}
