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

  test("sampleFrames explodes video timeline only") {
    val rows = decodeMeta(fakeMedia.toDF("media_id", "payload"), "media_id", "payload")
    val frames = sampleFrames(rows, 1000L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // only media 3 (video, 2500ms) → frames at 0, 1000, 2000
    assert(frames.toSet == Set((3L, 0L, 0L), (3L, 1L, 1000L), (3L, 2L, 2000L)))
  }
}
