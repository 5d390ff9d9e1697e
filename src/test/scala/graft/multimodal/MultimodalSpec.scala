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

  private def audioBytes(tpe: javax.sound.sampled.AudioFileFormat.Type,
                         sampleRate: Float, channels: Int,
                         frames: Int): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(sampleRate, 16, channels, true, false)
    val pcm = new Array[Byte](frames * fmt.getFrameSize) // silence
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, tpe, out)
    out.toByteArray
  }

  test("AudioCodec decodes REAL JDK-encoded WAV/AIFF/AU headers") {
    import javax.sound.sampled.AudioFileFormat.Type
    // 8000 frames @8kHz = exactly 1000ms; 4410 @44.1kHz stereo = 100ms
    val media = Seq(
      50L -> audioBytes(Type.WAVE, 8000f, 1, 8000),
      51L -> audioBytes(Type.AIFF, 44100f, 2, 4410),
      52L -> audioBytes(Type.AU, 16000f, 1, 4000))
    val metas = decodeMeta(media.toDF("media_id", "payload"), "media_id", "payload")
      .collect().map(r => r.media_id -> r.meta).toMap
    assert(metas(50L) == MediaMeta("audio", 0, 0, 1000L, "wav/8000Hz/1ch"))
    assert(metas(51L) == MediaMeta("audio", 0, 0, 100L, "aiff/44100Hz/2ch"))
    assert(metas(52L) == MediaMeta("audio", 0, 0, 250L, "au/16000Hz/1ch"))
  }

  test("corrupt bytes behind a valid audio magic degrade to unknown") {
    // RIFF....WAVE magic with garbage where the fmt chunk should be
    val corrupt = "RIFF\u0000\u0000\u0000\u0000WAVExxxx".getBytes("ISO-8859-1")
    val truncated = audioBytes(
      javax.sound.sampled.AudioFileFormat.Type.WAVE, 8000f, 1, 8000).take(20)
    val healthy = audioBytes(
      javax.sound.sampled.AudioFileFormat.Type.WAVE, 8000f, 1, 800)
    val metas = decodeMeta(
      Seq(60L -> corrupt, 61L -> truncated, 62L -> healthy)
        .toDF("media_id", "payload").repartition(1),
      "media_id", "payload")
      .collect().map(r => r.media_id -> r.meta).toMap
    assert(metas(60L).kind == "unknown" && metas(60L).codec == "wav")
    assert(metas(61L).kind == "unknown")
    assert(metas(62L) == MediaMeta("audio", 0, 0, 100L, "wav/8000Hz/1ch"))
  }

  test("audio dispatch coexists with fake payloads (q53 semantics intact)") {
    val mixed = (fakeMedia ++ Seq(
        70L -> audioBytes(javax.sound.sampled.AudioFileFormat.Type.WAVE,
          8000f, 1, 1600)))
      .toDF("media_id", "payload").repartition(1)
    val metas = decodeMeta(mixed, "media_id", "payload")
      .collect().map(r => r.media_id -> r.meta).toMap
    assert(metas(2L) == MediaMeta("audio", 0, 0, 180000L, "fake"))
    assert(metas(70L) == MediaMeta("audio", 0, 0, 200L, "wav/8000Hz/1ch"))
  }

  test("resize REALLY re-encodes image pixels, not just metadata") {
    val media = Seq(
      80L -> imageBytes("png", 200, 100),
      81L -> imageBytes("jpeg", 64, 256),
      82L -> imageBytes("png", 10, 10)) // already under maxDim
    val rows = decodeMeta(media.toDF("media_id", "payload"), "media_id", "payload")
    val resized = resize(rows, 50).collect().map(r => r.media_id -> r).toMap
    // the RESIZED PAYLOAD decodes to the new dimensions — proof the
    // pixels were re-encoded, not merely the metadata rewritten
    assert(resized(80L).meta == MediaMeta("image", 50, 25, 0L, "png"))
    assert(ImageIoCodec.decode(resized(80L).payload, "png") ==
      MediaMeta("image", 50, 25, 0L, "png"))
    assert(resized(81L).meta == MediaMeta("image", 12, 50, 0L, "jpeg"))
    assert(ImageIoCodec.decode(resized(81L).payload, "jpeg") ==
      MediaMeta("image", 12, 50, 0L, "jpeg"))
    // under maxDim: original bytes kept verbatim (no lossy re-encode)
    assert(resized(82L).payload.sameElements(media(2)._2))
  }

  test("resize passes poison image bytes through unchanged") {
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10,
      0x42, 0x42, 0x42, 0x42)
    val rows = decodeMeta(
      Seq(90L -> corrupt).toDF("media_id", "payload"), "media_id", "payload")
    val out = resize(rows, 50).collect().head
    assert(out.payload.sameElements(corrupt))
    assert(out.meta.kind == "unknown")
  }

  test("sampleFrames explodes video timeline only") {
    val rows = decodeMeta(fakeMedia.toDF("media_id", "payload"), "media_id", "payload")
    val frames = sampleFrames(rows, 1000L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // only media 3 (video, 2500ms) → frames at 0, 1000, 2000
    assert(frames.toSet == Set((3L, 0L, 0L), (3L, 1L, 1000L), (3L, 2L, 2000L)))
  }

  // ------------------------------------------------------------ dHash

  /** The analytic dHash of a synthetic grid image, computed straight
    * from the md5 cell formula with NO image in sight — an independent
    * reimplementation (not a call into the main-code helpers), so a
    * drift in either the synth layout or the decode/grayscale/
    * block-mean path breaks the equality test below. */
  private def analyticDHash(base: Long, variant: Int): Long = {
    def md5(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    def gray(h: String): Int = 40 + ((h(0) * 131 + h(1) * 17 + h(2)) % 151)
    val g = Array.tabulate(8, 9) { (cy, cx) =>
      val v =
        if (variant == 3 && cx == 3 && cy == 3) gray(md5(s"${base}_p"))
        else gray(md5(s"${base}_${cx}_${cy}"))
      v + (variant match { case 1 => 15; case 2 => 40; case _ => 0 })
    }
    (for (cy <- 0 until 8; cx <- 0 until 8 if g(cy)(cx) < g(cy)(cx + 1))
      yield 1L << (cy * 8 + cx)).foldLeft(0L)(_ | _)
  }

  test("dHash64 of the synthetic grid equals the analytic formula (the q74 contract)") {
    // decode → integer luminance → exact block mean → comparisons must
    // recover the md5 cell values bit for bit; this equality is exactly
    // what lets q74's DuckDB oracle verify an image operator without
    // decoding images
    for (base <- Seq(0L, 7L, 42L, 1234L); v <- 0 to 3) {
      val h = dHash64(synthGridImage(base, v))
      assert(h.contains(analyticDHash(base, v)), s"base=$base variant=$v")
    }
    // pinned literal: catches a drift that changes BOTH sides in sync
    // (e.g. editing the shared formula) — the gate hash would move too
    assert(dHash64(synthGridImage(42L, 0)).contains(-9032609337118674107L))
  }

  test("dHash survives edits that break byte equality") {
    val v0 = synthGridImage(99L, 0)
    // uniform brightness shifts: different bytes, IDENTICAL hash (any
    // strictly monotone pixel transform preserves every comparison)
    val v1 = synthGridImage(99L, 1)
    assert(!v0.sameElements(v1))
    assert(dHash64(v0) == dHash64(v1))
    // one perturbed interior cell: at most the two comparisons that
    // touch cell (3,3) flip
    val v3 = synthGridImage(99L, 3)
    val d03 = java.lang.Long.bitCount(
      dHash64(v0).get ^ dHash64(v3).get)
    assert(d03 <= 2, s"perturbation moved $d03 bits")
    // JPEG re-encode: lossy pixels, near-identical hash. High-contrast
    // checkerboard so DCT noise (a few gray levels) cannot cross any
    // adjacent-cell gap.
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      checkerboard()))
    val jout = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpeg", jout))
    val dj = java.lang.Long.bitCount(
      dHash64(checkerboard()).get ^ dHash64(jout.toByteArray).get)
    assert(dj <= 7, s"JPEG re-encode moved $dj bits")
    // halving resize through the REAL resize path (72×64 → 36×32,
    // block-aligned): hash stays within the near-dup threshold
    val resized = resize(decodeMeta(
        Seq(1L -> checkerboard()).toDF("media_id", "payload"),
        "media_id", "payload"), 36)
      .collect().head.payload
    val dr = java.lang.Long.bitCount(
      dHash64(checkerboard()).get ^ dHash64(resized).get)
    assert(dr <= 7, s"halving resize moved $dr bits")
  }

  private def checkerboard(): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(72, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 72) {
      val g = if (((x / 8) + (y / 8)) % 2 == 0) 60 else 190
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("dHash is None for undecodable, sub-grid, and null payloads") {
    assert(dHash64(null) == None)
    assert(dHash64(Array[Byte](1, 2, 3)) == None)
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10,
      0x42, 0x42, 0x42, 0x42)
    assert(dHash64(corrupt) == None)
    assert(dHash64(imageBytes("png", 8, 8)) == None)  // < 9 wide
    assert(dHash64(imageBytes("png", 9, 8)).isDefined) // minimum grid
  }

  test("withDHash: null sigs for non-images, hash column for real ones") {
    val df = Seq(
      1L -> synthGridImage(5L, 0),
      2L -> Array[Byte](9, 9, 9),
      3L -> synthGridImage(5L, 1)).toDF("media_id", "payload")
    val got = withDHash(df, "media_id", "payload").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got(2L) == None)
    assert(got(1L).isDefined && got(1L) == got(3L)) // brightness-invariant
  }

  // --------------------------------------------- audio perceptual hash

  /** The analytic twin of [[Multimodal.aHash64]] over the synthetic
    * step signal — amplitude comparisons only, exactly what the audio
    * gate's SQL oracle computes. */
  private def analyticAHash(base: Long, variant: Int): Long = {
    def md5(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    def amp(h: String): Int = 1000 + ((h(0) * 131 + h(1) * 17 + h(2)) % 151) * 200
    val a = Array.tabulate(65) { w =>
      val v =
        if (variant == 3 && w == 33) amp(md5(s"${base}_p"))
        else amp(md5(s"${base}_$w"))
      if (variant == 1) v / 2 else v
    }
    (for (w <- 0 until 64 if a(w) < a(w + 1)) yield 1L << w)
      .foldLeft(0L)(_ | _)
  }

  test("aHash64 of the synthetic step signal equals the analytic " +
      "formula, in BOTH containers (the audio-gate contract)") {
    for (base <- Seq(0L, 7L, 42L, 1234L); v <- 0 to 3) {
      assert(aHash64(synthStepWav(base, v))
        .contains(analyticAHash(base, v)), s"wav base=$base variant=$v")
      assert(aHash64(synthStepAu(base, v))
        .contains(analyticAHash(base, v)), s"au base=$base variant=$v")
    }
    // pinned literal: catches a drift that moves both sides in sync
    assert(aHash64(synthStepWav(42L, 0)).contains(analyticAHash(42L, 0)))
  }

  test("aHash survives edits that break byte equality") {
    val v0 = synthStepWav(99L, 0)
    // uniform gain shift: different bytes, IDENTICAL hash
    val v1 = synthStepWav(99L, 1)
    assert(!v0.sameElements(v1))
    assert(aHash64(v0) == aHash64(v1))
    // AU container re-encode: different bytes, identical hash
    val au = synthStepAu(99L, 0)
    assert(!v0.sameElements(au))
    assert(aHash64(v0) == aHash64(au))
    // JDK AudioSystem AIFF re-encode of the same PCM: identical hash
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(v0))
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.AIFF, out)
    assert(aHash64(out.toByteArray) == aHash64(v0))
    // one poked window: at most the two touched comparisons flip
    val v3 = synthStepWav(99L, 3)
    val d = java.lang.Long.bitCount(aHash64(v0).get ^ aHash64(v3).get)
    assert(d <= 2, s"poke moved $d bits")
    // independent bases are far apart
    val other = java.lang.Long.bitCount(
      aHash64(v0).get ^ aHash64(synthStepWav(100L, 0)).get)
    assert(other > 7, s"independent bases only $other bits apart")
  }

  /** The step signal's amplitudes at other widths/encodings. Every
    * amplitude is a multiple of 1/2^15, so the 24/32-bit int and IEEE
    * float renditions are EXACT requantizations of the 16-bit master
    * — hash-identical by the normalization contract. */
  private def stepAmps(base: Long, variant: Int): Array[Int] = {
    def md5(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    def amp(h: String): Int = 1000 + ((h(0) * 131 + h(1) * 17 + h(2)) % 151) * 200
    Array.tabulate(65) { w =>
      val v =
        if (variant == 3 && w == 33) amp(md5(s"${base}_p"))
        else amp(md5(s"${base}_$w"))
      if (variant == 1) v / 2 else v
    }
  }

  private def wavOf(base: Long, variant: Int, bits: Int, fmtCode: Int,
                    put: (java.nio.ByteBuffer, Int) => Unit): Array[Byte] = {
    val amps = stepAmps(base, variant)
    val bps = bits / 8
    val dataLen = 65 * 160 * bps
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(fmtCode.toShort).putShort(1)
      .putInt(8000).putInt(8000 * bps)
      .putShort(bps.toShort).putShort(bits.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    amps.foreach(a => (0 until 160).foreach(_ => put(bb, a)))
    bb.array()
  }

  test("aHash PCM breadth: 24/32-bit int, 32/64-bit float WAV and " +
      "24-bit big-endian AU all hash identically to the 16-bit master") {
    for (base <- Seq(3L, 77L); v <- Seq(0, 3)) {
      val ref = aHash64(synthStepWav(base, v))
      assert(ref.isDefined)
      val w24 = wavOf(base, v, 24, 1, (bb, a) => {
        val s = a << 8 // exact ×256: same normalized amplitude
        bb.put((s & 0xff).toByte).put(((s >> 8) & 0xff).toByte)
          .put(((s >> 16) & 0xff).toByte); ()
      })
      assert(aHash64(w24) == ref, "24-bit wav")
      val w32 = wavOf(base, v, 32, 1, (bb, a) => { bb.putInt(a << 16); () })
      assert(aHash64(w32) == ref, "32-bit int wav")
      val f32 = wavOf(base, v, 32, 3,
        (bb, a) => { bb.putFloat(a / 32768.0f); () })
      assert(aHash64(f32) == ref, "float32 wav")
      val f64 = wavOf(base, v, 64, 3,
        (bb, a) => { bb.putDouble(a / 32768.0); () })
      assert(aHash64(f64) == ref, "float64 wav")
      // AU, big-endian 24-bit linear (encoding 4)
      val amps = stepAmps(base, v)
      val au = java.nio.ByteBuffer.allocate(24 + 65 * 160 * 3)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      au.put(".snd".getBytes("US-ASCII")).putInt(24)
        .putInt(65 * 160 * 3).putInt(4).putInt(8000).putInt(1)
      amps.foreach { a =>
        val s = a << 8
        (0 until 160).foreach { _ =>
          au.put(((s >> 16) & 0xff).toByte).put(((s >> 8) & 0xff).toByte)
            .put((s & 0xff).toByte); ()
        }
      }
      assert(aHash64(au.array()) == ref, "24-bit au")
    }
  }

  test("aHash is None for undecodable, too-short, and null payloads") {
    assert(aHash64(null) == None)
    assert(aHash64(Array[Byte](1, 2, 3)) == None)
    // valid RIFF magic, garbage body
    val corrupt = ("RIFF" + " " * 4 + "WAVE" + " " * 8)
      .getBytes("ISO-8859-1")
    assert(aHash64(corrupt) == None)
    // a real WAV with fewer than 65 frames
    val tiny = {
      val bb = java.nio.ByteBuffer.allocate(44 + 64 * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 128)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(16000)
        .putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(128)
      (0 until 64).foreach(i => bb.putShort((i * 100).toShort))
      bb.array()
    }
    assert(aHash64(tiny) == None)
  }

  test("withAudioHash: null sigs for non-audio, hash column for real " +
      "rows; image and audio payloads coexist") {
    val df = Seq(
      1L -> synthStepWav(5L, 0),
      2L -> Array[Byte](9, 9, 9),
      3L -> synthStepWav(5L, 1),
      4L -> synthGridImage(5L, 0)). // an image is not audio
      toDF("media_id", "payload")
    val got = withAudioHash(df, "media_id", "payload").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got(2L) == None && got(4L) == None)
    assert(got(1L).isDefined && got(1L) == got(3L)) // gain-invariant
  }
}
