package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns + typed metadata, with decode/feature steps as partition-wise
  * typed transforms.
  *
  * The Spark-side shape is the real deliverable here: schema, batch
  * iteration (one decoder init per PARTITION, not per row — the same
  * economics as a Pandas UDF over mapInPandas). Image metadata decodes
  * REAL bytes via the JDK's `javax.imageio` ([[ImageIoCodec]]) and
  * audio metadata REAL WAV/AIFF/AU headers via `javax.sound.sampled`
  * ([[AudioCodec]]); only video still routes to a clearly-marked
  * deterministic stand-in ([[StubCodec]] — no JDK video codec
  * exists), behind the same dispatch so a real codec drops in.
  */
object Multimodal {

  /** Typed metadata carried next to the payload. */
  case class MediaMeta(kind: String, width: Int, height: Int,
                       durationMs: Long, codec: String)

  case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)

  case class Features(media_id: Long, kind: String, n_bytes: Long,
                      width: Int, height: Int, aspect: Double,
                      checksum: Long)

  /** Full-frame decode through a MEMORY-backed image input stream.
    * `ImageIO.read(InputStream)` honors the global `useCache` default
    * (true), which spools every payload — bytes ALREADY in memory —
    * through a disk temp file before decoding: one file create/write/
    * read/delete cycle of syscalls per row. The explicit
    * MemoryCacheImageInputStream keeps the whole decode in memory;
    * the decoder and therefore the pixels are identical. */
  private def readImage(payload: Array[Byte]): java.awt.image.BufferedImage = {
    val in = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    // ImageIO.read(ImageInputStream) closes the stream itself; a
    // second close throws "IOException: closed", so only clean up on
    // the paths read() did not reach (it throwing before the close).
    try javax.imageio.ImageIO.read(in)
    finally {
      try in.close()
      catch { case _: java.io.IOException => () }
    }
  }

  /** Encode through a MEMORY-backed image output stream — the write
    * twin of [[readImage]]: `ImageIO.write(img, fmt, OutputStream)`
    * otherwise buffers the encoder's output in a disk temp file per
    * image. Same encoder, same bytes, no syscalls. Returns false when
    * no writer handles `fmt` (the ImageIO.write contract). */
  private def writeImage(img: java.awt.image.RenderedImage, fmt: String,
                         out: java.io.OutputStream): Boolean = {
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    try javax.imageio.ImageIO.write(img, fmt, ios) finally ios.close()
  }

  /** STUB codec — NOT a real decoder. Parses the deterministic fake
    * header laid out by [[encodeFake]]: [kind:1][width:4][height:4]
    * [duration:8] big-endian, then payload bytes. Real IMAGE payloads
    * never reach it ([[decodeMeta]] dispatches those to [[ImageIoCodec]]
    * on magic bytes) and neither do real WAV/AIFF/AU audio payloads
    * ([[AudioCodec]]); it remains the VIDEO stand-in — the one family
    * with genuinely no JDK codec. */
  object StubCodec {
    def encodeFake(kind: Byte, width: Int, height: Int, durationMs: Long,
                   body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(17 + body.length)
      bb.put(kind).putInt(width).putInt(height).putLong(durationMs).put(body)
      bb.array()
    }

    def decode(payload: Array[Byte]): MediaMeta = {
      val bb = java.nio.ByteBuffer.wrap(payload)
      val kind = bb.get() match {
        case 1 => "image"; case 2 => "audio"; case 3 => "video"
        case _ => "unknown"
      }
      MediaMeta(kind, bb.getInt(), bb.getInt(), bb.getLong(), "fake")
    }
  }

  /** REAL image codec over the JDK's own `javax.imageio` registry
    * (PNG/JPEG/GIF/BMP ship with every JDK — no external library).
    * Header-only decode: the `ImageReader` is asked for width/height,
    * which reads the image header, never the pixel planes — so cost per
    * row is O(header), not O(pixels), exactly what metadata extraction
    * over 100 TB of image blobs wants. */
  object ImageIoCodec {

    /** Magic-byte sniff. Returns the format name iff the payload starts
      * like one of the JDK-decodable image containers. The fake-header
      * layout ([[StubCodec.encodeFake]]) starts with kind byte 1/2/3 and
      * can never collide with these signatures. */
    def sniff(payload: Array[Byte]): Option[String] =
      if (payload == null || payload.length < 4) None
      else if ((payload(0) & 0xff) == 0x89 && payload(1) == 'P' &&
               payload(2) == 'N' && payload(3) == 'G') Some("png")
      else if ((payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8 &&
               (payload(2) & 0xff) == 0xff) Some("jpeg")
      else if (payload(0) == 'G' && payload(1) == 'I' &&
               payload(2) == 'F' && payload(3) == '8') Some("gif")
      else if (payload(0) == 'B' && payload(1) == 'M') Some("bmp")
      else None

    /** Corrupt bytes behind a valid magic (certain at crawl scale) must
      * not fail the task: every decode error degrades to the same
      * `unknown` meta the no-reader case returns, and the job keeps
      * going. The stream is memory-backed — the ImageIO default would
      * spool the (already in-memory) bytes through a disk temp file per
      * row, per-row syscalls the header-only path must not pay. */
    def decode(payload: Array[Byte], fmt: String): MediaMeta = {
      val in = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) MediaMeta("unknown", 0, 0, 0L, fmt)
        else {
          val r = readers.next()
          try {
            r.setInput(in, true, true) // seekForward + ignoreMetadata
            MediaMeta("image", r.getWidth(0), r.getHeight(0), 0L, fmt)
          } finally r.dispose()
        }
      } catch {
        case scala.util.control.NonFatal(_) => MediaMeta("unknown", 0, 0, 0L, fmt)
      } finally in.close()
    }

    /** Decode + bilinear-scale + re-encode, same container. None when
      * the image already fits maxDim (caller keeps the original bytes
      * — no lossy re-encode for a no-op), when the bytes don't decode,
      * or when the writer rejects the frame; the caller treats every
      * None as "pass through unchanged". */
    private[multimodal] def resizeImage(payload: Array[Byte], fmt: String,
                                        maxDim: Int): Option[(Array[Byte], Int, Int)] =
      try {
        val img = readImage(payload)
        if (img == null) None
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val scale = math.min(1.0, maxDim.toDouble / math.max(1, math.max(w, h)))
          if (scale >= 1.0) None
          else {
            val nw = math.max(1, (w * scale).toInt)
            val nh = math.max(1, (h * scale).toInt)
            // JPEG/BMP writers reject alpha; keep ARGB only where the
            // source had it AND the container can carry it
            val kind =
              if (img.getColorModel.hasAlpha && fmt != "jpeg" && fmt != "bmp")
                java.awt.image.BufferedImage.TYPE_INT_ARGB
              else java.awt.image.BufferedImage.TYPE_INT_RGB
            val dst = new java.awt.image.BufferedImage(nw, nh, kind)
            val g = dst.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, nw, nh, null)
            } finally g.dispose()
            val out = new java.io.ByteArrayOutputStream()
            if (!writeImage(dst, fmt, out)) None
            else Some((out.toByteArray, nw, nh))
          }
        }
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** REAL audio codec over the JDK's own `javax.sound.sampled`
    * (WAV/AIFF/AU file readers ship with every JDK — no external
    * library). `AudioSystem.getAudioFileFormat` parses the HEADER only
    * — sample rate, channels, frame count — never the sample data, so
    * per-row cost is O(header), the same economics as
    * [[ImageIoCodec]]. durationMs is derived as frames / frameRate;
    * sample rate and channel count ride the codec string
    * (`"wav/8000Hz/1ch"`) since [[MediaMeta]]'s width/height are
    * image-plane semantics and stay 0 for audio. */
  object AudioCodec {

    /** Magic-byte sniff for the three JDK-decodable audio containers:
      * RIFF....WAVE, FORM....AIFF/AIFC, and .snd (AU). The fake-header
      * layout starts with kind byte 1/2/3 and can never collide. */
    def sniff(payload: Array[Byte]): Option[String] =
      if (payload == null || payload.length < 12) None
      else if (payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
               payload(3) == 'F' && payload(8) == 'W' && payload(9) == 'A' &&
               payload(10) == 'V' && payload(11) == 'E') Some("wav")
      else if (payload(0) == 'F' && payload(1) == 'O' && payload(2) == 'R' &&
               payload(3) == 'M' && payload(8) == 'A' && payload(9) == 'I' &&
               payload(10) == 'F') Some("aiff")
      else if (payload(0) == '.' && payload(1) == 's' && payload(2) == 'n' &&
               payload(3) == 'd') Some("au")
      else None

    /** Corrupt bytes behind a valid magic degrade to `unknown` instead
      * of failing the task — the same resilience contract as the image
      * path. The stream is a ByteArrayInputStream (mark/reset capable,
      * no disk spooling). */
    def decode(payload: Array[Byte], fmt: String): MediaMeta =
      try {
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(payload))
        val f = aff.getFormat
        val durationMs =
          if (aff.getFrameLength > 0 && f.getFrameRate > 0)
            (aff.getFrameLength * 1000L / f.getFrameRate).toLong
          else 0L
        MediaMeta("audio", 0, 0, durationMs,
          s"$fmt/${f.getSampleRate.toInt}Hz/${f.getChannels}ch")
      } catch {
        case scala.util.control.NonFatal(_) => MediaMeta("unknown", 0, 0, 0L, fmt)
      }
  }

  /** Per-payload dispatch: real image bytes (by magic) decode through
    * [[ImageIoCodec]], real WAV/AIFF/AU audio through [[AudioCodec]];
    * everything else — including every fake-header payload the specs
    * and gate q53 generate — routes to [[StubCodec]] unchanged. */
  private[multimodal] def dispatchDecode(payload: Array[Byte]): MediaMeta =
    ImageIoCodec.sniff(payload) match {
      case Some(fmt) => ImageIoCodec.decode(payload, fmt)
      case None => AudioCodec.sniff(payload) match {
        case Some(fmt) => AudioCodec.decode(payload, fmt)
        case None      => StubCodec.decode(payload)
      }
    }

  /** Decode payloads partition-wise: one codec instance per partition,
    * rows streamed through it (the mapInPandas batch shape in Scala).
    * ImageIO's plugin registry scan is a once-per-JVM static, so the
    * per-partition init point stays O(1). */
  def decodeMeta(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init point: a stateful decoder allocates here
        it.map { case (id, payload) => MediaRow(id, payload, dispatchDecode(payload)) }
      }
  }

  /** Feature extraction over decoded rows — pure, partition-local. */
  def extractFeatures(rows: Dataset[MediaRow]): Dataset[Features] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map { r =>
        val aspect =
          if (r.meta.height == 0) 0.0
          else r.meta.width.toDouble / r.meta.height
        // cheap rolling checksum of the payload (stand-in for a real
        // perceptual hash; deterministic for tests)
        var sum = 0L
        var i = 0
        while (i < r.payload.length) { sum = sum * 31 + (r.payload(i) & 0xff); i += 1 }
        Features(r.media_id, r.meta.kind, r.payload.length.toLong,
          r.meta.width, r.meta.height, aspect, sum)
      }
    }
  }

  /** REAL pixel resize for image payloads behind a valid magic: JDK
    * `ImageIO` decode → bilinear `Graphics2D` scale → re-encode in the
    * SAME container. Unlike metadata extraction this is inherently
    * O(pixels) per row — the cost a real resize pays anywhere — and
    * stays partition-local with one codec path per partition. Corrupt
    * or unwritable image bytes pass through UNCHANGED (resilience
    * contract: a poison row must not fail the task, and for a resize
    * "unchanged" is the safe degradation, where metadata decode
    * degrades to `unknown`). Non-image rows (audio/video/fake headers)
    * keep the labeled metadata-rescale stand-in: there is no JDK video
    * scaler, and rescaling audio is resampling, not resizing. */
  def resize(rows: Dataset[MediaRow], maxDim: Int): Dataset[MediaRow] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map { r =>
        ImageIoCodec.sniff(r.payload) match {
          // header-only no-op check read from the PAYLOAD, not the row's
          // meta: a header decode proves the fit at O(header) cost, so a
          // stale or foreign MediaMeta (rows assembled elsewhere) can
          // never leave an oversized image unresized. The dominant crawl
          // case (already fits) still skips the O(pixels) decode.
          case Some(fmt) if {
              val hdr = ImageIoCodec.decode(r.payload, fmt)
              hdr.kind == "image" &&
                math.max(hdr.width, hdr.height) <= maxDim
            } => r
          case Some(fmt) =>
            ImageIoCodec.resizeImage(r.payload, fmt, maxDim) match {
              case Some((bytes, w, h)) =>
                MediaRow(r.media_id, bytes, MediaMeta("image", w, h, 0L, fmt))
              case None => r // decode/write refused: pass through
            }
          case None =>
            val scale = math.min(1.0, maxDim.toDouble /
              math.max(1, math.max(r.meta.width, r.meta.height)))
            if (scale >= 1.0) r
            else r.copy(meta = r.meta.copy(
              width = (r.meta.width * scale).toInt,
              height = (r.meta.height * scale).toInt))
        }
      }
    }
  }

  /** 64-bit perceptual difference hash (dHash) of an image payload —
    * the standard public construction: decode, grayscale, downscale to
    * a 9×8 grid, then one bit per horizontally-adjacent cell pair
    * (bit y*8+x set iff mean(x,y) < mean(x+1,y)). Hamming-near hashes
    * ⇒ visually near-duplicate images, robust to exactly the edits
    * byte-equality is blind to: re-encoding, uniform brightness/
    * contrast shifts (any strictly-monotone pixel transform preserves
    * every comparison, hence the WHOLE hash), and mild resizing
    * (block means are stable under scaling).
    *
    * Determinism contract (what the q74 oracle leans on): grayscale is
    * integer luminance `(299r + 587g + 114b) / 1000` per pixel, and
    * each grid cell is the exact arithmetic mean over the pixel
    * rectangle `[cx*w/9, (cx+1)*w/9) × [cy*h/8, (cy+1)*h/8)` — our own
    * block average, NOT a Graphics2D scale, so there is no
    * interpolation kernel or rendering-hint dependence anywhere.
    * None for undecodable payloads or images smaller than the 9×8
    * grid (no meaningful hash exists; callers drop such rows the same
    * way the text finders drop NULL text). */
  def dHash64(payload: Array[Byte]): Option[Long] =
    try {
      if (payload == null) None
      else {
        val img = readImage(payload)
        if (img == null || img.getWidth < 9 || img.getHeight < 8) None
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          // ONE bulk default-RGB conversion of the frame: the per-pixel
          // getRGB(x, y) form re-enters the ColorModel per call (plus
          // bounds checks and dispatch) — for the 9x8-cell sweep that
          // is O(pixels) avoidable overhead. The bulk form is
          // documented to produce the identical default-RGB ints.
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          val mean = Array.ofDim[Double](8, 9)
          var cy = 0
          while (cy < 8) {
            var cx = 0
            while (cx < 9) {
              val (x0, x1) = (cx * w / 9, (cx + 1) * w / 9)
              val (y0, y1) = (cy * h / 8, (cy + 1) * h / 8)
              var sum = 0L; var n = 0
              var y = y0
              while (y < y1) {
                val row = y * w
                var x = x0
                while (x < x1) {
                  val rgb = px(row + x)
                  sum += (299 * ((rgb >> 16) & 255) + 587 * ((rgb >> 8) & 255)
                    + 114 * (rgb & 255)) / 1000
                  n += 1; x += 1
                }
                y += 1
              }
              mean(cy)(cx) = sum.toDouble / n
              cx += 1
            }
            cy += 1
          }
          var sig = 0L
          cy = 0
          while (cy < 8) {
            var cx = 0
            while (cx < 8) {
              if (mean(cy)(cx) < mean(cy)(cx + 1)) sig |= 1L << (cy * 8 + cx)
              cx += 1
            }
            cy += 1
          }
          Some(sig)
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** dHash as a partition-wise column: `(id, sig)` with a NULL sig for
    * rows whose payload does not decode to a >= 9×8 image — the same
    * null-means-no-signature contract as the text signature frames
    * ([[graft.dedup.Dedup]] drops them before banding). The id is cast
    * to long like [[decodeMeta]]. Decode is inherently O(pixels) JVM
    * work, so it rides `mapPartitions` (one codec registry per JVM,
    * rows streamed), not an expression. */
  def withDHash(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => (id, dHash64(p)) })
      .toDF("id", "sig")
  }

  /** 64-bit audio perceptual hash — the [[dHash64]] construction over
    * TIME instead of pixel space: decode the payload's PCM through the
    * JDK's `javax.sound.sampled` (WAV/AIFF/AU), downmix to mono, slice
    * the signal into 65 equal time windows, and set bit w (0..63) iff
    * the mean ENERGY (mean of x²) of window w is strictly below window
    * w+1's. Hamming-near hashes ⇒ acoustically near-duplicate audio,
    * robust to exactly the edits byte-equality is blind to: container
    * re-encode (WAV↔AIFF↔AU carry the same PCM), uniform gain shifts
    * (scaling every sample by c scales every window energy by c²,
    * preserving all 64 comparisons), and bit-depth requantization
    * (window energies move by far less than md5-derived level gaps).
    *
    * Determinism contract (what the audio gates lean on): window w
    * covers frame range `[w*n/65, (w+1)*n/65)` — integer boundaries,
    * the [[dHash64]] grid rule — and samples normalize as
    * `signed/2^(bits-1)` (unsigned recenters by 2^(bits-1); IEEE
    * float samples are used as-is — they are already in [-1, 1]), so
    * a constant-amplitude step signal has window energy exactly
    * `(v/2^(bits-1))²` and the hash is analytically derivable from
    * the step levels. Integer PCM covers 8/16/24/32-bit (both
    * endiannesses — real crawls carry 24-bit studio masters), float
    * PCM 32/64-bit. None for payloads that don't decode, other
    * encodings (μ-law/ADPCM), or signals shorter than 65 frames (no
    * meaningful hash; callers drop such rows like NULL-text). */
  def aHash64(payload: Array[Byte]): Option[Long] =
    try {
      if (payload == null) None
      else {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val f = in.getFormat
          val enc = f.getEncoding
          val bits = f.getSampleSizeInBits
          val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
          val isFloat = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_FLOAT
          val intOk = (signed || unsigned) &&
            (bits == 8 || bits == 16 || bits == 24 || bits == 32)
          val floatOk = isFloat && (bits == 32 || bits == 64)
          if (!intOk && !floatOk) None
          else {
            val bytes = in.readAllBytes()
            val frameSize = f.getFrameSize
            val n = if (frameSize > 0) bytes.length / frameSize else 0
            if (n < 65) None
            else {
              val ch = f.getChannels
              val bps = bits / 8
              val big = f.isBigEndian
              val full = (1L << (bits - 1)).toDouble
              // raw little/big-endian unsigned word of `bps` bytes
              def word(off: Int): Long = {
                var v = 0L
                var k = 0
                while (k < bps) {
                  val b = bytes(off + (if (big) k else bps - 1 - k)) & 0xffL
                  v = (v << 8) | b
                  k += 1
                }
                v
              }
              def sample(off: Int): Double =
                if (isFloat) {
                  if (bits == 32)
                    java.lang.Float.intBitsToFloat(word(off).toInt).toDouble
                  else
                    java.lang.Double.longBitsToDouble(word(off))
                } else {
                  val raw = word(off)
                  val v =
                    if (unsigned) raw - (1L << (bits - 1))
                    else (raw << (64 - bits)) >> (64 - bits) // sign-extend
                  v / full
                }
              val e = new Array[Double](65)
              var w = 0
              while (w < 65) {
                // Long arithmetic: w * n overflows Int past ~33.5M
                // frames (a ~13-minute 44.1 kHz clip) — exactly the
                // long near-duplicates the hash exists to catch
                val i0 = (w.toLong * n / 65).toInt
                val i1 = ((w + 1).toLong * n / 65).toInt
                var s = 0.0
                var i = i0
                while (i < i1) {
                  var m = 0.0
                  var c = 0
                  while (c < ch) { m += sample(i * frameSize + c * bps); c += 1 }
                  m /= ch
                  s += m * m
                  i += 1
                }
                e(w) = s / (i1 - i0)
                w += 1
              }
              var sig = 0L
              w = 0
              while (w < 64) {
                if (e(w) < e(w + 1)) sig |= 1L << w
                w += 1
              }
              Some(sig)
            }
          }
        } finally in.close()
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** [[aHash64]] as a partition-wise column: `(id, sig)` with NULL for
    * rows whose payload does not decode to >= 65 PCM frames — the same
    * null-means-no-signature contract as [[withDHash]]. */
  def withAudioHash(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => (id, aHash64(p)) })
      .toDF("id", "sig")
  }

  /** Deterministic synthetic test audio: 65 windows × 160 frames of
    * CONSTANT 16-bit mono PCM at 8 kHz, window w's level derived from
    * md5("<base>_<w>") by [[ampOf]] — the audio twin of
    * [[synthGridImage]], same analytic-oracle trick: constant windows
    * make [[aHash64]]'s energies exactly `(level/32768)²`, so the hash
    * is a pure function of the md5 levels that a SQL oracle recomputes
    * without decoding audio.
    *
    * Variants model the near-dup edits a crawl sees, chosen so their
    * hash effect is provable: 1 halves every level (integer DIV 2 — a
    * uniform gain shift; level gaps are multiples of 200, so halving
    * preserves every strict comparison AND every tie ⇒ hash-identical
    * to variant 0), 2 carries the SAME levels in an AU container
    * ([[synthStepAu]] — byte-different, hash-identical), 3 re-derives
    * window 33's level from md5("<base>_p") (touches comparisons
    * 32–33 and 33–34 only ⇒ Hamming <= 2 from variant 0). Distinct
    * bases give independent hashes (expected Hamming ~32). */
  def synthStepWav(base: Long, variant: Int): Array[Byte] = {
    val pcm = stepSamples(base, variant)
    val dataLen = pcm.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)         // PCM, mono
      .putInt(8000).putInt(16000)      // rate, byte rate
      .putShort(2).putShort(16)        // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < pcm.length) { bb.putShort(pcm(i)); i += 1 }
    bb.array()
  }

  /** The AU-container twin of [[synthStepWav]]: same PCM levels,
    * big-endian 16-bit in a 24-byte `.snd` header — byte-different
    * from the WAV, identical [[aHash64]]. */
  def synthStepAu(base: Long, variant: Int): Array[Byte] = {
    val pcm = stepSamples(base, variant)
    val dataLen = pcm.length * 2
    val bb = java.nio.ByteBuffer.allocate(24 + dataLen)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put(".snd".getBytes("US-ASCII")).putInt(24).putInt(dataLen)
      .putInt(3)                       // 16-bit linear PCM
      .putInt(8000).putInt(1)          // rate, channels
    var i = 0
    while (i < pcm.length) { bb.putShort(pcm(i)); i += 1 }
    bb.array()
  }

  private def stepSamples(base: Long, variant: Int): Array[Short] = {
    val out = new Array[Short](65 * 160)
    var w = 0
    while (w < 65) {
      val a0 =
        if (variant == 3 && w == 33) ampOf(md5Hex(s"${base}_p"))
        else ampOf(md5Hex(s"${base}_$w"))
      val a = (if (variant == 1) a0 / 2 else a0).toShort
      var i = w * 160
      while (i < (w + 1) * 160) { out(i) = a; i += 1 }
      w += 1
    }
    out
  }

  /** `1000 + ((ascii(h[0])*131 + ascii(h[1])*17 + ascii(h[2])) % 151)
    * * 200` — a 16-bit level in [1000, 31000] with gaps that are
    * multiples of 200; the SQL twin is spelled out in the audio-gate
    * oracles (the [[grayOf]] discipline). */
  private[graft] def ampOf(h: String): Int =
    1000 + ((h(0) * 131 + h(1) * 17 + h(2)) % 151) * 200

  /** Deterministic synthetic test image: a 72×64 PNG of 8×8
    * constant-gray blocks on a 9×8 grid, block value derived from
    * md5("<base>_<cx>_<cy>") — the SAME formula the q74 oracle
    * computes in SQL (`ascii` over the first three hex chars; md5 hex
    * is lowercase in both engines). Because PNG is lossless and the
    * blocks align exactly with [[dHash64]]'s grid, the hash of the
    * synthesized image is analytically derivable — which is what lets
    * an image-decode operator sit under a DuckDB oracle that cannot
    * decode images.
    *
    * Variants model the near-dup edits a crawl actually sees, chosen
    * so their effect on the hash is provable: 1 and 2 are uniform
    * brightness shifts (+15, +40 — monotone, hash-identical to
    * variant 0 bit for bit), 3 re-derives one interior cell (3,3)
    * from md5("<base>_p") (flips at most the two comparisons that
    * touch the cell ⇒ Hamming <= 2 from variant 0). Distinct bases
    * give independent 64-bit hashes (expected Hamming ~32). Gray
    * values stay in [40, 230] so no variant shift can clip. */
  def synthGridImage(base: Long, variant: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(72, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    // fill the TYPE_INT_RGB backing raster directly — one int per
    // pixel, 0x00RRGGBB, exactly what setRGB(x, y, rgb) stores for
    // this type, without 4608 per-pixel dispatch/ColorModel calls
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 9) {
        val g0 =
          if (variant == 3 && cx == 3 && cy == 3) grayOf(md5Hex(s"${base}_p"))
          else grayOf(md5Hex(s"${base}_${cx}_${cy}"))
        val g = g0 + (variant match { case 1 => 15; case 2 => 40; case _ => 0 })
        val rgb = (g << 16) | (g << 8) | g
        var py = cy * 8
        while (py < cy * 8 + 8) {
          val row = py * 72
          var px = cx * 8
          while (px < cx * 8 + 8) { data(row + px) = rgb; px += 1 }
          py += 1
        }
        cx += 1
      }
      cy += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    writeImage(img, "png", out)
    out.toByteArray
  }

  /** `40 + ((ascii(h[0])*131 + ascii(h[1])*17 + ascii(h[2])) % 151)` —
    * gray in [40, 190]; the SQL twin is spelled out in the q74
    * oracle. */
  private[graft] def grayOf(h: String): Int =
    40 + ((h(0) * 131 + h(1) * 17 + h(2)) % 151)

  // one digest per thread, hex via table lookup: the synthetic
  // fixtures call this 65-72x PER ROW (one md5 per grid cell / audio
  // window), where a fresh MessageDigest.getInstance plus a formatted
  // string PER BYTE ("%02x" runs a java.util.Formatter each call) cost
  // more than the hash itself. Output string is identical.
  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))
  private val hexDigits = "0123456789abcdef".toCharArray

  private[graft] def md5Hex(s: String): String = {
    val d = md5Local.get().digest(s.getBytes("UTF-8"))
    val c = new Array[Char](32)
    var i = 0
    while (i < 16) {
      c(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      c(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(c)
  }

  /** Frame sampling for video rows: one virtual frame every `everyMs`,
    * exploded as (media_id, frame_idx, ts_ms) — the downstream shape a
    * vision model consumes. Pure plan-level explode, no codec needed. */
  def sampleFrames(rows: Dataset[MediaRow], everyMs: Long): DataFrame = {
    import rows.sparkSession.implicits._
    rows.filter(_.meta.kind == "video")
      .map(r => (r.media_id, r.meta.durationMs))
      .toDF("media_id", "duration_ms")
      .select(col("media_id"),
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs))).as("ts_ms"))
      .withColumn("frame_idx", (col("ts_ms") / everyMs).cast("long"))
      .select("media_id", "frame_idx", "ts_ms")
  }
}
