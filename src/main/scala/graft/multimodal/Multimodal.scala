package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns + typed metadata, with decode/feature steps as partition-wise
  * typed transforms.
  *
  * The Spark-side shape is the real deliverable here: schema, batch
  * iteration (one decoder init per PARTITION, not per row — the same
  * economics as a Pandas UDF over mapInPandas), and deterministic
  * stubbed codecs (this container has no image/audio libraries; the
  * decode internals are clearly-marked fakes that parse our own header
  * format, so the pipeline is testable end-to-end and a real codec
  * drops in behind the same signature).
  */
object Multimodal {

  /** Typed metadata carried next to the payload. */
  case class MediaMeta(kind: String, width: Int, height: Int,
                       durationMs: Long, codec: String)

  case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)

  case class Features(media_id: Long, kind: String, n_bytes: Long,
                      width: Int, height: Int, aspect: Double,
                      checksum: Long)

  /** STUB codec — NOT a real decoder. Parses the deterministic fake
    * header laid out by [[encodeFake]]: [kind:1][width:4][height:4]
    * [duration:8] big-endian, then payload bytes. A real implementation
    * replaces ONLY this object; everything downstream keeps its shape. */
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

  /** Decode payloads partition-wise: one codec instance per partition,
    * rows streamed through it (the mapInPandas batch shape in Scala). */
  def decodeMeta(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init point: a real decoder allocates here
        val codec = StubCodec
        it.map { case (id, payload) => MediaRow(id, payload, codec.decode(payload)) }
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

  /** Resize step (STUB: rescales metadata + truncates payload
    * proportionally — a real impl re-encodes pixels). Signature and
    * partition economics are what a real resize would use. */
  def resize(rows: Dataset[MediaRow], maxDim: Int): Dataset[MediaRow] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map { r =>
        val scale = math.min(1.0,
          maxDim.toDouble / math.max(1, math.max(r.meta.width, r.meta.height)))
        if (scale >= 1.0) r
        else r.copy(meta = r.meta.copy(
          width = (r.meta.width * scale).toInt,
          height = (r.meta.height * scale).toInt))
      }
    }
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
