package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (brief-mandated): image/audio/video as
  * opaque BINARY columns with typed metadata, processed per-partition in
  * batches. The Spark side — schema, partitioning, batch iteration, typed
  * Encoders — is real and tested; the actual codec calls are STUBBED
  * (deterministic fakes derived from the bytes) because no media
  * libraries exist in this environment. Swap `decodeStub` for a real
  * decoder (e.g. javacv / a Pandas UDF in pyspark) without touching the
  * surrounding plumbing.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, media: Array[Byte])
  final case class MediaFeatures(media_id: Long, kind: String, byte_len: Long,
                                 content_hash: Long, width: Int, height: Int,
                                 n_frames: Int)

  /** Wrap any table with a binary payload column into the media schema
    * (tests derive fake media from document text bytes). */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String, kind: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(payloadCol).cast("binary").as("media"))

  /** ==== STUB ==== deterministic fake decode: real implementations
    * replace this body; everything around it (partitioned batch map,
    * typed output schema) is production plumbing. */
  private[pipeline] def decodeStub(kind: String, bytes: Array[Byte]): (Int, Int, Int) = {
    var h = 1125899906842597L // FNV-ish rolling hash of the payload
    bytes.foreach(b => h = h * 31 + (b & 0xff))
    val pos = h & Long.MaxValue
    kind match {
      case "image" => (64 + (pos % 512).toInt, 64 + ((pos >> 9) % 512).toInt, 1)
      case "video" => (64 + (pos % 512).toInt, 64 + ((pos >> 9) % 512).toInt,
                       1 + ((pos >> 18) % 300).toInt)
      case _       => (0, 0, 1 + (pos % 300).toInt) // audio: frames only
    }
  }

  /** Feature extraction over the media column: mapPartitions so a real
    * decoder can amortize model/codec init once per partition and batch
    * its calls — the Spark-native analogue of mapInPandas. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition init of the (stubbed) decoder happens here
      it.map { r =>
        val (w, h, f) = decodeStub(r.kind, r.media)
        var hash = 1125899906842597L
        r.media.foreach(b => hash = hash * 31 + (b & 0xff))
        MediaFeatures(r.media_id, r.kind, r.media.length.toLong, hash, w, h, f)
      }
    }
  }

  final case class ResizedMedia(media_id: Long, kind: String,
                                width: Int, height: Int, media: Array[Byte])

  /** Resize/resample: decode → scale to (w, h) → re-encode, batched per
    * partition like [[extractFeatures]] so a real codec inits once. The
    * ==== STUB ==== re-encode emits a deterministic byte slice sized by
    * the target area (payload shrinks/pads like a real downscale would);
    * the typed output schema and partition shape are production
    * plumbing. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    require(w > 0 && h > 0, "target dims must be positive")
    media.mapPartitions { it =>
      // per-partition init of the (stubbed) codec happens here
      it.map { r =>
        // Long arithmetic: i·len overflows Int for MB-scale payloads
        // (255·9e6 > 2^31) and w·h for large target dims
        val target = math.min(math.max(1L, w.toLong * h.toLong / 8L),
          Int.MaxValue.toLong - 8).toInt
        val out = new Array[Byte](target)
        val len = r.media.length.toLong
        var i = 0L
        while (i < target) {
          out(i.toInt) = if (len == 0L) 0
                         else r.media(((i * len) / target % len).toInt)
          i += 1
        }
        ResizedMedia(r.media_id, r.kind, w, h, out)
      }
    }
  }

  /** Deterministic frame sampling plan for video rows: one row per
    * sampled frame index (every `stride`-th frame). The decode of each
    * frame is the stubbed step; the explode/partition shape is real. */
  def sampleFrames(features: Dataset[MediaFeatures], stride: Int): DataFrame =
    features.toDF()
      .filter(col("kind") === "video")
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
}
