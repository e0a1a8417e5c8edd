package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) handling: media travels as an
  * opaque `binary` payload column plus typed metadata; decode /
  * feature-extraction runs per partition over iterator batches so a
  * real codec would amortize native-library setup per partition, not
  * per row.
  *
  * The container ships no media libraries, so [[decodeMeta]]'s codec
  * step is a clearly-marked deterministic STUB — the Spark-side
  * plumbing (binary column, case-class schema, mapPartitions batch
  * shape, partition-level reuse) is the real, tested part.
  */
object Multimodal {

  /** A media row: opaque bytes + typed metadata. */
  case class MediaRecord(doc_id: Long, format: String, payload: Array[Byte],
                         width: Int, height: Int)

  /** Decoded/per-item features. */
  case class MediaMeta(doc_id: Long, format: String, n_bytes: Long,
                       width: Int, height: Int, pixels: Long)

  /** Synthesize a deterministic media table from `documents`: payload
    * is the UTF-8 text bytes; metadata derives from doc_id. */
  def synthesize(docs: DataFrame): Dataset[MediaRecord] = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(
      col("doc_id"),
      element_at(array(lit("png"), lit("jpg"), lit("wav")),
        (col("doc_id") % 3 + 1).cast("int")).as("format"),
      col("text").cast("binary").as("payload"),
      (col("doc_id") % 640 + 1).cast("int").as("width"),
      (col("doc_id") % 480 + 1).cast("int").as("height"))
      .as[MediaRecord]
  }

  /** Per-partition "decode": iterate the batch, emit metadata +
    * derived features. STUB: a real implementation hands
    * `rec.payload` to an image/audio codec here (e.g. per-partition
    * decoder instance reused across the iterator); payload length and
    * pixel count stand in for decoded features. */
  def decodeMeta(media: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition setup would go here (codec init, native buffers)
      it.map { rec =>
        MediaMeta(rec.doc_id, rec.format, rec.payload.length.toLong,
          rec.width, rec.height, rec.width.toLong * rec.height)
      }
    }
  }

  /** Resize: metadata-exact, payload resampled by a deterministic
    * byte stride. STUB for the pixel path — a real implementation
    * resamples in pixel space via the per-partition codec instance —
    * but the Spark-side contract (row in → row out, new dims, payload
    * size ∝ pixel ratio, per-partition batch shape) is the real,
    * tested part. */
  def resize(media: Dataset[MediaRecord], targetW: Int, targetH: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { rec =>
        if (rec.payload.isEmpty) MediaRecord(rec.doc_id, rec.format,
          rec.payload, targetW, targetH)
        else {
          val ratio = (targetW.toLong * targetH).toDouble /
            math.max(rec.width.toLong * rec.height, 1L)
          val newLen = math.max(1,
            math.min(rec.payload.length.toLong,
              math.round(rec.payload.length * ratio)).toInt)
          val out = new Array[Byte](newLen)
          var i = 0
          while (i < newLen) {
            out(i) = rec.payload(((i.toLong * rec.payload.length) / newLen).toInt)
            i += 1
          }
          MediaRecord(rec.doc_id, rec.format, out, targetW, targetH)
        }
      }
    }
  }

  /** Per-media content features: a 16-bin byte histogram (high nibble
    * of each payload byte). Unlike the codec stubs this is a REAL
    * deterministic feature — and its plumbing (fixed-dimension vector
    * per row, per-partition amortized setup, integer-exact output) is
    * exactly the shape a neural featurizer plugs into. */
  case class MediaFeatures(doc_id: Long, format: String, n_bytes: Long,
                           hist: Array[Long])

  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { rec =>
        val h = new Array[Long](16)
        rec.payload.foreach(b => h((b & 0xFF) >> 4) += 1L)
        MediaFeatures(rec.doc_id, rec.format, rec.payload.length.toLong, h)
      }
    }
  }

  /** One sampled frame. */
  case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Sample every `stride`-th "frame" of each media payload — the
    * row-amplifying decode shape (1 video → N frame rows). The
    * iterator never materializes a whole partition; at scale the
    * output is written partitioned by doc_id range so downstream
    * per-frame featurizers scan only their shard. STUB: frames are
    * fixed-size payload slices standing in for codec frame extraction. */
  def sampleFrames(media: Dataset[MediaRecord], frameSize: Int,
                   stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { rec =>
        val nFrames = math.max(rec.payload.length / frameSize, 0)
        (0 until nFrames by stride).iterator.map { f =>
          Frame(rec.doc_id, f,
            java.util.Arrays.copyOfRange(rec.payload, f * frameSize,
              math.min((f + 1) * frameSize, rec.payload.length)))
        }
      }
    }
  }
}
