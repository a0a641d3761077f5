package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Decoded-media metadata row. The decode itself is STUBBED (no codec
  * libraries in this environment) with a deterministic fake derived from the
  * bytes; the Spark-side plumbing — schema, batch shape, iterator-to-iterator
  * partition processing — is real and tested. */
final case class MediaMeta(
    doc_id: Long,
    byte_len: Int,
    format: String,
    width: Int,
    height: Int,
    checksum: Long)

/** One sampled "frame" of a media payload (stub decode). */
final case class MediaFrame(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

/** Fixed-size resized payload (stub resize). */
final case class MediaThumb(doc_id: Long, src_bytes: Int, thumb: Array[Byte])

/** Multimodal-column operators: treat image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * On a real cluster the decode closure would call an image/audio codec; the
  * iterator-to-iterator `mapPartitions` shape (never materializing a
  * partition) and the binary-column schema are exactly what that deployment
  * needs, so everything except the codec call is production-shaped.
  */
object MultimodalOps {

  /** Attach a binary media payload column. In the harness fixtures the only
    * bytes available are the document text encoded UTF-8 — stands in for an
    * image/audio blob while keeping schema and sizes real. */
  def withMediaPayload(docs: DataFrame): DataFrame =
    docs.withColumn("media", col("text").cast("binary"))

  /** STUB decode: a real implementation would parse the container header
    * (JPEG/PNG/WAV...) here. The fake is a pure function of the bytes so
    * results are deterministic and testable. */
  private def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val checksum = bytes.foldLeft(1469598103934665603L)((h, b) => (h ^ b) * 1099511628211L)
    val fmt = if (bytes.nonEmpty && bytes(0) % 2 == 0) "img/fake-png" else "img/fake-jpeg"
    MediaMeta(
      doc_id = id,
      byte_len = bytes.length,
      format = fmt,
      width = 16 + math.abs(checksum % 1024).toInt,
      height = 16 + math.abs((checksum >> 10) % 1024).toInt,
      checksum = checksum)
  }

  /** Decode / feature-extract over the binary column. Iterator-to-iterator:
    * constant memory per partition regardless of partition size. */
  def decodeMeta(docsWithMedia: DataFrame): Dataset[MediaMeta] = {
    val spark = docsWithMedia.sparkSession
    import spark.implicits._
    docsWithMedia
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, bytes) => decodeStub(id, bytes) })
  }

  /** STUB frame sampling: every `stride`-th 16-byte window as a "frame" —
    * the video-pipeline shape (one row per sampled frame, bounded per doc). */
  def sampleFrames(docsWithMedia: DataFrame, stride: Int = 64, maxFrames: Int = 8): Dataset[MediaFrame] = {
    val spark = docsWithMedia.sparkSession
    import spark.implicits._
    docsWithMedia
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        Iterator.range(0, bytes.length, stride).take(maxFrames).zipWithIndex.map {
          case (off, idx) => MediaFrame(id, idx, bytes.slice(off, math.min(off + 16, bytes.length)))
        }
      })
  }

  /** STUB resize: fixed-size "thumbnail" of exactly `thumbBytes` bytes —
    * payloads of at least `thumbBytes` bytes are byte-strided down (the
    * downscale path); shorter payloads are copied as-is and zero-padded to
    * length (never stretched). The image-resize pipeline shape: binary in,
    * bounded binary out, constant memory, deterministic. A real deployment
    * swaps the stride/pad logic for a codec resize call; schema and
    * batching stay identical. */
  def resizeThumb(docsWithMedia: DataFrame, thumbBytes: Int = 64): Dataset[MediaThumb] = {
    val spark = docsWithMedia.sparkSession
    import spark.implicits._
    docsWithMedia
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val out = new Array[Byte](thumbBytes)
        if (bytes.length >= thumbBytes) {
          var i = 0
          while (i < thumbBytes) {
            out(i) = bytes((i.toLong * bytes.length / thumbBytes).toInt)
            i += 1
          }
        } else {
          System.arraycopy(bytes, 0, out, 0, bytes.length)
        }
        MediaThumb(id, bytes.length, out)
      })
  }

  /** Oracle-checkable metadata projection (no stub math): byte length and
    * md5 of the payload — the portion of the multimodal path expressible in
    * ANSI SQL for the correctness gate. */
  def mediaMeta(docs: DataFrame): DataFrame =
    withMediaPayload(docs).select(
      col("doc_id"),
      octet_length(col("media")).cast("long").as("byte_len"),
      md5(col("media")).as("payload_md5"))
}
