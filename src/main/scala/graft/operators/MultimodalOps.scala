package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.ImageCodec

/** Decoded-media metadata row: real container-header parse results. */
final case class MediaMeta(
    doc_id: Long,
    byte_len: Int,
    format: String,
    width: Int,
    height: Int,
    channels: Int)

/** One sampled "frame": a pixel-row band of the decoded raster. */
final case class MediaFrame(doc_id: Long, frame_idx: Int, frame_len: Int, frame_bytes: Array[Byte])

/** Nearest-neighbor thumbnail, re-encoded as a real PNG. */
final case class MediaThumb(
    doc_id: Long,
    src_width: Int,
    src_height: Int,
    channels: Int,
    thumb_len: Int,
    thumb: Array[Byte])

/** Multimodal-column operators: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata, processed per-partition with
  * iterator-to-iterator `mapPartitions` (constant memory regardless of
  * partition size — the shape a 100 TB media scan needs).
  *
  * The codec ([[graft.functions.ImageCodec]]) is REAL: payloads are actual
  * PNG streams (decoded back to pixels via zlib inflate + PNG unfiltering)
  * and actual JPEG header streams (dims parsed by T.81 marker scanning).
  * Only the fixture *content* is synthetic — the harness has no image files,
  * so [[withMediaPayload]] renders each document's text bytes into a real
  * encoded image whose planted dimensions are an arithmetic function of
  * `doc_id`, which is exactly what lets the DuckDB oracle verify the whole
  * encode→decode round trip (format, dims, channels, byte length) in SQL.
  *
  * Reference context: trend-o-meter (554-line JS) has no media path; this is
  * the multimodal north-star surface built from public format specs.
  */
object MultimodalOps {

  /** Planted raster dims for a fixture doc — the oracle mirrors this
    * arithmetic: `w = 8 + id%57`, `h = 8 + (id/57)%57` (8..64, so one
    * zlib stored block always suffices and PNG size stays closed-form).
    * Plain truncating `%` and `/` on BOTH sides (DuckDB's `%` truncates
    * too), and ingest asserts `doc_id >= 0` — the one range where
    * truncating and floor semantics agree, so the two sides cannot
    * silently diverge on a signed id. */
  private[graft] def plantedDims(docId: Long): (Int, Int) =
    ((8 + docId % 57).toInt, (8 + (docId / 57) % 57).toInt)

  /** Planted channel count: JPEG docs (id%3==0) are 3-component; PNG docs
    * alternate grayscale (even id) / RGB (odd id). */
  private[graft] def plantedChannels(docId: Long): Int =
    if (docId % 3 == 0) 3 else if (docId % 2 == 0) 1 else 3

  private def renderPayload(docId: Long, text: String): Array[Byte] = {
    require(docId >= 0, s"fixture ingest requires doc_id >= 0, got $docId " +
      "(planted-dim arithmetic is only truncation/floor-agnostic there)")
    val (w, h) = plantedDims(docId)
    if (docId % 3 == 0) ImageCodec.encodeJpegShell(w, h, ncomp = 3)
    else {
      val ch = plantedChannels(docId)
      val tb = Option(text).getOrElse("").getBytes("UTF-8")
      val px = new Array[Byte](w * h * ch)
      var i = 0
      if (tb.nonEmpty) {
        while (i < px.length) { px(i) = tb(i % tb.length); i += 1 }
      } else {
        while (i < px.length) { px(i) = ((docId + i * 2654435761L) & 0xff).toByte; i += 1 }
      }
      ImageCodec.encodePng(w, h, ch, px)
    }
  }

  /** Attach a binary media payload column: a REAL encoded image per document
    * (PNG with the text bytes as pixel content, or a JPEG header stream),
    * deterministic in (doc_id, text). A production ingest would read blob
    * files instead; every operator below consumes only the binary column, so
    * the swap is a one-line source change. (UDF is justified here: builtins
    * cannot emit an encoded image container; this is fixture ingest, not an
    * analytic hot path.) */
  def withMediaPayload(docs: DataFrame): DataFrame = {
    val render = udf(renderPayload _)
    docs.withColumn("media", render(col("doc_id"), col("text")))
  }

  /** Header decode over the binary column: real PNG IHDR / JPEG SOF parsing.
    * Iterator-to-iterator, map-only — no shuffle at any scale; corrupt blobs
    * degrade to format "application/octet-stream" instead of failing the
    * scan. */
  def decodeMeta(docsWithMedia: DataFrame): Dataset[MediaMeta] = {
    val spark = docsWithMedia.sparkSession
    import spark.implicits._
    docsWithMedia
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val m = ImageCodec.decodeMeta(bytes)
        MediaMeta(id, bytes.length, m.format, m.width, m.height, m.channels)
      })
  }

  /** Frame sampling over decoded pixels: every `stride`-th pixel row of the
    * raster becomes one frame (the video-pipeline shape: bounded rows per
    * doc, one binary band each). Payloads without an available pixel codec
    * (the JPEG header streams — entropy decode needs a DCT/Huffman codec)
    * are skipped, as a real pipeline routes them to a different decoder. */
  def sampleFrames(docsWithMedia: DataFrame, stride: Int = 8, maxFrames: Int = 8): Dataset[MediaFrame] = {
    require(stride > 0 && maxFrames > 0, s"bad stride=$stride maxFrames=$maxFrames")
    val spark = docsWithMedia.sparkSession
    import spark.implicits._
    docsWithMedia
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        ImageCodec.decodePngPixels(bytes) match {
          case None => Iterator.empty
          case Some(img) =>
            val rowLen = img.width * img.channels
            Iterator.range(0, img.height, stride).take(maxFrames).zipWithIndex.map {
              case (row, idx) =>
                val band = java.util.Arrays.copyOfRange(
                  img.pixels, row * rowLen, (row + 1) * rowLen)
                MediaFrame(id, idx, rowLen, band)
            }
        }
      })
  }

  /** Thumbnail: decode real pixels, nearest-neighbor resample to
    * `thumbW`×`thumbH`, re-encode as a real PNG. Constant output size per
    * channel count (`68 + thumbH·(1 + thumbW·channels)` bytes — the stored
    * -block PNG closed form), so the oracle checks the output length too.
    * Non-PNG payloads are skipped (no pixel codec), same contract as
    * [[sampleFrames]]. */
  def resizeThumb(docsWithMedia: DataFrame, thumbW: Int = 16, thumbH: Int = 16): Dataset[MediaThumb] = {
    require(thumbW > 0 && thumbH > 0, s"bad thumb dims ${thumbW}x$thumbH")
    val spark = docsWithMedia.sparkSession
    import spark.implicits._
    docsWithMedia
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        ImageCodec.decodePngPixels(bytes).iterator
          .filter(img => img.channels == 1 || img.channels == 3) // re-encoder is gray/RGB
          .map { img =>
            val t = ImageCodec.resizeNearest(img, thumbW, thumbH)
            val enc = ImageCodec.encodePng(t.width, t.height, t.channels, t.pixels)
            MediaThumb(id, img.width, img.height, img.channels, enc.length, enc)
          }
      })
  }

  /** Oracle-checkable metadata over the raw ingest bytes (pre-encode): byte
    * length and md5 of the document's own bytes — the SQL-expressible
    * checksum leg of the multimodal path. */
  def mediaMeta(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      octet_length(col("text").cast("binary")).cast("long").as("byte_len"),
      md5(col("text").cast("binary")).as("payload_md5"))
}
