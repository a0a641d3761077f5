package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.AviCodec

/** Decoded video header metadata ([[VideoOps.videoMeta]]). `duration_us`
  * is exact integer microseconds (n_frames · us_per_frame — both header
  * ints, no float timebase on a compare surface). */
final case class VideoMeta(doc_id: Long, byte_len: Int, width: Int,
                           height: Int, n_frames: Int, us_per_frame: Int,
                           duration_us: Long)

/** One sampled frame's exact byte features ([[VideoOps.frameSample]]):
  * unsigned-byte sum and max over the frame's payload — the frame-level
  * screen (black-frame/scene-cut detection, sampling for a vision
  * encoder) of a video curation pipeline, minus the pixel decode the
  * container keeps opaque. */
final case class VideoFrame(doc_id: Long, frame_idx: Int, frame_len: Int,
                            byte_sum: Long, max_byte: Int)

/** Video-modality operators — the third leg of the multimodal surface
  * next to [[MultimodalOps]] (images) and [[AudioOps]] (WAV): payloads
  * ride as opaque `binary` columns holding REAL RIFF/AVI containers
  * ([[graft.functions.AviCodec]], written from the public AVI layout),
  * processed map-only with iterator-to-iterator `mapPartitions`. Frame
  * payloads are opaque byte buffers (how a pipeline treats compressed
  * frames); only the frame CONTENT is synthetic — each byte is an
  * arithmetic function of (doc_id, frame, offset), which is what lets
  * the DuckDB oracle replay the encode→container-walk→frame-sample→
  * feature loop in SQL while the Spark side works from the container
  * bytes alone.
  *
  * Reference context: trend-o-meter (554-line JS) has no media path;
  * this completes the image/audio/video multimodal north-star triple.
  */
object VideoOps {

  /** Planted container shape — the oracle mirrors this arithmetic
    * exactly; nonneg ids keep truncating `%` agreeing across engines
    * (same contract as [[AudioOps]]/[[MultimodalOps]]). */
  private[graft] def plantedWidth(docId: Long): Int = (4 + docId % 5).toInt
  private[graft] def plantedHeight(docId: Long): Int = (3 + docId % 4).toInt
  private[graft] def plantedFrames(docId: Long): Int = (3 + docId % 6).toInt
  private[graft] def plantedUsPerFrame(docId: Long): Int =
    (20000 + (docId % 5) * 20000).toInt // 10..50 fps, exact microseconds

  private[graft] def plantedByte(docId: Long, frame: Int, i: Int): Byte =
    ((docId * 13 + frame.toLong * 17 + i.toLong * 5) % 251).toByte

  private def renderAvi(docId: Long): Array[Byte] = {
    require(docId >= 0, s"fixture ingest requires doc_id >= 0, got $docId")
    val (w, h, n) = (plantedWidth(docId), plantedHeight(docId), plantedFrames(docId))
    val frameLen = w * h * 3
    val frames = Array.tabulate(n)(f =>
      Array.tabulate(frameLen)(i => plantedByte(docId, f, i)))
    AviCodec.encodeAvi(w, h, plantedUsPerFrame(docId), frames)
  }

  /** Attach the binary video payload column: a real single-stream AVI per
    * document, deterministic in doc_id. (UDF justified: fixture ingest
    * emitting an encoded container, not an analytic hot path.) */
  def withVideoPayload(docs: DataFrame): DataFrame = {
    val render = udf(renderAvi _)
    docs.withColumn("video", render(col("doc_id")))
  }

  /** Header decode: real RIFF/AVI chunk walk per blob. Map-only; a
    * malformed container degrades to zeroed metadata, never a crash. */
  def videoMeta(docsWithVideo: DataFrame): Dataset[VideoMeta] = {
    val spark = docsWithVideo.sparkSession
    import spark.implicits._
    docsWithVideo
      .select(col("doc_id"), col("video"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val m = AviCodec.decodeAviMeta(bytes)
          .getOrElse(AviCodec.AviMeta(0, 0, 0, 0, 0))
        VideoMeta(id, bytes.length, m.width, m.height, m.nFrames,
          m.usPerFrame, m.nFrames.toLong * m.usPerFrame)
      })
  }

  /** Sample every `stride`-th frame (0, stride, 2·stride, … — the
    * keyframe-ish sampling a vision-encoder pipeline feeds) and emit
    * exact byte features per sampled frame. Map-only: the container walk
    * and the feature fold both run inside one iterator pass, no frame
    * ever leaves its task. */
  def frameSample(docsWithVideo: DataFrame, stride: Int): Dataset[VideoFrame] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val spark = docsWithVideo.sparkSession
    import spark.implicits._
    docsWithVideo
      .select(col("doc_id"), col("video"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        AviCodec.frameIndex(bytes).zipWithIndex.collect {
          case ((off, len), idx) if idx % stride == 0 =>
            var i = 0; var sum = 0L; var mx = 0
            while (i < len) {
              val v = bytes(off + i) & 0xff
              sum += v; if (v > mx) mx = v; i += 1
            }
            VideoFrame(id, idx, len, sum, mx)
        }
      })
  }
}
