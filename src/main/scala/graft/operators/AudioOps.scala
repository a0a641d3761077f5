package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.WavCodec

/** Decoded audio header metadata ([[AudioOps.audioMeta]]). `duration_us`
  * is exact integer microseconds (n · 1e6 / rate with the fixture's rate
  * dividing 1e6 — no float duration on a compare surface). */
final case class AudioMeta(doc_id: Long, byte_len: Int, sample_rate: Int,
                           channels: Int, bits: Int, n_samples: Int,
                           duration_us: Long)

/** One hop window's energy ([[AudioOps.windowEnergy]]): exact integer
  * sum of squares over the window's decoded samples, plus the window's
  * peak absolute sample — the frame-level feature shape (VAD, loudness
  * normalization, silence trimming) of an audio curation pipeline. */
final case class AudioWindow(doc_id: Long, window_idx: Int, window_len: Int,
                             energy: Long, peak: Int)

/** Audio-modality operators — [[MultimodalOps]]' WAV sibling: payloads
  * ride as opaque `binary` columns holding REAL RIFF/WAVE PCM streams
  * ([[graft.functions.WavCodec]], written from the public container
  * spec), processed map-only with iterator-to-iterator `mapPartitions`.
  * Only the sample CONTENT is synthetic (the harness ships no media
  * files): each document's samples are an arithmetic function of
  * `doc_id`, which is what lets the DuckDB oracle replay the whole
  * encode→decode→window-aggregate loop in SQL (`generate_series` over
  * the planted sample formula) while the Spark side works from the
  * decoded bytes alone.
  *
  * Reference context: trend-o-meter (554-line JS) has no media path;
  * this extends the multimodal north-star surface to audio.
  */
object AudioOps {

  /** Fixture rate: divides 1e6 exactly, so integer microsecond durations
    * are closed-form (125 us per sample). */
  val SampleRate = 8000

  /** Planted sample count (400..999) and sample values — the oracle
    * mirrors this arithmetic exactly; nonneg ids keep truncating `%`
    * agreeing across engines (same contract as MultimodalOps). */
  private[graft] def plantedSampleCount(docId: Long): Int =
    (400 + docId % 600).toInt

  private[graft] def plantedSample(docId: Long, i: Int): Short =
    (((docId * 31 + i.toLong * 7) % 4096) - 2048).toShort

  private def renderWav(docId: Long): Array[Byte] = {
    require(docId >= 0, s"fixture ingest requires doc_id >= 0, got $docId")
    val n = plantedSampleCount(docId)
    val samples = Array.tabulate(n)(i => plantedSample(docId, i))
    WavCodec.encodeWav(SampleRate, channels = 1, samples)
  }

  /** Attach the binary audio payload column: a real mono 16-bit WAV per
    * document, deterministic in doc_id. (UDF justified: fixture ingest
    * emitting an encoded container, not an analytic hot path.) */
  def withAudioPayload(docs: DataFrame): DataFrame = {
    val render = udf(renderWav _)
    docs.withColumn("audio", render(col("doc_id")))
  }

  /** Header decode: real RIFF chunk scan per blob. Map-only. */
  def audioMeta(docsWithAudio: DataFrame): Dataset[AudioMeta] = {
    val spark = docsWithAudio.sparkSession
    import spark.implicits._
    docsWithAudio
      .select(col("doc_id"), col("audio"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val m = WavCodec.decodeWavMeta(bytes)
          .getOrElse(WavCodec.WavMeta(0, 0, 0, 0))
        AudioMeta(id, bytes.length, m.sampleRate, m.channels,
          m.bitsPerSample, m.nSamples,
          if (m.sampleRate > 0)
            m.nSamples.toLong * 1000000L / m.sampleRate else 0L)
      })
  }

  /** Hop-window energy over DECODED samples: non-overlapping windows of
    * `hop` samples (the 20 ms frame at the fixture rate), each emitting
    * its exact integer sum of squares and peak |sample|. Map-only with a
    * bounded per-row explode (n/hop windows) — the per-frame feature
    * extraction shape; no shuffle at any scale. */
  def windowEnergy(docsWithAudio: DataFrame, hop: Int = 160): Dataset[AudioWindow] = {
    require(hop > 0, "hop must be positive")
    val spark = docsWithAudio.sparkSession
    import spark.implicits._
    docsWithAudio
      .select(col("doc_id"), col("audio"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val s = WavCodec.decodeSamples(bytes)
        (0 until (s.length + hop - 1) / hop).iterator.map { w =>
          val from = w * hop
          val until = math.min(from + hop, s.length)
          var energy = 0L
          var peak = 0
          var i = from
          while (i < until) {
            val v = s(i).toInt
            energy += v.toLong * v
            val a = math.abs(v)
            if (a > peak) peak = a
            i += 1
          }
          AudioWindow(id, w, until - from, energy, peak)
        }
      })
  }
}
