package graft.functions

/** Minimal RIFF/WAVE codec for 16-bit PCM, written from the public RIFF
  * container layout (Microsoft/IBM WAVE spec; the same chunk grammar
  * `"RIFF" size "WAVE" (ckId ckSize ckData)*` every WAV reader parses).
  * Encode emits a canonical `fmt ` + `data` stream; decode scans chunks
  * (tolerating extras like `LIST` before `data`, as the spec allows) and
  * returns header metadata or the PCM samples.
  *
  * The audio analogue of [[ImageCodec]]: payloads in the multimodal
  * fixtures are REAL WAV byte streams, so the operators exercise a real
  * container parse — only the sample content is synthetic (see
  * `AudioOps.withAudioPayload`).
  */
object WavCodec {

  final case class WavMeta(sampleRate: Int, channels: Int,
                           bitsPerSample: Int, nSamples: Int)

  private[functions] def le32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  private[functions] def le16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
  }

  private[functions] def rd32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private[functions] def rd16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private[functions] def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Encode mono/interleaved 16-bit PCM as a canonical 44-byte-header WAV. */
  def encodeWav(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(channels >= 1 && samples.length % channels == 0,
      s"sample count ${samples.length} not a multiple of channels=$channels")
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    "RIFF".getBytes("US-ASCII").copyToArray(out, 0)
    le32(out, 4, 36 + dataLen)
    "WAVE".getBytes("US-ASCII").copyToArray(out, 8)
    "fmt ".getBytes("US-ASCII").copyToArray(out, 12)
    le32(out, 16, 16)                       // PCM fmt chunk size
    le16(out, 20, 1)                        // wFormatTag = PCM
    le16(out, 22, channels)
    le32(out, 24, sampleRate)
    le32(out, 28, sampleRate * channels * 2) // byte rate
    le16(out, 32, channels * 2)             // block align
    le16(out, 34, 16)                       // bits per sample
    "data".getBytes("US-ASCII").copyToArray(out, 36)
    le32(out, 40, dataLen)
    var i = 0
    while (i < samples.length) { le16(out, 44 + i * 2, samples(i) & 0xffff); i += 1 }
    out
  }

  /** Chunk-scan to the `fmt ` and `data` chunks; None for non-WAV or
    * non-PCM payloads (the malformed-blob degrade path, like
    * ImageCodec's octet-stream fallback). */
  def decodeWavMeta(bytes: Array[Byte]): Option[WavMeta] = {
    if (bytes.length < 44 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE")
      return None
    var off = 12
    var meta: Option[(Int, Int, Int)] = None // rate, channels, bits
    var dataLen = -1
    while (off + 8 <= bytes.length && (meta.isEmpty || dataLen < 0)) {
      val id = tag(bytes, off)
      val sz = rd32(bytes, off + 4)
      // A crafted/corrupt size field must not stall or reverse the scan
      // (sz = -8 would make the offset advance zero) — degrade to None,
      // the documented malformed-blob path.
      if (sz < 0) return None
      if (id == "fmt " && sz >= 16 && off + 8 + 16 <= bytes.length) {
        if (rd16(bytes, off + 8) != 1) return None // non-PCM
        meta = Some((rd32(bytes, off + 12), rd16(bytes, off + 10),
          rd16(bytes, off + 22)))
      } else if (id == "data") {
        // trust no declared length past the buffer's actual end
        dataLen = math.max(0, math.min(sz, bytes.length - off - 8))
      }
      // Advance in Long space: a crafted size near Int.MaxValue overflows
      // `8 + sz` to a negative Int, which would re-enter the loop with a
      // negative offset and crash tag(). Past-the-end means scan over.
      val next = off.toLong + 8L + sz.toLong + (sz & 1)
      if (next + 8 > bytes.length) off = bytes.length
      else off = next.toInt // word-aligned chunks per the spec
    }
    meta.collect {
      case (rate, ch, bits) if dataLen >= 0 && bits == 16 && ch > 0 =>
        WavMeta(rate, ch, bits, dataLen / 2 / ch)
    }
  }

  /** The PCM samples of a 16-bit WAV (interleaved as stored). Same
    * degrade posture as [[decodeWavMeta]]: junk, truncation, or crafted
    * size fields yield an empty array, never a crash or a stalled scan. */
  def decodeSamples(bytes: Array[Byte]): Array[Short] = {
    if (bytes.length < 12 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE")
      return Array.empty
    var off = 12
    while (off + 8 <= bytes.length) {
      val id = tag(bytes, off)
      val sz = rd32(bytes, off + 4)
      if (sz < 0) return Array.empty
      if (id == "data") {
        val n = math.max(0, math.min(sz, bytes.length - off - 8)) / 2
        val out = new Array[Short](n)
        var i = 0
        while (i < n) { out(i) = rd16(bytes, off + 8 + i * 2).toShort; i += 1 }
        return out
      }
      // Same Long-space advance as decodeWavMeta: overflow-sized chunks
      // terminate the scan instead of wrapping to a negative offset.
      val next = off.toLong + 8L + sz.toLong + (sz & 1)
      if (next + 8 > bytes.length) off = bytes.length
      else off = next.toInt
    }
    Array.empty
  }
}
