package graft.functions

import WavCodec.{le16, le32, rd32, tag}

/** Minimal RIFF/AVI container codec, written from the public AVI RIFF
  * layout (Microsoft "AVI RIFF File Reference": `RIFF('AVI ' LIST('hdrl'
  * avih strl...) LIST('movi' ##db...))` with the 56-byte MainAVIHeader
  * and AVIStreamHeader and the 40-byte BITMAPINFOHEADER) — the video
  * sibling of [[WavCodec]] (same chunk grammar, same little-endian
  * helpers, same crafted-size hardening: Long-space advance, negative
  * sizes bail to None, declared sizes clamp to the buffer).
  *
  * Frame PAYLOADS are opaque byte buffers to this codec — exactly how a
  * real curation pipeline treats compressed frames — so only the
  * container walk is structural: [[decodeAviMeta]] parses the header
  * tree, [[frameIndex]] scans `movi` for the video frame chunks
  * (`##db`/`##dc`) and returns their byte extents for the caller to
  * feature-extract.
  */
object AviCodec {

  /** Parsed MainAVIHeader essentials. */
  final case class AviMeta(width: Int, height: Int, nFrames: Int,
                           usPerFrame: Int, nStreams: Int)

  /** Encode `frames` (opaque per-frame byte buffers) as a canonical
    * single-video-stream AVI: `hdrl` carries the real MainAVIHeader /
    * AVIStreamHeader / BITMAPINFOHEADER triple, `movi` carries one
    * word-aligned `00db` chunk per frame. No `idx1` — it is optional by
    * spec and [[frameIndex]] scans `movi` directly, the path that also
    * works for index-less captures. */
  def encodeAvi(width: Int, height: Int, usPerFrame: Int,
                frames: Array[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && usPerFrame > 0,
      s"bad AVI dims/rate: ${width}x$height @ $usPerFrame us/frame")
    val n = frames.length
    val frameBytes = frames.map(f => f.length + 8 + (f.length & 1)).sum
    val hdrlSize = 4 + (8 + 56) + (8 + (4 + (8 + 56) + (8 + 40)))
    val moviSize = 4 + frameBytes
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val out = new Array[Byte](8 + riffSize)
    var o = 0
    def putTag(t: String): Unit = { t.getBytes("US-ASCII").copyToArray(out, o); o += 4 }
    def put32(v: Int): Unit = { le32(out, o, v); o += 4 }
    def put16(v: Int): Unit = { le16(out, o, v); o += 2 }
    putTag("RIFF"); put32(riffSize); putTag("AVI ")
    putTag("LIST"); put32(hdrlSize); putTag("hdrl")
    putTag("avih"); put32(56)
    put32(usPerFrame); put32(0); put32(0); put32(0) // usPerFrame, maxBps, padding, flags
    put32(n); put32(0); put32(1); put32(0)          // totalFrames, initial, streams, sugBuf
    put32(width); put32(height)
    (0 until 4).foreach(_ => put32(0))              // dwReserved[4]
    putTag("LIST"); put32(4 + 64 + 48); putTag("strl")
    putTag("strh"); put32(56)
    putTag("vids"); putTag("DIB ")                  // fccType, fccHandler
    put32(0); put16(0); put16(0); put32(0)          // flags, prio, lang, initialFrames
    put32(usPerFrame); put32(1000000)               // scale, rate (fps = rate/scale)
    put32(0); put32(n)                              // start, length (frames)
    put32(frames.map(_.length).foldLeft(0)(math.max)) // suggested buffer
    put32(0); put32(0)                              // quality, sampleSize
    put16(0); put16(0); put16(width); put16(height) // rcFrame
    putTag("strf"); put32(40)
    put32(40); put32(width); put32(height)          // biSize, biWidth, biHeight
    put16(1); put16(24); put32(0)                   // planes, bitCount, compression
    put32(width * height * 3); put32(0); put32(0); put32(0); put32(0)
    putTag("LIST"); put32(moviSize); putTag("movi")
    frames.foreach { f =>
      putTag("00db"); put32(f.length)
      f.copyToArray(out, o); o += f.length
      if ((f.length & 1) == 1) { out(o) = 0; o += 1 } // word alignment
    }
    require(o == out.length, s"AVI size math off: wrote $o of ${out.length}")
    out
  }

  /** Walk one chunk level `[from, until)`, calling `f(id, listType,
    * dataOff, dataLen)` per chunk (`listType` is the LIST's 4cc, null
    * otherwise; `dataLen` already clamped to the buffer). Returns false
    * on a malformed size field — callers degrade to None/empty, never
    * crash (the [[WavCodec]] contract, overflow-hardened the same way). */
  private def walkChunks(bytes: Array[Byte], from: Int, until: Int)(
      f: (String, String, Int, Int) => Unit): Boolean = {
    var off = from
    while (off + 8 <= until) {
      val id = tag(bytes, off)
      val sz = rd32(bytes, off + 4)
      if (sz < 0) return false
      val dataLen = math.min(sz.toLong, (until - off - 8).toLong).toInt
      val listType =
        if (id == "LIST" && dataLen >= 4) tag(bytes, off + 8) else null
      f(id, listType, off + 8, dataLen)
      val next = off.toLong + 8L + sz.toLong + (sz & 1)
      if (next + 8 > until) off = until else off = next.toInt
    }
    true
  }

  /** Header decode: chunk-scan to `hdrl`/`avih`; None for non-AVI bytes,
    * crafted sizes, or a header too short for the spec's 56-byte
    * MainAVIHeader. */
  def decodeAviMeta(bytes: Array[Byte]): Option[AviMeta] = {
    if (bytes.length < 12 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "AVI ")
      return None
    var meta: Option[AviMeta] = None
    val ok = walkChunks(bytes, 12, bytes.length) { (id, lt, dOff, dLen) =>
      if (id == "LIST" && lt == "hdrl" && meta.isEmpty) {
        walkChunks(bytes, dOff + 4, dOff + dLen) { (cid, _, cOff, cLen) =>
          if (cid == "avih" && cLen >= 56 && meta.isEmpty)
            meta = Some(AviMeta(
              width = rd32(bytes, cOff + 32), height = rd32(bytes, cOff + 36),
              nFrames = rd32(bytes, cOff + 16),
              usPerFrame = rd32(bytes, cOff), nStreams = rd32(bytes, cOff + 24)))
        }
        ()
      }
    }
    if (ok) meta.filter(m => m.width > 0 && m.height > 0 && m.usPerFrame > 0)
    else None
  }

  /** Byte extents `(dataOff, dataLen)` of every video frame chunk
    * (`##db`/`##dc`), in stream order — empty for non-AVI or crafted
    * payloads. Frame bytes stay opaque; the caller slices. */
  def frameIndex(bytes: Array[Byte]): Seq[(Int, Int)] = {
    if (bytes.length < 12 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "AVI ")
      return Seq.empty
    val acc = Seq.newBuilder[(Int, Int)]
    var ok = true
    ok = walkChunks(bytes, 12, bytes.length) { (id, lt, dOff, dLen) =>
      if (id == "LIST" && lt == "movi") {
        if (!walkChunks(bytes, dOff + 4, dOff + dLen) { (cid, _, cOff, cLen) =>
          if (cid.length == 4 && cid(0).isDigit && cid(1).isDigit &&
              (cid.endsWith("db") || cid.endsWith("dc")))
            acc += ((cOff, cLen))
        }) ok = false
      }
    } && ok
    if (ok) acc.result() else Seq.empty
  }
}
