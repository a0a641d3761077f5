package graft

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

import graft.functions.ImageCodec
import graft.operators.MultimodalOps

class MultimodalSpec extends SparkSpec {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq((1L, "abcd" * 100), (2L, "xy"), (3L, "q"), (6L, "gray even")).toDF("doc_id", "text")
  }

  // ----- video (AVI) ---------------------------------------------------

  test("AVI encode→decode round trip: header tree, frame index, exact payloads") {
    import graft.functions.AviCodec
    // 45-byte (odd) frames exercise the spec's word alignment
    val frames = Array.tabulate(5)(f =>
      Array.tabulate(45)(i => ((f * 7 + i) % 251).toByte))
    val bytes = AviCodec.encodeAvi(5, 3, 40000, frames)
    assert(AviCodec.decodeAviMeta(bytes).contains(
      AviCodec.AviMeta(5, 3, 5, 40000, 1)))
    val idx = AviCodec.frameIndex(bytes)
    assert(idx.length == 5 && idx.forall(_._2 == 45))
    assert(idx.zipWithIndex.forall { case ((off, len), f) =>
      java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(bytes, off, off + len), frames(f))
    })
    // total length matches the documented layout arithmetic the
    // video_meta oracle replays (224 + n * (8 + frameLen + pad))
    assert(bytes.length == 224 + 5 * (8 + 45 + 1))
  }

  test("AVI decode degrades (never hangs or throws) on crafted size fields") {
    import graft.functions.AviCodec
    val frames = Array.tabulate(3)(f => Array.fill(30)((f + 1).toByte))
    val base = AviCodec.encodeAvi(4, 3, 40000, frames)
    // negative inner chunk size (avih size at offset 28): degrade, no stall
    val neg = base.clone()
    neg(28) = 0xf8.toByte; neg(29) = 0xff.toByte
    neg(30) = 0xff.toByte; neg(31) = 0xff.toByte
    assert(AviCodec.decodeAviMeta(neg).isEmpty)
    // overflow-sized outer LIST (0x7ffffff0): Long-space advance must end
    // the scan, not wrap negative and crash tag()
    val ovf = base.clone()
    ovf(16) = 0xf0.toByte; ovf(17) = 0xff.toByte
    ovf(18) = 0xff.toByte; ovf(19) = 0x7f.toByte
    AviCodec.decodeAviMeta(ovf) // must not throw
    AviCodec.frameIndex(ovf)    // must not throw
    // a movi frame chunk declaring more bytes than exist: clamped extent
    val lastSizeOff = base.length - 30 - 4
    val over = base.clone()
    over(lastSizeOff) = 0x40; over(lastSizeOff + 1) = 0x42
    val idx = AviCodec.frameIndex(over)
    assert(idx.length == 3 && idx.last._2 == 30) // clamped to the buffer
    // zero-dimension header: None, not a nonsense relation downstream
    val w0 = base.clone()
    w0(64) = 0; w0(65) = 0; w0(66) = 0; w0(67) = 0
    assert(AviCodec.decodeAviMeta(w0).isEmpty)
    // junk and truncation never enter the chunk scan
    assert(AviCodec.decodeAviMeta(Array.fill[Byte](64)(0x41)).isEmpty)
    assert(AviCodec.frameIndex(Array.fill[Byte](64)(0x41)).isEmpty)
    assert(AviCodec.decodeAviMeta(base.take(30)).isEmpty)
  }

  test("video ops: meta and sampled-frame features match the planted arithmetic") {
    import graft.operators.VideoOps
    val withVideo = VideoOps.withVideoPayload(docs)
    val metas = VideoOps.videoMeta(withVideo).collect().map(m => m.doc_id -> m).toMap
    for (id <- Seq(1L, 2L, 3L, 6L)) {
      val (w, h, n) = ((4 + id % 5).toInt, (3 + id % 4).toInt, (3 + id % 6).toInt)
      val us = (20000 + (id % 5) * 20000).toInt
      val s = w * h * 3
      assert(metas(id).width == w && metas(id).height == h
        && metas(id).n_frames == n && metas(id).us_per_frame == us)
      assert(metas(id).byte_len == 224 + n * (8 + s + s % 2))
      assert(metas(id).duration_us == n.toLong * us)
    }
    // doc 3, frame 2 (stride-2 sample): recompute from the planted bytes
    val f32 = VideoOps.frameSample(withVideo, stride = 2).collect()
      .filter(v => v.doc_id == 3L && v.frame_idx == 2).head
    val s3 = (4 + 3 % 5) * (3 + 3 % 4) * 3
    val vals = (0 until s3).map(i => (3L * 13 + 2 * 17 + i.toLong * 5) % 251)
    assert(f32.frame_len == s3 && f32.byte_sum == vals.sum
      && f32.max_byte == vals.max.toInt)
    // odd frames are NOT sampled at stride 2
    assert(!VideoOps.frameSample(withVideo, 2).collect().exists(_.frame_idx % 2 == 1))
  }

  // ----- audio (WAV) ---------------------------------------------------

  test("WAV encode→decode round trip: header fields and every sample") {
    import graft.functions.WavCodec
    val samples = Array.tabulate(333)(i => ((i * 911) % 4096 - 2048).toShort)
    val bytes = WavCodec.encodeWav(8000, 1, samples)
    assert(bytes.length == 44 + 666)
    val m = WavCodec.decodeWavMeta(bytes).get
    assert(m == WavCodec.WavMeta(8000, 1, 16, 333))
    assert(WavCodec.decodeSamples(bytes).toSeq == samples.toSeq)
  }

  test("WAV decode tolerates extra chunks before data; rejects non-PCM and junk") {
    import graft.functions.WavCodec
    val base = WavCodec.encodeWav(8000, 2, Array[Short](1, -1, 300, -300))
    // splice a LIST chunk between fmt and data (spec-legal chunk order)
    val list = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++
      "INFO".getBytes("US-ASCII")
    val spliced = base.take(36) ++ list ++ base.drop(36)
    // RIFF size field is now stale, but chunk scanning doesn't use it
    val m = WavCodec.decodeWavMeta(spliced).get
    assert(m == WavCodec.WavMeta(8000, 2, 16, 2)) // 4 interleaved / 2 ch
    assert(WavCodec.decodeSamples(spliced).toSeq == Seq[Short](1, -1, 300, -300))
    // non-PCM format tag
    val nonPcm = base.clone(); nonPcm(20) = 3
    assert(WavCodec.decodeWavMeta(nonPcm).isEmpty)
    assert(WavCodec.decodeWavMeta("not a wav at all, nope".getBytes).isEmpty)
  }

  test("WAV decode degrades (never hangs or throws) on crafted size fields") {
    import graft.functions.WavCodec
    val base = WavCodec.encodeWav(8000, 1, Array[Short](1, 2, 3, 4))
    // negative chunk size (-8 would make the scan offset advance by 0)
    val neg = base.clone()
    neg(16) = 0xf8.toByte; neg(17) = 0xff.toByte
    neg(18) = 0xff.toByte; neg(19) = 0xff.toByte
    assert(WavCodec.decodeWavMeta(neg).isEmpty)
    assert(WavCodec.decodeSamples(neg).isEmpty)
    // data chunk declaring more bytes than exist: clamp, don't crash
    val over = base.clone()
    over(40) = 0x40; over(41) = 0x42 // declared data size 0x4240
    assert(WavCodec.decodeSamples(over).toSeq == Seq[Short](1, 2, 3, 4))
    assert(WavCodec.decodeWavMeta(over).get.nSamples == 4)
    // channels = 0 in fmt: None, not a division crash
    val ch0 = base.clone(); ch0(22) = 0; ch0(23) = 0
    assert(WavCodec.decodeWavMeta(ch0).isEmpty)
    // junk without the RIFF magic never enters the chunk scan
    assert(WavCodec.decodeSamples(Array.fill[Byte](64)(0x41)).isEmpty)
    // overflow-sized chunk: a positive size near Int.MaxValue used to wrap
    // `off += 8 + sz` to a negative offset and crash tag(); must be None
    val ovf = base.clone()
    ovf(16) = 0xf0.toByte; ovf(17) = 0xff.toByte
    ovf(18) = 0xff.toByte; ovf(19) = 0x7f.toByte // fmt size = 0x7ffffff0
    assert(WavCodec.decodeWavMeta(ovf).isEmpty)
    assert(WavCodec.decodeSamples(ovf).isEmpty)
  }

  test("audio ops: meta and window energies match the planted arithmetic") {
    import graft.operators.AudioOps
    val withAudio = AudioOps.withAudioPayload(docs)
    val metas = AudioOps.audioMeta(withAudio).collect().map(m => m.doc_id -> m).toMap
    for (id <- Seq(1L, 2L, 3L, 6L)) {
      val n = 400 + (id % 600).toInt
      assert(metas(id).n_samples == n && metas(id).byte_len == 44 + 2 * n)
      assert(metas(id).duration_us == n.toLong * 125)
    }
    // windows: recompute doc 3's energies from the planted formula
    val w3 = AudioOps.windowEnergy(withAudio).collect()
      .filter(_.doc_id == 3L).sortBy(_.window_idx)
    val n3 = 403
    assert(w3.map(_.window_len).sum == n3 && w3.length == 3)
    val expect = (0 until n3).map(i => ((3L * 31 + i * 7) % 4096 - 2048))
    for (w <- w3) {
      val sl = expect.slice(w.window_idx * 160, w.window_idx * 160 + w.window_len)
      assert(w.energy == sl.map(v => v * v).sum, s"window ${w.window_idx}")
      assert(w.peak == sl.map(math.abs).max)
    }
  }

  // ----- pure codec ---------------------------------------------------

  test("PNG encode→decode round trip is exact (RGB + grayscale)") {
    val rgb = Array.tabulate(3 * 2 * 3)(i => (i * 7 + 3).toByte)
    val png = ImageCodec.encodePng(3, 2, 3, rgb)
    assert(ImageCodec.decodeMeta(png) == ImageCodec.ImageMeta("image/png", 3, 2, 3))
    val img = ImageCodec.decodePngPixels(png).get
    assert(img.width == 3 && img.height == 2 && img.channels == 3)
    assert(img.pixels.toSeq == rgb.toSeq)
    // closed-form size: 68 + h*(1 + w*ch)
    assert(png.length == 68 + 2 * (1 + 3 * 3))

    val gray = Array.tabulate(5 * 4)(i => (255 - i).toByte)
    val png2 = ImageCodec.encodePng(5, 4, 1, gray)
    assert(ImageCodec.decodePngPixels(png2).get.pixels.toSeq == gray.toSeq)
    assert(png2.length == 68 + 4 * (1 + 5))
  }

  /** Build a PNG in the test with explicit per-row filter types and a
    * REAL compressed zlib stream (java.util.zip.Deflater, not our stored
    * blocks) — proves the decoder handles spec-conformant foreign PNGs. */
  private def mkFilteredPng(w: Int, h: Int, ch: Int, pixels: Array[Byte], filters: Array[Int]): Array[Byte] = {
    val stride = w * ch
    val bpp = ch
    val raw = new Array[Byte](h * (1 + stride))
    for (r <- 0 until h) {
      val ft = filters(r)
      raw(r * (1 + stride)) = ft.toByte
      for (c <- 0 until stride) {
        val x = pixels(r * stride + c) & 0xff
        val a = if (c >= bpp) pixels(r * stride + c - bpp) & 0xff else 0
        val b = if (r > 0) pixels((r - 1) * stride + c) & 0xff else 0
        val d = if (r > 0 && c >= bpp) pixels((r - 1) * stride + c - bpp) & 0xff else 0
        val p = { // Paeth predictor for the forward direction
          val q = a + b - d
          val pa = math.abs(q - a); val pb = math.abs(q - b); val pc = math.abs(q - d)
          if (pa <= pb && pa <= pc) a else if (pb <= pc) b else d
        }
        val enc = ft match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - ((a + b) >> 1)
          case 4 => x - p
        }
        raw(r * (1 + stride) + 1 + c) = (enc & 0xff).toByte
      }
    }
    val defl = new Deflater(Deflater.BEST_COMPRESSION)
    defl.setInput(raw); defl.finish()
    val buf = new Array[Byte](raw.length + 64)
    val zl = defl.deflate(buf); defl.end()
    val idat = java.util.Arrays.copyOf(buf, zl)
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
      out.write(be32(data.length)); out.write(tag.getBytes("US-ASCII")); out.write(data)
      val crc = new CRC32(); crc.update(tag.getBytes("US-ASCII")); crc.update(data)
      out.write(be32(crc.getValue.toInt)); out.toByteArray
    }
    val ihdr = {
      val o = new ByteArrayOutputStream()
      def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
      o.write(be32(w)); o.write(be32(h)); o.write(8)
      o.write(if (ch == 1) 0 else if (ch == 3) 2 else if (ch == 4) 6 else 4)
      o.write(0); o.write(0); o.write(0); o.toByteArray
    }
    val out = new ByteArrayOutputStream()
    out.write(ImageCodec.PngSig)
    out.write(chunk("IHDR", ihdr))
    // split IDAT in two chunks to exercise multi-IDAT concatenation
    out.write(chunk("IDAT", idat.take(idat.length / 2)))
    out.write(chunk("IDAT", idat.drop(idat.length / 2)))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  test("decoder unfilters all five PNG filter types from a Deflater-compressed multi-IDAT stream") {
    val w = 6; val h = 5; val ch = 3
    val pixels = Array.tabulate(w * h * ch)(i => ((i * 31 + 17) % 251).toByte)
    val png = mkFilteredPng(w, h, ch, pixels, Array(0, 1, 2, 3, 4))
    val img = ImageCodec.decodePngPixels(png).get
    assert(img.pixels.toSeq == pixels.toSeq)
  }

  test("JPEG shell parses back exact dims, even with extra segments before SOF") {
    val j = ImageCodec.encodeJpegShell(640, 480, 3)
    assert(j.length == 41)
    assert(ImageCodec.decodeMeta(j) == ImageCodec.ImageMeta("image/jpeg", 640, 480, 3))
    // splice a COM segment between APP0 and SOF0 — marker scan must skip it
    val com = Array[Byte](0xFF.toByte, 0xFE.toByte, 0x00, 0x07) ++ "hello".getBytes("US-ASCII")
    val spliced = j.take(20) ++ com ++ j.drop(20)
    assert(ImageCodec.decodeMeta(spliced) == ImageCodec.ImageMeta("image/jpeg", 640, 480, 3))
  }

  test("unknown and corrupt payloads degrade, never throw") {
    assert(ImageCodec.decodeMeta("not an image".getBytes).format == ImageCodec.FormatUnknown)
    assert(ImageCodec.decodeMeta(Array.emptyByteArray).format == ImageCodec.FormatUnknown)
    val png = ImageCodec.encodePng(4, 4, 1, new Array[Byte](16))
    val truncated = png.take(20)
    assert(ImageCodec.decodeMeta(truncated).format == ImageCodec.FormatUnknown)
    assert(ImageCodec.decodePngPixels(truncated).isEmpty)
    val corruptIdat = png.clone(); corruptIdat(40) = (corruptIdat(40) ^ 0x5a).toByte
    assert(ImageCodec.decodePngPixels(corruptIdat).isEmpty) // inflate fails cleanly
  }

  test("crafted chunk length near 2^31 degrades instead of overflowing the bound check") {
    // A syntactically valid signature + IHDR, then a chunk whose declared
    // length makes `i + 12 + len` wrap negative in int arithmetic. The walk
    // must reject it (long-math bound), not throw from ByteArrayOutputStream.
    val png = ImageCodec.encodePng(4, 4, 1, new Array[Byte](16))
    val evil = png.clone()
    // First chunk after IHDR starts at offset 8+25=33; patch its length field.
    evil(33) = 0x7f.toByte; evil(34) = 0xff.toByte; evil(35) = 0xff.toByte; evil(36) = 0xf0.toByte
    assert(ImageCodec.decodePngPixels(evil).isEmpty)
    assert(ImageCodec.decodeMeta(evil).format == "image/png") // header itself is still sane
  }

  test("declared-dimension bomb is rejected before allocation") {
    // ~100-byte blob claiming 16000x16000 RGBA: without the cap this
    // allocates ~1 GB before inflate fails. Must return None fast.
    val out = new ByteArrayOutputStream()
    out.write(ImageCodec.PngSig)
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      o.write(be32(data.length)); o.write(tag.getBytes("US-ASCII")); o.write(data)
      val crc = new CRC32(); crc.update(tag.getBytes("US-ASCII")); crc.update(data)
      o.write(be32(crc.getValue.toInt)); o.toByteArray
    }
    val ihdr = new ByteArrayOutputStream()
    ihdr.write(be32(16000)); ihdr.write(be32(16000)); ihdr.write(8)
    ihdr.write(6); ihdr.write(0); ihdr.write(0); ihdr.write(0) // RGBA
    out.write(chunk("IHDR", ihdr.toByteArray))
    out.write(chunk("IDAT", Array[Byte](0x78, 0x01))) // token zlib header
    out.write(chunk("IEND", Array.emptyByteArray))
    assert(ImageCodec.decodePngPixels(out.toByteArray).isEmpty)
    // Header-only parsing still reports the declared dims (no allocation).
    assert(ImageCodec.decodeMeta(out.toByteArray) ==
      ImageCodec.ImageMeta("image/png", 16000, 16000, 4))
  }

  /** Build an indexed-color (type 3) PNG: PLTE of `colors`, index
    * scanlines (packed when `depth` < 8, leftmost pixel in high bits) with
    * the given per-row filter types applied BYTE-wise (bpp = 1 for type 3
    * at every depth), Deflater-compressed. */
  private def mkPalettePng(w: Int, h: Int, colors: Array[(Int, Int, Int)],
                           indices: Array[Byte], filters: Array[Int],
                           depth: Int = 8): Array[Byte] = {
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      o.write(be32(data.length)); o.write(tag.getBytes("US-ASCII")); o.write(data)
      val crc = new CRC32(); crc.update(tag.getBytes("US-ASCII")); crc.update(data)
      o.write(be32(crc.getValue.toInt)); o.toByteArray
    }
    val stride = (w * depth + 7) / 8
    val packed = new Array[Byte](h * stride)
    for (r <- 0 until h; c <- 0 until w) {
      val shift = 8 - depth * (c % (8 / depth) + 1)
      packed(r * stride + c / (8 / depth)) =
        (packed(r * stride + c / (8 / depth)) |
          ((indices(r * w + c) & ((1 << depth) - 1)) << shift)).toByte
    }
    val raw = new Array[Byte](h * (1 + stride))
    for (r <- 0 until h) {
      raw(r * (1 + stride)) = filters(r).toByte
      for (c <- 0 until stride) {
        val x = packed(r * stride + c) & 0xff
        val a = if (c >= 1) packed(r * stride + c - 1) & 0xff else 0
        val b = if (r > 0) packed((r - 1) * stride + c) & 0xff else 0
        val enc = filters(r) match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
        }
        raw(r * (1 + stride) + 1 + c) = (enc & 0xff).toByte
      }
    }
    val defl = new Deflater(); defl.setInput(raw); defl.finish()
    val buf = new Array[Byte](raw.length + 64)
    val zl = defl.deflate(buf); defl.end()
    val ihdr = new ByteArrayOutputStream()
    ihdr.write(be32(w)); ihdr.write(be32(h)); ihdr.write(depth)
    ihdr.write(3); ihdr.write(0); ihdr.write(0); ihdr.write(0) // indexed-color
    val plte = colors.flatMap { case (r, g, b) => Array(r.toByte, g.toByte, b.toByte) }
    val out = new ByteArrayOutputStream()
    out.write(ImageCodec.PngSig)
    out.write(chunk("IHDR", ihdr.toByteArray))
    out.write(chunk("PLTE", plte))
    out.write(chunk("IDAT", java.util.Arrays.copyOf(buf, zl)))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  test("indexed-color PNG decodes through PLTE to RGB, filters applied to index bytes") {
    val colors = Array((255, 0, 0), (0, 255, 0), (0, 0, 128), (7, 8, 9))
    val indices = Array[Byte](0, 1, 2, 3, 3, 2, 1, 0, 0, 0, 2, 2)
    val png = mkPalettePng(4, 3, colors, indices, Array(0, 1, 2))
    assert(ImageCodec.decodeMeta(png) == ImageCodec.ImageMeta("image/png", 4, 3, 1))
    val img = ImageCodec.decodePngPixels(png).get
    assert(img.width == 4 && img.height == 3 && img.channels == 3)
    val expected = indices.flatMap { i =>
      val (r, g, b) = colors(i & 0xff); Array(r.toByte, g.toByte, b.toByte)
    }
    assert(img.pixels.toSeq == expected.toSeq)
  }

  test("packed sub-8-bit palettes decode at depths 1, 2, 4 (incl. row padding bits)") {
    // w=5 is deliberately NOT a multiple of any pixels-per-byte, so every
    // depth exercises trailing padding bits in each scanline.
    val w = 5; val h = 3
    for (depth <- Seq(1, 2, 4)) {
      val nColors = 1 << depth
      val colors = Array.tabulate(nColors)(i => (i * 17, 255 - i * 9, i * 33 % 256))
      val indices = Array.tabulate(w * h)(i => (i % nColors).toByte)
      val png = mkPalettePng(w, h, colors, indices, Array(0, 1, 2), depth)
      val img = ImageCodec.decodePngPixels(png)
        .getOrElse(fail(s"depth-$depth palette PNG did not decode"))
      assert(img.width == w && img.height == h && img.channels == 3)
      val expected = indices.flatMap { i =>
        val (r, g, b) = colors(i & 0xff); Array(r.toByte, g.toByte, b.toByte)
      }
      assert(img.pixels.toSeq == expected.toSeq, s"depth $depth pixels")
    }
    // Out-of-range packed index (depth 2 value pointing past a 3-entry
    // PLTE) must degrade to None, same as the 8-bit path.
    val short = Array((1, 2, 3), (4, 5, 6), (7, 8, 9)) // 3 colors, depth 2 allows index 3
    val bad = mkPalettePng(2, 1, short, Array[Byte](0, 3), Array(0), depth = 2)
    assert(ImageCodec.decodePngPixels(bad).isEmpty)
  }

  test("16-bit PALETTED (invalid per spec 11.2.2) and bogus interlace modes degrade to None") {
    val good = mkPalettePng(2, 2, Array((1, 2, 3), (4, 5, 6)),
      Array[Byte](0, 1, 1, 0), Array(0, 0))
    // depth byte lives at sig(8) + len(4) + tag(4) + w(4) + h(4) = 24
    val d16 = good.clone(); d16(24) = 16
    assert(ImageCodec.decodePngPixels(d16).isEmpty)
    // interlace byte: flipping a SEQUENTIAL stream's header to Adam7
    // changes the expected raw length (7 passes of filter bytes), so the
    // inflated data no longer fits — must degrade, not mis-scatter
    val inter = good.clone(); inter(28) = 1
    assert(ImageCodec.decodePngPixels(inter).isEmpty)
    val bogus = good.clone(); bogus(28) = 2 // not a defined interlace method
    assert(ImageCodec.decodePngPixels(bogus).isEmpty)
  }

  /** Adam7 pass grid (spec 8.2): (xstart, ystart, xstep, ystep, pw, ph). */
  private def adam7Passes(w: Int, h: Int): Seq[(Int, Int, Int, Int, Int, Int)] =
    Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
      (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)).map { case (xs, ys, xst, yst) =>
      val pw = if (w > xs) (w - xs + xst - 1) / xst else 0
      val ph = if (h > ys) (h - ys + yst - 1) / yst else 0
      (xs, ys, xst, yst, pw, ph)
    }

  /** Build an Adam7-interlaced PNG: seven reduced sub-images, each with its
    * own scanlines, filter bytes (cycling None/Sub/Up per pass row), and —
    * for packed palette depths — its own row padding. `pix(x, y)` returns
    * the per-channel sample values of the FULL-image pixel (palette index
    * for type 3). */
  private def mkAdam7Png(w: Int, h: Int, colorType: Int, depth: Int,
                         pix: (Int, Int) => Array[Int],
                         palette: Array[(Int, Int, Int)] = null): Array[Byte] = {
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      o.write(be32(data.length)); o.write(tag.getBytes("US-ASCII")); o.write(data)
      val crc = new CRC32(); crc.update(tag.getBytes("US-ASCII")); crc.update(data)
      o.write(be32(crc.getValue.toInt)); o.toByteArray
    }
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    }
    val raw = new ByteArrayOutputStream()
    for ((xs, ys, xst, yst, pw, ph) <- adam7Passes(w, h) if pw > 0 && ph > 0) {
      val stride =
        if (depth == 16) pw * channels * 2
        else if (depth == 8) pw * channels
        else (pw * depth + 7) / 8
      val bpp = if (depth == 16) channels * 2 else if (depth == 8) channels else 1
      val plain = new Array[Byte](ph * stride)
      for (r <- 0 until ph; c <- 0 until pw) {
        val vals = pix(xs + c * xst, ys + r * yst)
        if (depth == 16) for (k <- 0 until channels) {
          plain(r * stride + (c * channels + k) * 2) = ((vals(k) >>> 8) & 0xff).toByte
          plain(r * stride + (c * channels + k) * 2 + 1) = (vals(k) & 0xff).toByte
        } else if (depth == 8) for (k <- 0 until channels)
          plain(r * stride + c * channels + k) = (vals(k) & 0xff).toByte
        else {
          val per = 8 / depth
          val shift = 8 - depth * (c % per + 1)
          plain(r * stride + c / per) =
            (plain(r * stride + c / per) | ((vals(0) & ((1 << depth) - 1)) << shift)).toByte
        }
      }
      for (r <- 0 until ph) {
        val ft = r % 3 // cycle None/Sub/Up: every pass exercises filtering
        raw.write(ft)
        for (c <- 0 until stride) {
          val x = plain(r * stride + c) & 0xff
          val a = if (c >= bpp) plain(r * stride + c - bpp) & 0xff else 0
          val b = if (r > 0) plain((r - 1) * stride + c) & 0xff else 0
          val enc = ft match { case 0 => x; case 1 => x - a; case 2 => x - b }
          raw.write(enc & 0xff)
        }
      }
    }
    val rb = raw.toByteArray
    val defl = new Deflater(); defl.setInput(rb); defl.finish()
    val buf = new Array[Byte](rb.length + 64)
    val zl = defl.deflate(buf); defl.end()
    val ihdr = new ByteArrayOutputStream()
    ihdr.write(be32(w)); ihdr.write(be32(h)); ihdr.write(depth)
    ihdr.write(colorType); ihdr.write(0); ihdr.write(0); ihdr.write(1) // Adam7
    val out = new ByteArrayOutputStream()
    out.write(ImageCodec.PngSig)
    out.write(chunk("IHDR", ihdr.toByteArray))
    if (palette != null)
      out.write(chunk("PLTE", palette.flatMap { case (r, g, b) =>
        Array(r.toByte, g.toByte, b.toByte) }))
    out.write(chunk("IDAT", java.util.Arrays.copyOf(buf, zl)))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  test("Adam7 grayscale 8x8 reconstructs the sequential raster exactly") {
    // one full 8x8 tile: every pass is non-empty, every pixel distinct
    val png = mkAdam7Png(8, 8, 0, 8, (x, y) => Array(y * 8 + x + 10))
    val img = ImageCodec.decodePngPixels(png).getOrElse(fail("no decode"))
    assert(img.width == 8 && img.height == 8 && img.channels == 1)
    assert(img.pixels.toSeq == (0 until 64).map(i => (i + 10).toByte))
  }

  test("Adam7 RGB with odd dims reconstructs (partial and empty passes)") {
    // 5x3: passes 2 (xstart 4) and 3 (ystart 4) shrink to slivers; pass 3
    // is EMPTY (height 3 < ystart 4) and must contribute zero bytes
    val w = 5; val h = 3
    val png = mkAdam7Png(w, h, 2, 8,
      (x, y) => Array(x * 40 + y, 255 - x * 7 - y * 11, (x * y * 31 + 5) % 256))
    val img = ImageCodec.decodePngPixels(png).getOrElse(fail("no decode"))
    assert(img.width == w && img.height == h && img.channels == 3)
    val expected = (for (y <- 0 until h; x <- 0 until w) yield Seq(
      (x * 40 + y).toByte, (255 - x * 7 - y * 11).toByte,
      ((x * y * 31 + 5) % 256).toByte)).flatten
    assert(img.pixels.toSeq == expected)
  }

  test("Adam7 packed depth-2 palette: per-pass row padding, PLTE expansion") {
    val colors = Array((255, 0, 0), (0, 255, 0), (0, 0, 255), (7, 8, 9))
    val w = 5; val h = 5 // pass widths 1..3: padding bits in every pass
    val png = mkAdam7Png(w, h, 3, 2, (x, y) => Array((x + y) % 4), colors)
    val img = ImageCodec.decodePngPixels(png).getOrElse(fail("no decode"))
    assert(img.width == w && img.height == h && img.channels == 3)
    val expected = (for (y <- 0 until h; x <- 0 until w) yield {
      val (r, g, b) = colors((x + y) % 4); Seq(r.toByte, g.toByte, b.toByte)
    }).flatten
    assert(img.pixels.toSeq == expected)
  }

  test("Adam7 16-bit RGB scatters the high byte of each sample") {
    val w = 4; val h = 4
    val pix = (x: Int, y: Int) =>
      Array(0x1234 + x * 256 + y, 0x00ff + x, 0xff00 - y * 256)
    val png = mkAdam7Png(w, h, 2, 16, pix)
    val img = ImageCodec.decodePngPixels(png).getOrElse(fail("no decode"))
    assert(img.width == w && img.height == h && img.channels == 3)
    val expected = (for (y <- 0 until h; x <- 0 until w) yield
      pix(x, y).toSeq.map(s => ((s >>> 8) & 0xff).toByte)).flatten
    assert(img.pixels.toSeq == expected)
  }

  test("Adam7 1x1 image decodes (only pass 1 non-empty)") {
    val png = mkAdam7Png(1, 1, 0, 8, (_, _) => Array(42))
    val img = ImageCodec.decodePngPixels(png).getOrElse(fail("no decode"))
    assert(img.width == 1 && img.height == 1 && img.pixels.toSeq == Seq(42.toByte))
  }

  test("Adam7 round trip holds for random dims, color types, and depths (property)") {
    val rnd = new scala.util.Random(777)
    // non-paletted: every color type, 8- and 16-bit, dims 1..20 — random
    // dims systematically hit the empty-pass and sliver-pass edge cases
    for (trial <- 0 until 30) {
      val w = 1 + rnd.nextInt(20); val h = 1 + rnd.nextInt(20)
      val colorType = Seq(0, 2, 4, 6)(rnd.nextInt(4))
      val channels = Map(0 -> 1, 2 -> 3, 4 -> 2, 6 -> 4)(colorType)
      val depth16 = rnd.nextBoolean()
      val content = Array.fill(w * h * channels)(rnd.nextInt(if (depth16) 65536 else 256))
      val pix = (x: Int, y: Int) =>
        Array.tabulate(channels)(k => content((y * w + x) * channels + k))
      val png = mkAdam7Png(w, h, colorType, if (depth16) 16 else 8, pix)
      val img = ImageCodec.decodePngPixels(png)
        .getOrElse(fail(s"trial $trial ${w}x$h type $colorType d16=$depth16: no decode"))
      assert(img.width == w && img.height == h && img.channels == channels)
      val expected = content.map(v => (if (depth16) v >>> 8 else v).toByte).toSeq
      assert(img.pixels.toSeq == expected,
        s"trial $trial ${w}x$h type $colorType d16=$depth16")
    }
    // paletted: depths 1/2/4/8, random palettes — per-pass padding bits
    for (trial <- 0 until 20) {
      val w = 1 + rnd.nextInt(20); val h = 1 + rnd.nextInt(20)
      val depth = Seq(1, 2, 4, 8)(rnd.nextInt(4))
      val nColors = math.min(1 << depth, 32)
      val colors = Array.fill(nColors)((rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
      val idx = Array.fill(w * h)(rnd.nextInt(nColors))
      val png = mkAdam7Png(w, h, 3, depth, (x, y) => Array(idx(y * w + x)), colors)
      val img = ImageCodec.decodePngPixels(png)
        .getOrElse(fail(s"trial $trial ${w}x$h depth $depth: no decode"))
      assert(img.width == w && img.height == h && img.channels == 3)
      val expected = idx.flatMap { i =>
        val (r, g, b) = colors(i); Seq(r.toByte, g.toByte, b.toByte)
      }.toSeq
      assert(img.pixels.toSeq == expected, s"trial $trial ${w}x$h depth $depth")
    }
  }

  test("PNG decoder never throws on corrupt or random input (fuzz)") {
    val rnd = new scala.util.Random(20260812)
    // pure random blobs with a PNG signature spliced in front
    for (_ <- 0 until 200) {
      val blob = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(blob)
      ImageCodec.decodePngPixels(ImageCodec.PngSig ++ blob) // must not throw
      ImageCodec.decodeMeta(blob)                           // must not throw
    }
    // structured corruption: single-byte mutations of valid streams of
    // every supported shape — decode must return SOMETHING without
    // throwing (either None or a raster) for every mutation position
    val fixtures = Seq(
      ImageCodec.encodePng(4, 4, 3, Array.tabulate(48)(_.toByte)),
      mkPalettePng(4, 3, Array((1, 2, 3), (4, 5, 6)),
        Array.tabulate(12)(i => (i % 2).toByte), Array(0, 1, 2), depth = 2),
      mk16Png(3, 2, 0, Array(1000, 2000, 3000, 4000, 5000, 6000), Array(0, 1)),
      mkAdam7Png(5, 3, 2, 8, (x, y) => Array(x, y, x + y)))
    for (fx <- fixtures; pos <- 8 until fx.length; delta <- Seq(1, 0x80)) {
      val m = fx.clone(); m(pos) = (m(pos) ^ delta).toByte
      ImageCodec.decodePngPixels(m) // must not throw
    }
  }

  /** Build a 16-bit non-paletted PNG: big-endian two-byte samples (spec
    * 7.1), per-row filters applied BYTE-wise with bpp = channels*2
    * (spec 9.2). `samples` are 0..65535, length w*h*channels. */
  private def mk16Png(w: Int, h: Int, colorType: Int, samples: Array[Int],
                      filters: Array[Int]): Array[Byte] = {
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      o.write(be32(data.length)); o.write(tag.getBytes("US-ASCII")); o.write(data)
      val crc = new CRC32(); crc.update(tag.getBytes("US-ASCII")); crc.update(data)
      o.write(be32(crc.getValue.toInt)); o.toByteArray
    }
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
    }
    val stride = w * channels * 2
    val bpp = channels * 2
    val plain = new Array[Byte](h * stride)
    for (i <- samples.indices) {
      plain(i * 2) = ((samples(i) >>> 8) & 0xff).toByte
      plain(i * 2 + 1) = (samples(i) & 0xff).toByte
    }
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val raw = new Array[Byte](h * (1 + stride))
    for (r <- 0 until h) {
      raw(r * (1 + stride)) = filters(r).toByte
      for (c <- 0 until stride) {
        val x = plain(r * stride + c) & 0xff
        val a = if (c >= bpp) plain(r * stride + c - bpp) & 0xff else 0
        val b = if (r > 0) plain((r - 1) * stride + c) & 0xff else 0
        val d = if (r > 0 && c >= bpp) plain((r - 1) * stride + c - bpp) & 0xff else 0
        val enc = filters(r) match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - ((a + b) >> 1)
          case 4 => x - paeth(a, b, d)
        }
        raw(r * (1 + stride) + 1 + c) = (enc & 0xff).toByte
      }
    }
    val defl = new Deflater(); defl.setInput(raw); defl.finish()
    val buf = new Array[Byte](raw.length + 64)
    val zl = defl.deflate(buf); defl.end()
    val ihdr = new ByteArrayOutputStream()
    ihdr.write(be32(w)); ihdr.write(be32(h)); ihdr.write(16)
    ihdr.write(colorType); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    val out = new ByteArrayOutputStream()
    out.write(ImageCodec.PngSig)
    out.write(chunk("IHDR", ihdr.toByteArray))
    out.write(chunk("IDAT", java.util.Arrays.copyOf(buf, zl)))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  test("16-bit grayscale decodes to the high byte of each big-endian sample") {
    // Values chosen so truncation is visible: 0x1234 -> 0x12, 0x00ff -> 0x00
    // (low byte alone must NOT leak through), 0xff00 -> 0xff.
    val samples = Array(0x1234, 0x00ff, 0xff00, 0x8001, 0x7fff, 0x0000)
    val png = mk16Png(3, 2, 0, samples, Array(0, 2))
    val img = ImageCodec.decodePngPixels(png)
      .getOrElse(fail("16-bit grayscale PNG did not decode"))
    assert(img.width == 3 && img.height == 2 && img.channels == 1)
    assert(img.pixels.toSeq ==
      Seq(0x12, 0x00, 0xff, 0x80, 0x7f, 0x00).map(_.toByte))
    // decodeMeta sees the same geometry from the header alone
    assert(ImageCodec.decodeMeta(png) == ImageCodec.ImageMeta("image/png", 3, 2, 1))
  }

  test("16-bit RGB filters reconstruct at two-byte bpp (Sub/Avg/Paeth rows)") {
    // A gradient makes every filter's prediction non-trivial; exercising
    // filters 1/3/4 catches a decoder that used channels instead of
    // channels*2 as the left-neighbor distance.
    val w = 4; val h = 4; val channels = 3
    val samples = Array.tabulate(w * h * channels)(i => (i * 4099 + 257) % 65536)
    val png = mk16Png(w, h, 2, samples, Array(1, 3, 4, 1))
    val img = ImageCodec.decodePngPixels(png)
      .getOrElse(fail("16-bit RGB PNG did not decode"))
    assert(img.width == w && img.height == h && img.channels == 3)
    assert(img.pixels.toSeq == samples.map(s => ((s >>> 8) & 0xff).toByte).toSeq)
  }

  test("16-bit RGBA flows through resize on the truncated 8-bit raster") {
    val w = 8; val h = 8
    val samples = Array.tabulate(w * h * 4)(i => (i * 1021) % 65536)
    val png = mk16Png(w, h, 6, samples, Array.fill(h)(2))
    val img = ImageCodec.decodePngPixels(png).getOrElse(fail("no decode"))
    assert(img.channels == 4)
    val thumb = ImageCodec.resizeNearest(img, 4, 4)
    assert(thumb.width == 4 && thumb.height == 4 && thumb.channels == 4)
    // nearest-neighbor picks source pixel (2r, 2c); its high bytes must
    // appear verbatim in the thumb
    val srcPix = (r: Int, c: Int, k: Int) =>
      ((samples((2 * r * w + 2 * c) * 4 + k) >>> 8) & 0xff).toByte
    for (r <- 0 until 4; c <- 0 until 4; k <- 0 until 4)
      assert(thumb.pixels((r * 4 + c) * 4 + k) == srcPix(r, c, k), s"($r,$c,$k)")
  }

  test("palette corruption degrades: out-of-range index or missing PLTE") {
    val colors = Array((10, 20, 30), (40, 50, 60))
    val bad = mkPalettePng(2, 1, colors, Array[Byte](0, 5), Array(0)) // index 5 > palette
    assert(ImageCodec.decodePngPixels(bad).isEmpty)
    val good = mkPalettePng(2, 1, colors, Array[Byte](0, 1), Array(0))
    // strip the PLTE chunk (starts after sig+IHDR=33; PLTE is 12+6 bytes)
    val noPlte = good.take(33) ++ good.drop(33 + 18)
    assert(ImageCodec.decodePngPixels(noPlte).isEmpty) // type 3 requires PLTE
    assert(ImageCodec.decodePngPixels(good).nonEmpty)
  }

  test("palette media flows through the Spark frame/thumbnail plumbing") {
    val s = spark
    import s.implicits._
    val colors = Array((9, 9, 9), (200, 100, 50))
    val indices = Array.tabulate(8 * 8)(i => (i % 2).toByte)
    val png = mkPalettePng(8, 8, colors, indices, Array.fill(8)(0))
    val df = Seq((77L, png)).toDF("doc_id", "media")
    val frames = MultimodalOps.sampleFrames(df, stride = 4, maxFrames = 2).collect()
    assert(frames.length == 2 && frames.forall(_.frame_len == 8 * 3)) // RGB bands
    val thumbs = MultimodalOps.resizeThumb(df, 4, 4).collect()
    assert(thumbs.length == 1 && thumbs.head.channels == 3)
    val back = ImageCodec.decodePngPixels(thumbs.head.thumb).get
    assert(back.width == 4 && back.height == 4 && back.channels == 3)
  }

  test("nearest-neighbor resize picks the spec'd source pixels") {
    // 4x4 grayscale with distinct values; downscale to 2x2 → rows/cols 0,2
    val src = Array.tabulate(16)(i => i.toByte)
    val img = ImageCodec.Image(4, 4, 1, src)
    val t = ImageCodec.resizeNearest(img, 2, 2)
    assert(t.pixels.toSeq == Seq[Byte](0, 2, 8, 10))
    // upscale 2x2 → 4x4 replicates each pixel 2x2
    val up = ImageCodec.resizeNearest(ImageCodec.Image(2, 2, 1, Array[Byte](1, 2, 3, 4)), 4, 4)
    assert(up.pixels.toSeq == Seq[Byte](1, 1, 2, 2, 1, 1, 2, 2, 3, 3, 4, 4, 3, 3, 4, 4))
  }

  // ----- Spark operators ----------------------------------------------

  test("withMediaPayload emits real containers; decodeMeta recovers planted dims") {
    val metas = MultimodalOps.decodeMeta(MultimodalOps.withMediaPayload(docs))
      .collect().map(m => m.doc_id -> m).toMap
    for (id <- Seq(1L, 2L, 3L, 6L)) {
      val (w, h) = MultimodalOps.plantedDims(id)
      val m = metas(id)
      assert(m.width == w && m.height == h, s"doc $id dims")
      assert(m.channels == MultimodalOps.plantedChannels(id), s"doc $id channels")
      assert(m.format == (if (id % 3 == 0) "image/jpeg" else "image/png"), s"doc $id format")
      if (id % 3 == 0) assert(m.byte_len == 41)
      else assert(m.byte_len == 68 + h * (1 + w * m.channels))
    }
  }

  test("frame bands carry the actual tiled text pixels") {
    val frames = MultimodalOps.sampleFrames(MultimodalOps.withMediaPayload(docs))
      .collect().groupBy(_.doc_id)
    assert(!frames.contains(3L)) // doc 3 is a JPEG shell → no pixel codec → skipped
    val (w1, h1) = MultimodalOps.plantedDims(1L)
    val ch1 = MultimodalOps.plantedChannels(1L)
    val f1 = frames(1L).sortBy(_.frame_idx)
    assert(f1.length == math.min(8, (h1 - 1) / 8 + 1))
    assert(f1.forall(_.frame_len == w1 * ch1))
    // frame 0 is pixel row 0 = the first w*ch bytes of the tiled text
    val tb = ("abcd" * 100).getBytes("UTF-8")
    val expected = Array.tabulate(w1 * ch1)(i => tb(i % tb.length))
    assert(f1.head.frame_bytes.toSeq == expected.toSeq)
  }

  test("thumbnails are real 16x16 PNGs with the closed-form size") {
    val thumbs = MultimodalOps.resizeThumb(MultimodalOps.withMediaPayload(docs))
      .collect().map(t => t.doc_id -> t).toMap
    assert(!thumbs.contains(3L)) // JPEG shell skipped
    for ((id, t) <- thumbs) {
      val expectLen = 68 + 16 * (1 + 16 * t.channels)
      assert(t.thumb_len == expectLen && t.thumb.length == expectLen, s"doc $id")
      val back = ImageCodec.decodePngPixels(t.thumb).get
      assert(back.width == 16 && back.height == 16 && back.channels == t.channels)
      val (w, h) = MultimodalOps.plantedDims(id)
      assert(t.src_width == w && t.src_height == h)
    }
    // determinism
    val again = MultimodalOps.resizeThumb(MultimodalOps.withMediaPayload(docs))
      .collect().map(t => t.doc_id -> t).toMap
    assert(thumbs(1L).thumb.toSeq == again(1L).thumb.toSeq)
  }

  test("mediaMeta reports raw ingest byte length and md5") {
    val rows = MultimodalOps.mediaMeta(docs).collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Long]("byte_len") == 400L)
    assert(rows(2L).getAs[Long]("byte_len") == 2L)
  }
}
