package graft.functions

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Inflater}

/** Minimal but REAL image codec for the multimodal pipeline: encodes and
  * decodes actual PNG streams (ISO/IEC 15948 / W3C PNG spec — signature,
  * IHDR/IDAT/IEND chunks with CRC-32, zlib-wrapped scanlines, filter types
  * 0–4 incl. Paeth) and parses real JPEG headers (ITU-T T.81 §B.2 marker
  * segments, SOFn frame dims). Everything here is a pure function of the
  * input bytes — deterministic, executor-side, no native libraries.
  *
  * The zlib stream is written with *stored* (uncompressed) deflate blocks so
  * the encoded size is an exact arithmetic function of the dimensions
  * (`2 + 5·ceil(n/65535) + n + 4` for `n` raw bytes) — which is what lets the
  * correctness gate's SQL oracle recompute `byte_len` independently. Decoding
  * uses `java.util.zip.Inflater`, so any spec-conformant zlib stream (not
  * just our stored-block encoder's output) inflates correctly.
  *
  * Reference context: trend-o-meter has no media path at all; this implements
  * the multimodal north-star obligation from public format specs only.
  */
object ImageCodec {

  /** PNG file signature (spec §5.2). */
  val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** Header-level metadata a catalog scan needs. `channels == 0` with format
    * "image/jpeg" means a JPEG stream that ended before any SOF marker. */
  final case class ImageMeta(format: String, width: Int, height: Int, channels: Int)

  /** Fully decoded raster: interleaved 8-bit samples, row-major. */
  final case class Image(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  val FormatUnknown = "application/octet-stream"

  /** Decode-side sanity bounds (decompression-bomb guard): reject declared
    * rasters wider/taller than this, or whose filtered byte size exceeds
    * [[MaxDecodeBytes]], before allocating anything. Header-only parsing
    * ([[decodeMeta]]) is unaffected — it allocates nothing. */
  val MaxDecodeDim: Int = 1 << 14        // 16384 px per side
  val MaxDecodeBytes: Long = 1L << 28    // 256 MiB of raw scanline bytes

  // ---------------------------------------------------------------- helpers

  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def readBe32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def readBe16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** One PNG chunk: length, type, data, CRC-32 over type+data (spec §5.3). */
  private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length + 12)
    out.write(be32(data.length), 0, 4)
    val tb = tag.getBytes("US-ASCII")
    out.write(tb, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(tb)
    crc.update(data)
    out.write(be32(crc.getValue.toInt), 0, 4)
    out.toByteArray
  }

  /** zlib stream (RFC 1950) holding `data` in stored deflate blocks
    * (RFC 1951 §3.2.4): byte-deterministic and size-predictable. */
  private def zlibStored(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length + 16)
    out.write(0x78); out.write(0x01) // CMF/FLG: deflate, 32K window; (0x7801 % 31 == 0)
    if (data.isEmpty) {
      out.write(0x01); out.write(0x00); out.write(0x00); out.write(0xff); out.write(0xff)
    }
    var off = 0
    while (off < data.length) {
      val n = math.min(65535, data.length - off)
      val fin = if (off + n >= data.length) 1 else 0
      out.write(fin)
      out.write(n & 0xff); out.write((n >>> 8) & 0xff)
      out.write(~n & 0xff); out.write((~n >>> 8) & 0xff)
      out.write(data, off, n)
      off += n
    }
    // Adler-32 (RFC 1950 §2.2) over the uncompressed bytes.
    var a = 1
    var b = 0
    var i = 0
    while (i < data.length) {
      a = (a + (data(i) & 0xff)) % 65521
      b = (b + a) % 65521
      i += 1
    }
    out.write(be32((b << 16) | a), 0, 4)
    out.toByteArray
  }

  private def channelsOfColorType(colorType: Int): Int = colorType match {
    case 0 => 1 // grayscale
    case 2 => 3 // truecolor
    case 3 => 1 // palette (one index sample per pixel)
    case 4 => 2 // grayscale + alpha
    case 6 => 4 // truecolor + alpha
    case _ => 0
  }

  // ----------------------------------------------------------------- encode

  /** Encode an 8-bit grayscale (channels=1) or RGB (channels=3) raster as a
    * real PNG: signature + IHDR + one IDAT (filter type 0 per scanline,
    * zlib stored blocks) + IEND. Total size for a single-block payload is
    * exactly `68 + height·(1 + width·channels)` bytes. */
  def encodePng(width: Int, height: Int, channels: Int, pixels: Array[Byte]): Array[Byte] = {
    require(channels == 1 || channels == 3, s"encoder supports gray/RGB, got $channels channels")
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(
      pixels.length == width * height * channels,
      s"pixel buffer ${pixels.length} != $width*$height*$channels")
    val colorType = if (channels == 1) 0 else 2
    val ihdr = new ByteArrayOutputStream(13)
    ihdr.write(be32(width), 0, 4)
    ihdr.write(be32(height), 0, 4)
    ihdr.write(8)         // bit depth
    ihdr.write(colorType) // color type
    ihdr.write(0); ihdr.write(0); ihdr.write(0) // compression, filter, interlace
    val stride = width * channels
    val raw = new Array[Byte](height * (1 + stride))
    var r = 0
    while (r < height) {
      raw(r * (1 + stride)) = 0 // filter type None; codec still decodes 1–4
      System.arraycopy(pixels, r * stride, raw, r * (1 + stride) + 1, stride)
      r += 1
    }
    val out = new ByteArrayOutputStream(raw.length + 80)
    out.write(PngSig, 0, 8)
    val h = chunk("IHDR", ihdr.toByteArray); out.write(h, 0, h.length)
    val d = chunk("IDAT", zlibStored(raw)); out.write(d, 0, d.length)
    val e = chunk("IEND", Array.emptyByteArray); out.write(e, 0, e.length)
    out.toByteArray
  }

  /** Minimal real JPEG header stream: SOI, JFIF APP0, baseline SOF0 carrying
    * the frame dimensions/components, EOI (ITU-T T.81 §B.2.2). No
    * entropy-coded scan — this is the header-metadata portion a catalog
    * decode reads; pixel decode of JPEG scans needs a DCT/Huffman codec and
    * is out of scope (PNG is the pixel path). Size is exactly
    * `24 + 8 + 3·ncomp` bytes (41 for ncomp=3). */
  def encodeJpegShell(width: Int, height: Int, ncomp: Int = 3): Array[Byte] = {
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff, s"bad dims ${width}x$height")
    require(ncomp >= 1 && ncomp <= 4, s"bad component count $ncomp")
    val out = new ByteArrayOutputStream(48)
    out.write(0xFF); out.write(0xD8) // SOI
    out.write(0xFF); out.write(0xE0) // APP0
    out.write(0x00); out.write(16)   // segment length (incl. these 2 bytes)
    out.write('J'); out.write('F'); out.write('I'); out.write('F'); out.write(0)
    out.write(1); out.write(1)       // JFIF version 1.1
    out.write(0)                     // density units: none
    out.write(0); out.write(1); out.write(0); out.write(1) // aspect 1:1
    out.write(0); out.write(0)       // no embedded thumbnail
    out.write(0xFF); out.write(0xC0) // SOF0 (baseline DCT)
    val len = 8 + 3 * ncomp
    out.write((len >>> 8) & 0xff); out.write(len & 0xff)
    out.write(8)                     // sample precision
    out.write((height >>> 8) & 0xff); out.write(height & 0xff)
    out.write((width >>> 8) & 0xff); out.write(width & 0xff)
    out.write(ncomp)
    var c = 0
    while (c < ncomp) {
      out.write(c + 1)  // component id
      out.write(0x11)   // 1x1 sampling
      out.write(0)      // quant table 0
      c += 1
    }
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  // ----------------------------------------------------------------- decode

  private def isPng(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && java.util.Arrays.equals(
      java.util.Arrays.copyOf(bytes, 8), PngSig)

  private def isJpeg(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xff) == 0xFF && (bytes(1) & 0xff) == 0xD8

  /** Parse format + dimensions + channel count from real container headers:
    * PNG IHDR (must be the first chunk, spec §11.2.1) or the first JPEG SOFn
    * segment found by marker scanning. Unknown/corrupt input yields
    * `ImageMeta(FormatUnknown, 0, 0, 0)` rather than throwing — a 100 TB
    * scan must not die on one bad blob. */
  def decodeMeta(bytes: Array[Byte]): ImageMeta = {
    if (isPng(bytes)) {
      if (bytes.length < 26 || readBe32(bytes, 8) != 13 ||
        bytes(12) != 'I' || bytes(13) != 'H' || bytes(14) != 'D' || bytes(15) != 'R')
        ImageMeta(FormatUnknown, 0, 0, 0)
      else {
        val w = readBe32(bytes, 16)
        val h = readBe32(bytes, 20)
        val ch = channelsOfColorType(bytes(25) & 0xff)
        if (w <= 0 || h <= 0 || ch == 0) ImageMeta(FormatUnknown, 0, 0, 0)
        else ImageMeta("image/png", w, h, ch)
      }
    } else if (isJpeg(bytes)) {
      var i = 2
      while (i + 1 < bytes.length) {
        if ((bytes(i) & 0xff) != 0xFF) return ImageMeta(FormatUnknown, 0, 0, 0)
        val m = bytes(i + 1) & 0xff
        if (m == 0xFF) { i += 1 } // fill byte (T.81 §B.1.1.2)
        else if (m == 0xD8 || m == 0x01 || (m >= 0xD0 && m <= 0xD7)) { i += 2 } // standalone
        else if (m == 0xD9) return ImageMeta("image/jpeg", 0, 0, 0) // EOI before any SOF
        else {
          if (i + 3 >= bytes.length) return ImageMeta(FormatUnknown, 0, 0, 0)
          val len = readBe16(bytes, i + 2)
          // Long arithmetic for the same reason as the PNG chunk walk: near
          // Int.MaxValue-sized blobs must degrade, not overflow the bound.
          if (len < 2 || i.toLong + 2L + len > bytes.length) return ImageMeta(FormatUnknown, 0, 0, 0)
          if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) { // SOFn
            if (len < 8) return ImageMeta(FormatUnknown, 0, 0, 0)
            val h = readBe16(bytes, i + 5)
            val w = readBe16(bytes, i + 7)
            val nc = bytes(i + 9) & 0xff
            return ImageMeta("image/jpeg", w, h, nc)
          }
          if (m == 0xDA) return ImageMeta("image/jpeg", 0, 0, 0) // scan before SOF: malformed
          i += 2 + len
        }
      }
      ImageMeta("image/jpeg", 0, 0, 0)
    } else ImageMeta(FormatUnknown, 0, 0, 0)
  }

  /** Fully decode a non-interlaced PNG (color types 0/2/3/4/6) to raw
    * interleaved samples: walk chunks, inflate the concatenated IDAT
    * stream with `java.util.zip.Inflater`, undo scanline filters 0–4
    * (spec §9). Indexed-color images (type 3) are expanded through their
    * PLTE chunk (spec §11.2.3) to a 3-channel RGB raster — the decoded
    * shape downstream consumers expect — including the PACKED sub-8-bit
    * palette depths (1/2/4 bits per index, several pixels per scanline
    * byte, leftmost pixel in the high-order bits — spec §7.2). 16-bit
    * depths (non-paletted types only — 16-bit type 3 is invalid per spec
    * §11.2.2) unfilter at the full two-byte sample width (bpp doubles,
    * spec §9.2) and then reduce each big-endian sample to its HIGH byte:
    * the exact 16→8-bit truncation, keeping the output raster one byte
    * per sample for every downstream consumer. Adam7-interlaced images
    * (spec §8.2) decode as seven reduced sub-images — each pass has its
    * own scanlines, filter bytes, and (for packed depths) row padding —
    * whose pixels scatter back to the full raster on the 8×8 pass grid.
    * Returns None for anything this decoder doesn't cover (sub-8-bit
    * NON-paletted grayscale, truncated/corrupt streams, out-of-range
    * palette indices, non-PNG input). */
  def decodePngPixels(bytes: Array[Byte]): Option[Image] = {
    if (!isPng(bytes)) return None
    var width = 0
    var height = 0
    var channels = 0
    var depth = 0
    var paletted = false
    var palette: Array[Byte] = null
    var interlaced = false
    var ok = false
    val idat = new ByteArrayOutputStream()
    var i = 8
    var done = false
    while (!done && i + 8 <= bytes.length) {
      val len = readBe32(bytes, i)
      // Bound check in LONG arithmetic: a crafted chunk length near 2^31
      // would overflow `i + 12 + len` to negative in int math, bypass the
      // check, and throw out of the never-throw degradation contract.
      if (len < 0 || i.toLong + 12L + len > bytes.length) return None
      val tag = new String(bytes, i + 4, 4, "US-ASCII")
      tag match {
        case "IHDR" =>
          if (len != 13) return None
          width = readBe32(bytes, i + 8)
          height = readBe32(bytes, i + 12)
          val bitDepth = bytes(i + 16) & 0xff
          val colorType = bytes(i + 17) & 0xff
          val interlace = bytes(i + 20) & 0xff
          paletted = colorType == 3
          channels = channelsOfColorType(colorType)
          depth = bitDepth
          // Dimension sanity cap BEFORE any allocation: a ~100-byte blob
          // declaring 16000x16000x4 would otherwise allocate ~1 GB twice
          // over before inflate even fails — a decompression-bomb shape on
          // untrusted input. Real corpus thumbnails/pages sit far below
          // 2^14 per side; wider rasters must go through a chunked reader.
          val depthOk = bitDepth == 8 ||
            (bitDepth == 16 && !paletted) ||
            (paletted && (bitDepth == 1 || bitDepth == 2 || bitDepth == 4))
          interlaced = interlace == 1
          ok = depthOk && (interlace == 0 || interlace == 1) && channels > 0 &&
            width > 0 && height > 0 && width <= MaxDecodeDim && height <= MaxDecodeDim
        case "PLTE" =>
          // Palette: 1..256 RGB triples, must precede IDAT (spec §5.6).
          if (len % 3 != 0 || len == 0 || len > 3 * 256 || idat.size() > 0) return None
          palette = java.util.Arrays.copyOfRange(bytes, i + 8, i + 8 + len)
        case "IDAT" => idat.write(bytes, i + 8, len)
        case "IEND" => done = true
        case _      => () // ancillary chunk: skip
      }
      i += 12 + len
    }
    if (!ok || idat.size() == 0) return None
    if (paletted && palette == null) return None // type 3 REQUIRES a PLTE (spec §5.6)
    // Scanline byte width for a row of `pw` pixels at this depth/type.
    def strideOf(pw: Int): Int =
      if (depth == 16) pw * channels * 2
      else if (depth == 8) pw * channels
      else (pw * depth + 7) / 8
    // Filters operate on BYTES: for packed depths bpp is one byte (spec
    // §9.2 — "bpp is rounded up to one"), so a/b/c neighbors are the
    // previous scanline byte, not the previous pixel; for 16-bit samples
    // it DOUBLES — the left neighbor of a sample's high byte is the
    // previous pixel's high byte, two channels-widths away.
    val bpp =
      if (depth == 16) channels * 2 else if (depth == 8) channels else 1

    // Decode is pass-based: a non-interlaced image is ONE full-size pass;
    // Adam7 (spec §8.2) is seven reduced sub-images on the 8×8 grid, each
    // with its own scanlines + filter bytes (and, packed, row padding),
    // scattered back by (xstart, ystart, xstep, ystep). Empty passes
    // (dimension smaller than the pass offset) contribute zero bytes.
    val passes: Array[(Int, Int, Int, Int)] =
      if (!interlaced) Array((0, 0, 1, 1))
      else Array((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    val passDims = passes.map { case (xs, ys, xstep, ystep) =>
      val pw = if (width > xs) (width - xs + xstep - 1) / xstep else 0
      val ph = if (height > ys) (height - ys + ystep - 1) / ystep else 0
      (pw, ph)
    }
    // With dims capped at MaxDecodeDim and channels <= 4, strides fit int
    // comfortably; the byte caps still bound the worst-case allocations —
    // BOTH the filtered scanline buffer and the palette-expanded raster
    // (w·h indices → ×3 RGB), which for packed depths is the larger one.
    val rawLen = passDims.map { case (pw, ph) =>
      if (pw == 0 || ph == 0) 0L else ph.toLong * (1L + strideOf(pw))
    }.sum
    val expandedLen = width.toLong * height * (if (paletted) 3 else channels)
    if (rawLen == 0 || rawLen > MaxDecodeBytes || expandedLen > MaxDecodeBytes)
      return None
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        got += n
      }
      if (got < raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()

    // Fast path for the dominant shape (sequential 8-bit non-paletted):
    // the unfiltered buffer IS the raster — no scatter pass, no copy.
    if (!interlaced && !paletted && depth == 8)
      return unfilter(raw, 0, height, strideOf(width), bpp)
        .map(Image(width, height, channels, _))

    // General path: unfilter each pass, scatter its pixels into the full
    // raster — one OUTPUT byte per sample (16-bit reduces to the high
    // byte of each big-endian sample, spec §7.1) or one index byte per
    // pixel for paletted input (expanded through the PLTE at the end).
    val outPerPixel = if (paletted) 1 else channels
    val plain = new Array[Byte](width * height * outPerPixel)
    val mask = (1 << depth) - 1
    val perByte = if (depth < 8) 8 / depth else 1
    var off = 0
    var p = 0
    while (p < passes.length) {
      val (xs, ys, xstep, ystep) = passes(p)
      val (pw, ph) = passDims(p)
      if (pw > 0 && ph > 0) {
        val strideP = strideOf(pw)
        unfilter(raw, off, ph, strideP, bpp) match {
          case None => return None
          case Some(rows) =>
            var r = 0
            while (r < ph) {
              val y = ys + r.toLong * ystep // long: no overflow near caps
              var c = 0
              while (c < pw) {
                val x = xs + c * xstep
                val outBase = (y * width + x).toInt * outPerPixel
                if (paletted) {
                  val idx =
                    if (depth == 8) rows(r * strideP + c) & 0xff
                    else {
                      val shift = 8 - depth * (c % perByte + 1)
                      ((rows(r * strideP + c / perByte) & 0xff) >>> shift) & mask
                    }
                  plain(outBase) = idx.toByte
                } else if (depth == 16) {
                  var k = 0
                  while (k < channels) {
                    plain(outBase + k) = rows(r * strideP + (c * channels + k) * 2)
                    k += 1
                  }
                } else {
                  var k = 0
                  while (k < channels) {
                    plain(outBase + k) = rows(r * strideP + c * channels + k)
                    k += 1
                  }
                }
                c += 1
              }
              r += 1
            }
        }
        off += ph * (1 + strideP)
      }
      p += 1
    }
    if (!paletted) Some(Image(width, height, channels, plain))
    else expandPalette(plain, palette).map(Image(width, height, 3, _))
  }

  /** Expand 8-bit palette indices through a PLTE table to interleaved RGB;
    * an index beyond the palette is corrupt input (spec §11.2.3) and
    * degrades to None like every other malformed shape. */
  private def expandPalette(indices: Array[Byte], plte: Array[Byte]): Option[Array[Byte]] = {
    val n = plte.length / 3
    val out = new Array[Byte](indices.length * 3)
    var p = 0
    while (p < indices.length) {
      val idx = indices(p) & 0xff
      if (idx >= n) return None
      out(p * 3) = plte(idx * 3)
      out(p * 3 + 1) = plte(idx * 3 + 1)
      out(p * 3 + 2) = plte(idx * 3 + 2)
      p += 1
    }
    Some(out)
  }

  /** Undo PNG scanline filters (spec §9): each row starts with a filter-type
    * byte; reconstruct with left (a), up (b), up-left (c) neighbors.
    * `off` is where this (sub-)image's scanlines begin in `raw` — pass
    * blocks of an interlaced stream unfilter independently (the first row
    * of every pass has no `up` neighbor). `stride` is the scanline width
    * in BYTES (packed depths round up); `bpp` is the filter's byte
    * distance to the left neighbor (channels for 8-bit samples, ×2 for
    * 16-bit, 1 for packed). */
  private def unfilter(raw: Array[Byte], off: Int, height: Int, stride: Int,
                       bpp: Int): Option[Array[Byte]] = {
    val out = new Array[Byte](height * stride)
    var r = 0
    while (r < height) {
      val ft = raw(off + r * (1 + stride)) & 0xff
      if (ft > 4) return None
      var c = 0
      while (c < stride) {
        val x = raw(off + r * (1 + stride) + 1 + c) & 0xff
        val a = if (c >= bpp) out(r * stride + c - bpp) & 0xff else 0
        val b = if (r > 0) out((r - 1) * stride + c) & 0xff else 0
        val d = if (r > 0 && c >= bpp) out((r - 1) * stride + c - bpp) & 0xff else 0
        val v = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + ((a + b) >> 1)
          case 4 => x + paeth(a, b, d)
        }
        out(r * stride + c) = (v & 0xff).toByte
        c += 1
      }
      r += 1
    }
    Some(out)
  }

  /** Paeth predictor (PNG spec §9.4). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Nearest-neighbor resample on real decoded pixels. */
  def resizeNearest(img: Image, newW: Int, newH: Int): Image = {
    require(newW > 0 && newH > 0, s"bad target dims ${newW}x$newH")
    val out = new Array[Byte](newW * newH * img.channels)
    var r = 0
    while (r < newH) {
      val sr = (r.toLong * img.height / newH).toInt
      var c = 0
      while (c < newW) {
        val sc = (c.toLong * img.width / newW).toInt
        var k = 0
        while (k < img.channels) {
          out((r * newW + c) * img.channels + k) =
            img.pixels((sr * img.width + sc) * img.channels + k)
          k += 1
        }
        c += 1
      }
      r += 1
    }
    Image(newW, newH, img.channels, out)
  }
}
