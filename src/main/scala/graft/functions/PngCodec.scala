package graft.functions

import java.util.zip.{CRC32, Deflater, Inflater}

/** A REAL PNG codec for the multimodal decode path (q475) — the
  * compressed-format sibling of [[BmpCodec]] (q473). PNG is the one
  * compressed raster format decodable with nothing but the JDK:
  * `java.util.zip.Inflater` IS zlib, and PNG's pixel pipeline on top of
  * it (chunk framing + CRC-32, zlib-wrapped scanlines, five per-row
  * predictor filters) is pure byte arithmetic.
  *
  * [[encode]] emits a byte-valid truecolor PNG: 8-byte signature, IHDR
  * (big-endian fields, bit depth 8, color type 2), the zlib-deflated
  * filtered scanlines split across TWO IDAT chunks (multi-chunk IDAT
  * reassembly is the spec subtlety naive parsers miss), IEND, each chunk
  * CRC-32'd over type+data. Rows cycle through ALL FIVE filter types
  * (y mod 5: None/Sub/Up/Average/Paeth), so a decoder that fumbles any
  * predictor produces wrong pixels. Pixel values are the same
  * closed-form (docId, x, y, channel) family as BmpCodec's, so a SQL
  * oracle recomputes every channel statistic arithmetically.
  *
  * [[decode]] is a genuine parser: it validates the signature, walks the
  * chunk stream verifying EVERY chunk's CRC, parses IHDR (and rejects
  * the PNG features it doesn't support rather than mis-decoding them),
  * reassembles the IDAT stream, inflates it, reverses the per-row filter
  * using the spec's predictors (Paeth included), and accumulates
  * per-channel sums from the reconstructed scanlines. Nothing in the
  * decode path looks at the docId — every output column is read out of
  * the bytes.
  */
object PngCodec {

  /** Decoded features: IHDR metadata + chunk inventory + per-channel
    * pixel means from the reconstructed (post-unfilter) scanlines. */
  final case class PngFeatures(width: Int, height: Int, bitDepth: Int,
      colorType: Int, nChunks: Int, nRawBytes: Long,
      meanR: Double, meanG: Double, meanB: Double)

  private val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Deterministic pixel value; channel c ∈ {0=R, 1=G, 2=B} (PNG
    * truecolor sample order). Same linear-congruential family as
    * [[BmpCodec.pixel]] so the oracle arithmetic stays one idiom. */
  private def pixel(docId: Long, x: Int, y: Int, c: Int): Int =
    (((31L * docId + 7L * x + 13L * y + 97L * c) % 256L).toInt + 256) % 256

  /** PNG's Paeth predictor (left, above, upper-left), RFC 2083 §6.6. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def crcOf(typ: Array[Byte], data: Array[Byte]): Int = {
    val crc = new CRC32
    crc.update(typ); crc.update(data)
    crc.getValue.toInt
  }

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** Synthesize the test asset for `docId`: width 8..16, height 8..16
    * (height ≥ 8 > 5 so every filter type is exercised), truecolor
    * 8-bit, rows filtered with type y%5, two IDAT chunks.
    */
  def encode(docId: Long): Array[Byte] = {
    val w = (8 + docId % 9).toInt
    val h = (8 + (docId * 5) % 9).toInt
    val stride = w * 3
    // raw scanlines, then per-row filtering (filter byte + filtered data)
    val raw = Array.tabulate(h, stride) { (y, i) =>
      pixel(docId, i / 3, y, i % 3)
    }
    val filtered = new Array[Byte](h * (1 + stride))
    var y = 0
    while (y < h) {
      val ft = y % 5
      filtered(y * (1 + stride)) = ft.toByte
      var i = 0
      while (i < stride) {
        val cur = raw(y)(i)
        val left = if (i >= 3) raw(y)(i - 3) else 0
        val up = if (y > 0) raw(y - 1)(i) else 0
        val ul = if (y > 0 && i >= 3) raw(y - 1)(i - 3) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        filtered(y * (1 + stride) + 1 + i) = ((cur - pred) & 0xff).toByte
        i += 1
      }
      y += 1
    }
    // zlib-deflate the filtered stream (PNG requires the zlib wrapper,
    // i.e. nowrap = false — Inflater on the decode side checks it)
    val defl = new Deflater(Deflater.DEFAULT_COMPRESSION, false)
    defl.setInput(filtered); defl.finish()
    val buf = new Array[Byte](filtered.length + 64)
    var zLen = 0
    while (!defl.finished()) zLen += defl.deflate(buf, zLen, buf.length - zLen)
    defl.end()
    val z = java.util.Arrays.copyOf(buf, zLen)

    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val t = typ.getBytes("US-ASCII")
      val len = data.length
      out.write(Array((len >>> 24).toByte, (len >>> 16).toByte,
        (len >>> 8).toByte, len.toByte))
      out.write(t); out.write(data)
      val c = crcOf(t, data)
      out.write(Array((c >>> 24).toByte, (c >>> 16).toByte,
        (c >>> 8).toByte, c.toByte))
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = (w >>> 24).toByte; ihdr(1) = (w >>> 16).toByte
    ihdr(2) = (w >>> 8).toByte; ihdr(3) = w.toByte
    ihdr(4) = (h >>> 24).toByte; ihdr(5) = (h >>> 16).toByte
    ihdr(6) = (h >>> 8).toByte; ihdr(7) = h.toByte
    ihdr(8) = 8    // bit depth
    ihdr(9) = 2    // color type: truecolor
    ihdr(10) = 0   // compression: deflate
    ihdr(11) = 0   // filter method 0
    ihdr(12) = 0   // no interlace
    chunk("IHDR", ihdr)
    // two IDAT chunks: the spec allows the zlib stream split anywhere
    val mid = math.max(1, z.length / 2)
    chunk("IDAT", java.util.Arrays.copyOfRange(z, 0, mid))
    chunk("IDAT", java.util.Arrays.copyOfRange(z, mid, z.length))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Parse a truecolor 8-bit PNG; throws (loudly, with the reason) on
    * anything malformed or unsupported. */
  def decode(bytes: Array[Byte]): PngFeatures = {
    require(bytes.length >= 8 && java.util.Arrays.equals(
      java.util.Arrays.copyOf(bytes, 8), Signature), "not a PNG signature")
    var off = 8
    var width = -1; var height = -1; var bitDepth = -1; var colorType = -1
    var nChunks = 0
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (off < bytes.length && !sawEnd) {
      require(off + 12 <= bytes.length, s"truncated chunk header at $off")
      val len = be32(bytes, off)
      require(len >= 0 && off + 12 + len <= bytes.length,
        s"chunk length $len overruns file at $off")
      val typ = new String(bytes, off + 4, 4, "US-ASCII")
      val data = java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + len)
      val crc = be32(bytes, off + 8 + len)
      val expect = crcOf(
        java.util.Arrays.copyOfRange(bytes, off + 4, off + 8), data)
      require(crc == expect,
        f"CRC mismatch in $typ: stored 0x$crc%08x computed 0x$expect%08x")
      nChunks += 1
      typ match {
        case "IHDR" =>
          require(len == 13, s"IHDR length $len != 13")
          width = be32(data, 0); height = be32(data, 4)
          bitDepth = data(8) & 0xff; colorType = data(9) & 0xff
          require(bitDepth == 8, s"unsupported bit depth $bitDepth")
          require(colorType == 2, s"unsupported color type $colorType")
          require((data(10) & 0xff) == 0, "unsupported compression method")
          require((data(11) & 0xff) == 0, "unsupported filter method")
          require((data(12) & 0xff) == 0, "interlaced PNG unsupported")
        case "IDAT" => idat.write(data)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunk: CRC-checked, skipped
      }
      off += 12 + len
    }
    require(sawEnd, "missing IEND")
    require(width > 0 && height > 0, "missing IHDR")

    // inflate the reassembled zlib stream
    val stride = width * 3
    val nRaw = height.toLong * (1 + stride)
    require(nRaw <= Int.MaxValue, "image too large")
    val filtered = new Array[Byte](nRaw.toInt)
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    while (got < filtered.length && !inf.finished()) {
      val n = inf.inflate(filtered, got, filtered.length - got)
      require(n > 0 || inf.finished(), "truncated IDAT stream")
      got += n
    }
    require(got == filtered.length,
      s"IDAT inflated to $got bytes, expected ${filtered.length}")
    // the stream must be FINISHED at exactly the IHDR-implied byte count
    // (round 13, ADVICE r12): a zlib stream that inflates to MORE data
    // than width/height imply was previously silently truncated, which
    // contradicts the codec's rejects-rather-than-mis-decodes contract —
    // truncated streams were caught, oversized ones were not.
    if (!inf.finished()) {
      val probe = new Array[Byte](1)
      val extra = inf.inflate(probe, 0, 1)
      require(extra == 0 && inf.finished(),
        s"IDAT stream inflates past the ${filtered.length} bytes IHDR implies")
    }
    inf.end()

    // reverse the per-row filter; accumulate channel sums as we go
    val prev = new Array[Int](stride) // reconstructed previous row
    val cur = new Array[Int](stride)
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < height) {
      val ft = filtered(y * (1 + stride)) & 0xff
      require(ft <= 4, s"bad filter type $ft on row $y")
      var i = 0
      while (i < stride) {
        val f = filtered(y * (1 + stride) + 1 + i) & 0xff
        val left = if (i >= 3) cur(i - 3) else 0
        val up = prev(i)
        val ul = if (i >= 3) prev(i - 3) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        val v = (f + pred) & 0xff
        cur(i) = v
        (i % 3: @annotation.switch) match {
          case 0 => sr += v
          case 1 => sg += v
          case 2 => sb += v
        }
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    val nPix = width.toLong * height
    PngFeatures(width, height, bitDepth, colorType, nChunks, nRaw,
      sr.toDouble / nPix, sg.toDouble / nPix, sb.toDouble / nPix)
  }
}
