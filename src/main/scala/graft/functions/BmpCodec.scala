package graft.functions

/** A REAL (if small) image codec for the multimodal decode path (q473):
  * 24-bit uncompressed Windows BMP — the one raster format that needs no
  * external codec library, so the container's no-image-libs constraint
  * (SURVEY §2.B group 10) stops forcing the decode step to be a stub.
  *
  * [[encode]] emits a byte-valid BMP (BITMAPFILEHEADER + 40-byte
  * BITMAPINFOHEADER, little-endian fields, bottom-up rows, rows padded
  * to 4-byte boundaries) whose pixel values are a deterministic function
  * of (docId, x, y, channel) — so a SQL oracle can recompute every
  * channel statistic arithmetically without decoding anything.
  *
  * [[decode]] is a genuine parser: it validates the magic, reads the
  * little-endian header fields (file size, pixel-array offset, width,
  * height, planes, bit depth), derives the padded row stride from the
  * PARSED width, walks the pixel array bottom-up from the PARSED offset,
  * and accumulates per-channel sums. Nothing in the decode path looks at
  * the docId — every output column is read out of the bytes, which is
  * what makes q473's hash-green oracle check evidence that the decoder
  * works rather than a restatement of the generator.
  */
object BmpCodec {

  /** Decoded features: header metadata + per-channel pixel means. */
  final case class ImageFeatures(width: Int, height: Int, bpp: Int,
      nBytes: Long, meanB: Double, meanG: Double, meanR: Double)

  private val HeaderSize = 54 // 14 (file header) + 40 (BITMAPINFOHEADER)

  private def rowStride(width: Int): Int = ((width * 3 + 3) / 4) * 4

  /** Deterministic pixel value: channel c ∈ {0=B, 1=G, 2=R}. */
  private def pixel(docId: Long, x: Int, y: Int, c: Int): Int =
    (((31L * docId + 7L * x + 13L * y + 97L * c) % 256L).toInt + 256) % 256

  /** Synthesize the test asset for `docId`: width 8..16, height 8..16
    * (both mod-9 derived so padding widths are exercised), 24 bpp.
    */
  def encode(docId: Long): Array[Byte] = {
    val w = (8 + docId % 9).toInt
    val h = (8 + (docId * 3) % 9).toInt
    val stride = rowStride(w)
    val size = HeaderSize + stride * h
    val b = new Array[Byte](size)
    def le32(off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte
      b(off + 1) = ((v >>> 8) & 0xff).toByte
      b(off + 2) = ((v >>> 16) & 0xff).toByte
      b(off + 3) = ((v >>> 24) & 0xff).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte
      b(off + 1) = ((v >>> 8) & 0xff).toByte
    }
    b(0) = 'B'; b(1) = 'M'
    le32(2, size)          // file size
    le32(10, HeaderSize)   // pixel-array offset
    le32(14, 40)           // BITMAPINFOHEADER size
    le32(18, w)            // width
    le32(22, h)            // height (positive ⇒ bottom-up rows)
    le16(26, 1)            // planes
    le16(28, 24)           // bits per pixel
    le32(34, stride * h)   // image size
    var j = 0
    while (j < h) {        // file row j holds image row y = h-1-j
      val y = h - 1 - j
      var x = 0
      while (x < w) {
        val off = HeaderSize + j * stride + x * 3
        b(off) = pixel(docId, x, y, 0).toByte
        b(off + 1) = pixel(docId, x, y, 1).toByte
        b(off + 2) = pixel(docId, x, y, 2).toByte
        x += 1
      }
      j += 1
    }
    b
  }

  /** Parse a 24-bpp uncompressed BMP and extract header metadata +
    * per-channel means. Fails loudly on anything it can't decode —
    * a production ingest kernel routes those rows to a quarantine
    * column, never silently zero-fills.
    */
  def decode(b: Array[Byte]): ImageFeatures = {
    require(b.length >= HeaderSize && b(0) == 'B' && b(1) == 'M',
      "not a BMP payload")
    def le32(off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    def le16(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    val fileSize = le32(2)
    val pixOff = le32(10)
    val w = le32(18)
    val h = le32(22)
    val planes = le16(26)
    val bpp = le16(28)
    require(fileSize == b.length,
      s"BMP header claims $fileSize bytes, payload has ${b.length}")
    require(planes == 1 && bpp == 24, s"unsupported BMP: planes=$planes bpp=$bpp")
    require(h > 0, "top-down BMPs (negative height) not supported")
    val stride = rowStride(w)
    require(pixOff + stride.toLong * h <= b.length, "truncated pixel array")
    var sb = 0L; var sg = 0L; var sr = 0L
    var j = 0
    while (j < h) {
      var x = 0
      while (x < w) {
        val off = pixOff + j * stride + x * 3
        sb += (b(off) & 0xff)
        sg += (b(off + 1) & 0xff)
        sr += (b(off + 2) & 0xff)
        x += 1
      }
      j += 1
    }
    val n = w.toLong * h
    ImageFeatures(w, h, bpp, fileSize.toLong,
      sb.toDouble / n, sg.toDouble / n, sr.toDouble / n)
  }
}
