package graft

import graft.functions.{BmpCodec, PngCodec, WavCodec}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the q473 image-decode kernel beyond what the oracle can see: the
  * oracle hash-checks header metadata + channel means arithmetically, but
  * only against payloads the SAME codec produced — these tests decode a
  * BMP built BY HAND (bytes written out literally, not via encode), so an
  * encoder/decoder bug pair that cancels out cannot hide.
  */
class MultimodalSpec extends AnyFunSuite {

  /** Hand-written 2×2 24-bpp BMP: stride = ((2·3+3)/4)·4 = 8 (2 pad
    * bytes/row), bottom-up rows. Image pixels (x, y) as (B,G,R):
    *   (0,0)=(1,2,3)   (1,0)=(4,5,6)     — image TOP row ⇒ file row 1
    *   (0,1)=(7,8,9)   (1,1)=(10,11,12)  — image BOTTOM row ⇒ file row 0
    */
  private def handBmp: Array[Byte] = {
    val b = new Array[Byte](54 + 16)
    def le32(off: Int, v: Int): Unit = (0 to 3).foreach(i =>
      b(off + i) = ((v >>> (8 * i)) & 0xff).toByte)
    b(0) = 'B'; b(1) = 'M'
    le32(2, 70); le32(10, 54); le32(14, 40); le32(18, 2); le32(22, 2)
    b(26) = 1; b(28) = 24
    le32(34, 16)
    // file row 0 (image y=1): (7,8,9) (10,11,12) + 2 pad
    Array[Int](7, 8, 9, 10, 11, 12, 0, 0).zipWithIndex.foreach {
      case (v, i) => b(54 + i) = v.toByte }
    // file row 1 (image y=0): (1,2,3) (4,5,6) + 2 pad
    Array[Int](1, 2, 3, 4, 5, 6, 0, 0).zipWithIndex.foreach {
      case (v, i) => b(62 + i) = v.toByte }
    b
  }

  test("decode reads dims/bpp/size and channel means from hand-written bytes") {
    val f = BmpCodec.decode(handBmp)
    assert(f.width == 2 && f.height == 2 && f.bpp == 24 && f.nBytes == 70L)
    assert(f.meanB == (1 + 4 + 7 + 10) / 4.0)  // pad bytes NOT counted
    assert(f.meanG == (2 + 5 + 8 + 11) / 4.0)
    assert(f.meanR == (3 + 6 + 9 + 12) / 4.0)
  }

  test("decode rejects non-BMP, size-lying, and truncated payloads loudly") {
    intercept[IllegalArgumentException](BmpCodec.decode("PNG...not a bmp pad pad pad pad pad pad pad".getBytes))
    val lied = handBmp; lied(2) = 99 // header file-size field ≠ payload length
    intercept[IllegalArgumentException](BmpCodec.decode(lied))
    intercept[IllegalArgumentException](BmpCodec.decode(handBmp.take(60)))
  }

  test("encode emits byte-valid BMPs round-trippable for every width mod 4 (padding)") {
    // docIds 0..8 sweep width 8..16 ⇒ strides with 0/1/2/3 pad bytes
    (0L to 8L).foreach { id =>
      val f = BmpCodec.decode(BmpCodec.encode(id))
      assert(f.width == 8 + (id % 9).toInt && f.height == 8 + (id * 3 % 9).toInt, s"doc $id")
      for ((m, c) <- Seq(f.meanB -> "B", f.meanG -> "G", f.meanR -> "R"))
        assert(m >= 0 && m <= 255, s"doc $id channel $c mean $m out of byte range")
    }
    // signed-byte regression guard: pixel values >127 must not sum negative
    val big = BmpCodec.decode(BmpCodec.encode(7L)) // 31·7=217 > 127 at (0,0)
    assert(big.meanB > 0 && big.meanG > 0 && big.meanR > 0)
  }

  // ---- PNG (q475): hand-built payload, independent of PngCodec.encode ----

  /** Reference Paeth predictor, re-implemented here so the test does not
    * share code with the codec under test. */
  private def refPaeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32
    crc.update(t); crc.update(data)
    val c = crc.getValue.toInt
    val len = data.length
    Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte, (len >>> 8).toByte,
      len.toByte) ++ t ++ data ++
      Array[Byte]((c >>> 24).toByte, (c >>> 16).toByte, (c >>> 8).toByte, c.toByte)
  }

  /** Hand-built 2×2 truecolor PNG with known pixels, row 0 filtered Up,
    * row 1 filtered Paeth, ONE IDAT chunk (the codec's encoder always
    * emits two — this proves decode follows the spec, not the encoder).
    * Pixels (R,G,B): (0,0)=(10,20,30) (1,0)=(40,50,60)
    *                 (0,1)=(70,80,90) (1,1)=(15,25,35)
    */
  private def handPng: Array[Byte] = {
    val row0 = Array(10, 20, 30, 40, 50, 60)
    val row1 = Array(70, 80, 90, 15, 25, 35)
    val filtered = new Array[Byte](2 * 7)
    filtered(0) = 2 // Up: above row is zero ⇒ filtered = raw
    row0.indices.foreach(i => filtered(1 + i) = row0(i).toByte)
    filtered(7) = 4 // Paeth vs reconstructed row 0
    row1.indices.foreach { i =>
      val left = if (i >= 3) row1(i - 3) else 0
      val up = row0(i)
      val ul = if (i >= 3) row0(i - 3) else 0
      filtered(8 + i) = ((row1(i) - refPaeth(left, up, ul)) & 0xff).toByte
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(filtered); defl.finish()
    val zbuf = new Array[Byte](256)
    var zn = 0
    while (!defl.finished()) zn += defl.deflate(zbuf, zn, zbuf.length - zn)
    defl.end()
    val ihdr = Array[Byte](0, 0, 0, 2, 0, 0, 0, 2, 8, 2, 0, 0, 0)
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      pngChunk("IHDR", ihdr) ++
      pngChunk("IDAT", java.util.Arrays.copyOf(zbuf, zn)) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  test("png decode reconstructs hand-filtered (Up+Paeth) pixels exactly") {
    val f = PngCodec.decode(handPng)
    assert(f.width == 2 && f.height == 2 && f.bitDepth == 8 && f.colorType == 2)
    assert(f.nChunks == 3 && f.nRawBytes == 14L)
    assert(f.meanR == (10 + 40 + 70 + 15) / 4.0)
    assert(f.meanG == (20 + 50 + 80 + 25) / 4.0)
    assert(f.meanB == (30 + 60 + 90 + 35) / 4.0)
  }

  test("png decode rejects corrupted CRC, truncation, bad signature, interlace loudly") {
    val good = handPng
    val badCrc = good.clone()
    badCrc(good.length - 1) = (badCrc(good.length - 1) ^ 0x5a).toByte // IEND crc
    intercept[IllegalArgumentException](PngCodec.decode(badCrc))
    intercept[IllegalArgumentException](PngCodec.decode(good.take(30)))
    val badSig = good.clone(); badSig(0) = 'X'
    intercept[IllegalArgumentException](PngCodec.decode(badSig))
    val interlaced = good.clone()
    interlaced(8 + 8 + 12) = 1 // IHDR interlace flag (sig + len/typ + 12 data bytes)
    intercept[IllegalArgumentException](PngCodec.decode(interlaced)) // via its now-wrong CRC
  }

  test("png encode/decode round-trips all five filter types and matches closed-form means") {
    (0L to 10L).foreach { id =>
      val f = PngCodec.decode(PngCodec.encode(id))
      val w = (8 + id % 9).toInt; val h = (8 + id * 5 % 9).toInt
      assert(f.width == w && f.height == h, s"doc $id dims")
      assert(f.nChunks == 4, s"doc $id: IHDR + 2 IDAT + IEND expected")
      assert(f.nRawBytes == h.toLong * (1 + 3 * w), s"doc $id raw size")
      // closed-form channel sums, computed arithmetically like the oracle
      def mean(c: Int): Double = {
        var sum = 0L
        for (y <- 0 until h; x <- 0 until w)
          sum += ((31L * id + 7L * x + 13L * y + 97L * c) % 256L).toInt
        sum.toDouble / (w * h)
      }
      assert(f.meanR == mean(0), s"doc $id R")
      assert(f.meanG == mean(1), s"doc $id G")
      assert(f.meanB == mean(2), s"doc $id B")
    }
  }

  // ---- WAV (q476): hand-built payload, independent of WavCodec.encode ----

  /** Hand-built mono PCM16 WAV with the LIST chunk FIRST (before fmt) and
    * samples [1000, -1000, 0, 500]: peak 1000, rms exactly 750.0, one
    * zero crossing. */
  private def handWav: Array[Byte] = {
    def le32(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte,
      (v >>> 16).toByte, (v >>> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)
    val list = "LIST".getBytes("US-ASCII") ++ le32(5) ++
      "INFOx".getBytes("US-ASCII") ++ Array[Byte](0) // odd size ⇒ pad byte
    val data = "data".getBytes("US-ASCII") ++ le32(8) ++
      le16(1000) ++ le16(-1000 & 0xffff) ++ le16(0) ++ le16(500)
    val body = "WAVE".getBytes("US-ASCII") ++ list ++ fmt ++ data
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  test("wav decode parses hand-built bytes: chunk order, odd-chunk padding, exact statistics") {
    val f = WavCodec.decode(handWav)
    assert(f.sampleRate == 8000 && f.channels == 1 && f.bits == 16)
    assert(f.nSamples == 4 && f.durationMs == 0L)
    assert(f.peak == 1000)
    assert(f.rms == 750.0) // sqrt((1e6 + 1e6 + 0 + 25e4) / 4) exactly
    assert(f.zeroCross == 1L) // only 1000 → −1000 strictly crosses
  }

  test("wav decode rejects non-RIFF, stereo, truncated, and non-PCM payloads loudly") {
    intercept[IllegalArgumentException](WavCodec.decode("JUNKJUNKJUNKJUNK".getBytes))
    val stereo = handWav.clone()
    // fmt channel-count field sits 10 bytes into the fmt chunk payload
    val fmtOff = new String(handWav, "ISO-8859-1").indexOf("fmt ")
    stereo(fmtOff + 8 + 2) = 2
    intercept[IllegalArgumentException](WavCodec.decode(stereo))
    intercept[IllegalArgumentException](WavCodec.decode(handWav.take(40)))
    val nonPcm = handWav.clone(); nonPcm(fmtOff + 8) = 3 // IEEE-float format tag
    intercept[IllegalArgumentException](WavCodec.decode(nonPcm))
  }

  test("wav encode/decode round-trips and matches closed-form signal statistics") {
    (0L to 8L).foreach { id =>
      val f = WavCodec.decode(WavCodec.encode(id))
      val n = (200 + id % 100).toInt
      assert(f.sampleRate == 8000 && f.channels == 1 && f.bits == 16, s"doc $id")
      assert(f.nSamples == n && f.durationMs == n.toLong * 1000 / 8000, s"doc $id")
      def s(t: Int): Int = (((31L * id + 17L * t) % 4001L) - 2000L).toInt
      val samples = (0 until n).map(s)
      assert(f.peak == samples.map(math.abs).max, s"doc $id peak")
      val energy = samples.map(v => v.toLong * v).sum
      assert(f.rms == math.sqrt(energy.toDouble / n), s"doc $id rms")
      val zc = samples.sliding(2).count { case Seq(a, b) => a.toLong * b < 0 }
      assert(f.zeroCross == zc.toLong, s"doc $id zero crossings")
    }
  }
}
