package graft.functions

/** A REAL audio codec for the multimodal decode path (q476): RIFF/WAVE
  * with 16-bit signed little-endian PCM — the audio analogue of
  * [[BmpCodec]]/[[PngCodec]]'s "no external libs needed" formats, and
  * the container format every speech corpus actually stages.
  *
  * [[encode]] emits a byte-valid WAV: RIFF header, canonical 16-byte
  * `fmt ` chunk (PCM, mono, 8 kHz, 16-bit), an ANCILLARY `LIST` chunk
  * between `fmt ` and `data` (real WAVs carry metadata chunks; a parser
  * that assumes `data` starts at byte 36 mis-reads them), then the
  * sample payload. Sample values are closed-form in (docId, t), so a
  * SQL oracle recomputes every signal statistic arithmetically.
  *
  * [[decode]] is a genuine parser: validates RIFF/WAVE magics, walks the
  * chunk stream honoring sizes and word alignment (odd-size chunks are
  * padded in RIFF), parses `fmt ` (rejecting non-PCM / multi-channel /
  * non-16-bit forms rather than mis-decoding them), locates `data`, and
  * reads the samples as signed LE int16, accumulating peak/energy/
  * zero-crossing statistics. Nothing looks at the docId — every output
  * column comes from the bytes.
  */
object WavCodec {

  /** Decoded features: fmt metadata + signal statistics. `energy` is
    * the EXACT integer Σv² (sums of int16 squares stay well inside a
    * Long), so downstream corpus-level RMS can be recomputed exactly
    * instead of through a per-file float round-trip. */
  final case class WavFeatures(sampleRate: Int, channels: Int, bits: Int,
      nSamples: Int, durationMs: Long, peak: Int, rms: Double,
      zeroCross: Long, energy: Long)

  /** Deterministic sample value at time t: bounded ±2000, int16-safe. */
  private def sample(docId: Long, t: Int): Int =
    (((31L * docId + 17L * t) % 4001L) - 2000L).toInt

  private def le32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >>> 8) & 0xff).toByte
    b(off + 2) = ((v >>> 16) & 0xff).toByte
    b(off + 3) = ((v >>> 24) & 0xff).toByte
  }
  private def le16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >>> 8) & 0xff).toByte
  }
  private def rd32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def rd16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private val Rate = 8000

  /** Synthesize the test asset for `docId`: 200..299 mono 16-bit samples
    * at 8 kHz, with a LIST metadata chunk ahead of `data`. */
  def encode(docId: Long): Array[Byte] = {
    val n = (200 + docId % 100).toInt
    val meta = "INFOISFT".getBytes("US-ASCII") // minimal LIST payload
    val fmtLen = 16; val listLen = meta.length; val dataLen = n * 2
    val riffLen = 4 + (8 + fmtLen) + (8 + listLen) + (8 + dataLen)
    val b = new Array[Byte](8 + riffLen)
    var o = 0
    def tag(s: String): Unit = { s.getBytes("US-ASCII").copyToArray(b, o); o += 4 }
    tag("RIFF"); le32(b, o, riffLen); o += 4; tag("WAVE")
    tag("fmt "); le32(b, o, fmtLen); o += 4
    le16(b, o, 1); o += 2              // PCM
    le16(b, o, 1); o += 2              // mono
    le32(b, o, Rate); o += 4           // sample rate
    le32(b, o, Rate * 2); o += 4       // byte rate
    le16(b, o, 2); o += 2              // block align
    le16(b, o, 16); o += 2             // bits per sample
    tag("LIST"); le32(b, o, listLen); o += 4
    meta.copyToArray(b, o); o += listLen
    tag("data"); le32(b, o, dataLen); o += 4
    var t = 0
    while (t < n) { le16(b, o, sample(docId, t) & 0xffff); o += 2; t += 1 }
    b
  }

  /** Parse a PCM WAV; throws (loudly, with the reason) on anything
    * malformed or unsupported. */
  def decode(bytes: Array[Byte]): WavFeatures = {
    require(bytes.length >= 12, "too short for a RIFF header")
    require(new String(bytes, 0, 4, "US-ASCII") == "RIFF", "not a RIFF file")
    val riffLen = rd32(bytes, 4)
    require(8 + riffLen <= bytes.length, s"RIFF size $riffLen overruns file")
    require(new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a WAVE form")
    var off = 12
    var rate = -1; var channels = -1; var bits = -1; var blockAlign = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= 8 + riffLen) {
      val typ = new String(bytes, off, 4, "US-ASCII")
      val len = rd32(bytes, off + 4)
      require(len >= 0 && off + 8 + len <= bytes.length,
        s"chunk $typ length $len overruns file at $off")
      typ match {
        case "fmt " =>
          require(len >= 16, s"fmt chunk too short: $len")
          val audioFormat = rd16(bytes, off + 8)
          require(audioFormat == 1, s"unsupported audio format $audioFormat")
          channels = rd16(bytes, off + 10)
          require(channels == 1, s"unsupported channel count $channels")
          rate = rd32(bytes, off + 12)
          blockAlign = rd16(bytes, off + 20)
          bits = rd16(bytes, off + 22)
          require(bits == 16, s"unsupported bit depth $bits")
          require(blockAlign == channels * bits / 8,
            s"block align $blockAlign inconsistent with $channels ch × $bits bit")
        case "data" => dataOff = off + 8; dataLen = len
        case _ => () // ancillary chunk (LIST etc.): sized walk skips it
      }
      off += 8 + len + (len & 1) // RIFF pads odd-size chunks to word boundary
    }
    require(rate > 0, "missing fmt chunk")
    require(dataOff >= 0, "missing data chunk")
    require(dataLen % 2 == 0, s"odd PCM16 data length $dataLen")
    val n = dataLen / 2
    require(n > 0, "empty data chunk")
    var peak = 0; var energy = 0L; var zc = 0L
    var prev = 0; var t = 0
    while (t < n) {
      val v = rd16(bytes, dataOff + 2 * t).toShort.toInt // sign-extend
      if (math.abs(v) > peak) peak = math.abs(v)
      energy += v.toLong * v
      if (t > 0 && v.toLong * prev < 0) zc += 1
      prev = v
      t += 1
    }
    WavFeatures(rate, channels, bits, n, n.toLong * 1000L / rate, peak,
      math.sqrt(energy.toDouble / n), zc, energy)
  }
}
