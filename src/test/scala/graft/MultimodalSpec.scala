package graft

import graft.functions.BmpCodec
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
}
