package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import MultimodalOps.ImageCodec

/** The multimodal gates run a REAL `javax.imageio` PNG round trip; this
  * spec pins that the blob is an actual PNG stream and that decode
  * recovers the image contract exactly (PNG 8-bit gray is lossless). */
class MultimodalCodecSpec extends AnyFunSuite {

  private val doc = ImageCodec.Doc(doc_id = 123L, n_chars = 457L)

  test("encodeBatch emits genuine PNG bytes (magic header)") {
    val m = ImageCodec.encodeBatch(Iterator(doc)).next()
    assert(m.blob.take(8).map(_ & 0xff).toSeq ==
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
    // a real compressed stream, not raw pixels
    assert(m.blob.length != (8 + 123 % 9) * (8 + 457 % 7))
  }

  test("decodeBatch recovers contract dims and exact pixel sum") {
    val d = ImageCodec.decodeBatch(
      ImageCodec.encodeBatch(Iterator(doc))).next()
    assert(d.width == 8 + (123 % 9))
    assert(d.height == 8 + (457 % 7))
    assert(d.n_pixels == d.width.toLong * d.height)
    val expected = (for { y <- 0 until d.height; x <- 0 until d.width }
      yield (x + y.toLong * d.width + 123L) % 256).sum
    assert(d.pix_sum == expected)
    assert(d.mean_intensity == expected.toDouble / d.n_pixels)
  }

  test("resizeBatch nearest-neighbor picks in(2x,2y) exactly") {
    val r = ImageCodec.resizeBatch(
      ImageCodec.encodeBatch(Iterator(doc))).next()
    val (w, h) = ImageCodec.dims(123L, 457L)
    assert(r.out_width == (w + 1) / 2)
    assert(r.out_height == (h + 1) / 2)
    val expected = (for { y <- 0 until r.out_height; x <- 0 until r.out_width }
      yield (2 * x + 2 * y.toLong * w + 123L) % 256).sum
    assert(r.out_pix_sum == expected)
  }
}
