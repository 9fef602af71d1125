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

  test("phashBatch average-hash matches the texture contract bit-for-bit") {
    val p = ImageCodec.phashBatch(
      ImageCodec.encodeTexBatch(Iterator(doc))).next()
    val (w, h) = ImageCodec.dims(123L, 457L)
    // recompute from the contract: 8x8 nearest-neighbor grid, integer
    // mean compare (s*64 >= sum), bits packed row-major into two halves
    val s = for { y <- 0 until 8; x <- 0 until 8 }
      yield ImageCodec.texPixel(123L, x * w / 8, y * h / 8)
    val sum = s.sum
    var hi = 0L; var lo = 0L
    for (i <- 0 until 64 if s(i).toLong * 64 >= sum)
      if (i < 32) hi |= 1L << i else lo |= 1L << (i - 32)
    assert(p.phash_hi == hi && p.phash_lo == lo)
    // halves are 32-bit, so XOR/Hamming math stays non-negative
    assert(p.phash_hi >= 0L && p.phash_hi < (1L << 32))
    assert(p.phash_lo >= 0L && p.phash_lo < (1L << 32))
  }

  test("phash is invariant to the PNG round trip (pure function of image)") {
    val twice = ImageCodec.phashBatch(ImageCodec.encodeTexBatch(
      Iterator(doc, ImageCodec.Doc(124L, 300L)))).toSeq
    val again = ImageCodec.phashBatch(ImageCodec.encodeTexBatch(
      Iterator(doc, ImageCodec.Doc(124L, 300L)))).toSeq
    assert(twice == again)
    // different docs hash differently under the textured fixture
    assert(twice.head.phash_hi != twice(1).phash_hi ||
           twice.head.phash_lo != twice(1).phash_lo)
  }
}
