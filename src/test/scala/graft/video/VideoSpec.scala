package graft.video

import org.scalatest.funsuite.AnyFunSuite

class VideoSpec extends AnyFunSuite {

  private def halfFrame(w: Int, h: Int, leftLuma: Int, rightLuma: Int): Video.LumaFrame =
    Video.LumaFrame(w, h, Array.tabulate(w * h) { i =>
      (if (i % w < w / 2) leftLuma else rightLuma).toByte
    })

  test("y4m: encode/decode roundtrip preserves dims, fps and luma planes") {
    val frames = (0 until 5).map(f => halfFrame(64, 48, f * 20, 255 - f * 20))
    val bytes = Video.Y4m.encodeMono(64, 48, 25, 1, frames.map(_.y))
    assert(Video.Y4m.isY4m(bytes))
    val s = Video.Y4m.decode(bytes).get
    assert(s.width == 64 && s.height == 48)
    assert(s.fpsNum == 25 && s.fpsDen == 1)
    assert(s.frames.length == 5)
    for ((orig, dec) <- frames.zip(s.frames))
      assert(java.util.Arrays.equals(orig.y, dec.y))
  }

  test("y4m: C420 frame stride is parsed (chroma skipped, luma kept)") {
    // hand-build a C420 stream: luma plane + w/2*h/2*2 chroma bytes/frame
    val w = 8; val h = 4
    val y0 = Array.tabulate(w * h)(i => (i * 7).toByte)
    val chroma = Array.fill(w * h / 2)(0x80.toByte)
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$w H$h F30:1 C420jpeg\n".getBytes("US-ASCII"))
    out.write("FRAME\n".getBytes("US-ASCII")); out.write(y0); out.write(chroma)
    out.write("FRAME\n".getBytes("US-ASCII")); out.write(y0); out.write(chroma)
    val s = Video.Y4m.decode(out.toByteArray).get
    assert(s.frames.length == 2)
    assert(java.util.Arrays.equals(s.frames(1).y, y0))
  }

  test("y4m: truncated payload and foreign bytes decode to None") {
    val good = Video.Y4m.encodeMono(16, 16, 25, 1,
      Seq(Array.fill(256)(1.toByte)))
    assert(Video.Y4m.decode(good.dropRight(10)).isEmpty)
    assert(Video.Y4m.decode("not a video".getBytes).isEmpty)
    assert(!Video.Y4m.isY4m(Array[Byte](1, 2, 3)))
  }

  test("avi/mjpeg: encode/decode roundtrip recovers every frame") {
    val frames = Seq(
      halfFrame(64, 64, 0, 255), // strong left/right split
      halfFrame(64, 64, 255, 0), // inverted
      halfFrame(64, 64, 128, 128) // flat gray
    )
    val jpegs = frames.map(Video.Avi.jpegOfLuma)
    val avi = Video.Avi.encodeMjpeg(64, 64, 25, jpegs)
    assert(Video.Avi.isRiffAvi(avi))
    val dec = Video.Avi.decodeMjpeg(avi)
    assert(dec.length == 3)
    assert(dec.forall(f => f.width == 64 && f.height == 64))
    // JPEG is lossy; assert luma recovered within tolerance at plane level
    for ((orig, d) <- frames.zip(dec)) {
      val meanErr = orig.y.zip(d.y)
        .map { case (a, b) => math.abs((a & 0xFF) - (b & 0xFF)) }.sum.toDouble /
        orig.y.length
      assert(meanErr < 8.0, s"mean luma error $meanErr")
    }
  }

  test("avi: RIFF walk ignores non-movi chunks and survives junk tail") {
    val jpeg = Video.Avi.jpegOfLuma(halfFrame(32, 32, 10, 200))
    val avi = Video.Avi.encodeMjpeg(32, 32, 25, Seq(jpeg))
    // appending junk after the RIFF payload must not break the walk
    val withJunk = avi ++ Array.fill(33)(0x5A.toByte)
    assert(Video.Avi.decodeMjpeg(withJunk).length == 1)
    assert(Video.Avi.videoChunks("RIFFxxxxAVI ".getBytes).isEmpty)
    assert(Video.Avi.videoChunks(Array[Byte](1, 2)).isEmpty)
  }

  test("lumaPhash: split frame sets exactly its bright half's grid cells") {
    val ph = Video.lumaPhash(halfFrame(64, 64, 0, 255))
    assert(java.lang.Long.bitCount(ph) == 32)
    // flat frame: no cell above mean
    assert(Video.lumaPhash(halfFrame(64, 64, 77, 77)) == 0L)
    // inverted split flips which half is set
    val inv = Video.lumaPhash(halfFrame(64, 64, 255, 0))
    assert((ph & inv) == 0L && java.lang.Long.bitCount(ph | inv) == 64)
  }
}
