package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** AviCodec container round trip + frame indexing + alignment + guards.
  * Frame pixel correctness rides JpegCodec, which JpegSpec cross-checks
  * against the JDK's independent ImageIO codec; the container walk is
  * additionally pinned end-to-end by q_media_avi's formula-derived DuckDB
  * oracle.
  */
class AviSpec extends AnyFunSuite {

  /** Block-constant frame f of the q_media_avi fixture formula. */
  private def frameRgb(id: Long, w: Int, h: Int, f: Int): Array[Byte] = {
    val rgb = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val bx = x / 8; val by = y / 8
      val o = 3 * (y * w + x)
      rgb(o) = ((id + 7 * bx + 13 * by + 29 * f) % 256).toByte
      rgb(o + 1) = ((2 * id + 11 * bx + 5 * by + 3 + 31 * f) % 256).toByte
      rgb(o + 2) = ((3 * id + 17 * bx + 19 * by + 6 + 37 * f) % 256).toByte
    }
    rgb
  }

  private def mjpeg(id: Long, w: Int, h: Int, nf: Int): Seq[Array[Byte]] =
    (0 until nf).map(f => JpegCodec.encode(w, h, frameRgb(id, w, h, f)))

  test("round trip: frames byte-identical, header fields survive") {
    val fr = mjpeg(9L, 12, 9, 4)
    val avi = AviCodec.encode(12, 9, 40000L, fr)
    val v = AviCodec.parse("rt", avi)
    assert(v.width == 12 && v.height == 9 && v.usPerFrame == 40000L)
    assert(v.frames.length == 4)
    v.frames.zip(fr).foreach { case (a, b) => assert(a.toSeq == b.toSeq) }
    assert(v.durationMs == 160L)
    val meta = AviCodec.decode("rt", avi)
    assert(meta.kind == "video" && meta.width == 12 && meta.durationMs == 160L)
  }

  test("odd-sized frame chunks keep word alignment (every following frame intact)") {
    val fr = mjpeg(3L, 10, 7, 5)
    // the fixture JPEGs vary in size; force at least one odd by appending
    // a COM segment of odd total length to frame 1 (decoders ignore COM)
    val com = Array[Byte](0xff.toByte, 0xfe.toByte, 0x00, 0x03, 'x')
    val padded = fr.updated(1, fr(1).take(2) ++ com ++ fr(1).drop(2))
    assert(padded.exists(_.length % 2 == 1), "need an odd-sized frame to exercise padding")
    val avi = AviCodec.encode(10, 7, 33333L, padded)
    val v = AviCodec.parse("odd", avi)
    assert(v.frames.length == 5)
    v.frames.zip(padded).foreach { case (a, b) => assert(a.toSeq == b.toSeq) }
    // frames after the odd one still decode to the original pixels
    assert(JpegCodec.pixels(v.frames(4)).toSeq == JpegCodec.pixels(fr(4)).toSeq)
  }

  test("frameIndex maps timestamps to display intervals, clamped") {
    val fr = mjpeg(1L, 8, 8, 3)
    val v = AviCodec.parse("ts", AviCodec.encode(8, 8, 40000L, fr)) // 40 ms/frame
    assert(AviCodec.frameIndex(v, 0L) == 0)
    assert(AviCodec.frameIndex(v, 39L) == 0)
    assert(AviCodec.frameIndex(v, 40L) == 1)
    assert(AviCodec.frameIndex(v, 119L) == 2)
    assert(AviCodec.frameIndex(v, 10_000L) == 2) // clamped to last
    // frameHash actually decodes the indexed frame's pixels
    val h0 = AviCodec.frameHash(AviCodec.encode(8, 8, 40000L, fr), 0L)
    val h1 = AviCodec.frameHash(AviCodec.encode(8, 8, 40000L, fr), 40L)
    assert(h0 != h1)
  }

  test("pixelMeans equals direct JPEG decode means over all frames") {
    val fr = mjpeg(6L, 11, 10, 3)
    val avi = AviCodec.encode(11, 10, 20000L, fr)
    var r = 0L; var g = 0L; var b = 0L; var n = 0L
    fr.foreach { f =>
      val px = JpegCodec.pixels(f)
      var i = 0
      while (i < px.length) { r += px(i) & 0xff; g += px(i + 1) & 0xff; b += px(i + 2) & 0xff; i += 3 }
      n += px.length / 3
    }
    val (mr, mg, mb) = AviCodec.pixelMeans(avi)
    assert(mr == r.toDouble / n && mg == g.toDouble / n && mb == b.toDouble / n)
  }

  test("malformed containers fail loudly") {
    val good = AviCodec.encode(8, 8, 40000L, mjpeg(2L, 8, 8, 2))
    assertThrows[IllegalArgumentException](AviCodec.parse("short", good.take(8)))
    val notAvi = good.clone(); notAvi(8) = 'W'
    assertThrows[IllegalArgumentException](AviCodec.parse("form", notAvi))
    assertThrows[IllegalArgumentException](AviCodec.parse("trunc", good.dropRight(6)))
    // frame-count lie: bump avih.dwTotalFrames (at RIFF+12 -> LIST hdrl
    // payload: 'hdrl' + 'avih' + size -> dwTotalFrames at offset +16 into avih)
    val lie = good.clone()
    val avihOff = { // 12 (RIFF hdr) + 8 (LIST) + 4 (hdrl) + 8 (avih hdr)
      val o = 12 + 8 + 4 + 8
      assert(new String(good, o - 8, 4, "US-ASCII") == "avih"); o
    }
    lie(avihOff + 16) = (lie(avihOff + 16) + 1).toByte
    assertThrows[IllegalArgumentException](AviCodec.parse("count", lie))
    // frame dims disagreeing with the container header
    val wrongDims = AviCodec.encode(8, 8, 40000L, mjpeg(2L, 8, 8, 2)).clone()
    val mixed = AviCodec.encode(8, 8, 40000L,
      Seq(JpegCodec.encode(8, 8, frameRgb(2L, 8, 8, 0)), JpegCodec.encode(16, 8, frameRgb(2L, 16, 8, 1))))
    assertThrows[IllegalArgumentException](AviCodec.parse("dims", mixed))
    assert(AviCodec.parse("ok", wrongDims).frames.length == 2) // sanity: unmodified parses
  }
}
