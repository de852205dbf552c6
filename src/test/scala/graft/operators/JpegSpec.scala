package graft.operators

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

/** JpegCodec validated against the JDK's INDEPENDENT ImageIO JPEG codec in
  * both directions, plus closed-form exactness on the fixture class
  * (all-ones quant + per-8x8-block-constant pixels) that `q_media_jpeg`'s
  * DuckDB oracle relies on.
  */
class JpegSpec extends AnyFunSuite {

  private def clamp(v: Long): Int = if (v < 0) 0 else if (v > 255) 255 else v.toInt

  /** The decoder output predicted from first principles for quant=1
    * block-constant images: RGB -> rounded YCbCr -> rounded RGB (the DCT
    * is exact on constant blocks, so only the two color rounds remain).
    */
  private def ycbcrRoundTrip(r: Int, g: Int, b: Int): (Int, Int, Int) = {
    val y = clamp(math.round(0.299 * r + 0.587 * g + 0.114 * b))
    val cb = clamp(math.round(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b))
    val cr = clamp(math.round(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b))
    (clamp(math.round(y + 1.402 * (cr - 128))),
      clamp(math.round(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))),
      clamp(math.round(y + 1.772 * (cb - 128))))
  }

  /** Block-constant test image: every 8x8 tile one color (the fixture shape). */
  private def blockImage(w: Int, h: Int, id: Long): Array[Byte] = {
    val rgb = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val bx = x / 8; val by = y / 8
      val o = 3 * (y * w + x)
      rgb(o) = ((id + 7 * bx + 13 * by) % 256).toByte
      rgb(o + 1) = ((2 * id + 11 * bx + 5 * by + 3) % 256).toByte
      rgb(o + 2) = ((3 * id + 17 * bx + 19 * by + 6) % 256).toByte
    }
    rgb
  }

  /** Gentle gradient (chroma slope well under 1/px) for tolerance tests. */
  private def gradientImage(w: Int, h: Int): Array[Byte] = {
    val rgb = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val o = 3 * (y * w + x)
      rgb(o) = (40 + x + y).toByte
      rgb(o + 1) = (60 + x).toByte
      rgb(o + 2) = (80 + y).toByte
    }
    rgb
  }

  private def imageIoPixels(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO failed to decode the stream")
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = img.getRGB(x, y)
      val o = 3 * (y * w + x)
      out(o) = ((p >> 16) & 0xff).toByte
      out(o + 1) = ((p >> 8) & 0xff).toByte
      out(o + 2) = (p & 0xff).toByte
    }
    (w, h, out)
  }

  private def maxDiff(a: Array[Byte], b: Array[Byte]): Int = {
    assert(a.length == b.length, s"length ${a.length} vs ${b.length}")
    a.indices.map(i => math.abs((a(i) & 0xff) - (b(i) & 0xff))).max
  }

  test("block-constant images decode EXACTLY to the closed-form YCbCr round trip (the oracle contract)") {
    // dims off the 8-grid exercise edge padding + crop
    for ((w, h, id) <- Seq((8, 8, 0L), (16, 16, 5L), (20, 11, 7L), (4, 3, 42L), (24, 19, 123L))) {
      val rgb = blockImage(w, h, id)
      val dec = JpegCodec.pixels(JpegCodec.encode(w, h, rgb))
      val want = new Array[Byte](3 * w * h)
      for (i <- 0 until w * h) {
        val (r, g, b) = ycbcrRoundTrip(rgb(3 * i) & 0xff, rgb(3 * i + 1) & 0xff, rgb(3 * i + 2) & 0xff)
        want(3 * i) = r.toByte; want(3 * i + 1) = g.toByte; want(3 * i + 2) = b.toByte
      }
      assert(maxDiff(dec, want) == 0, s"${w}x$h id=$id not exact")
      val meta = JpegCodec.decode(s"t$id", JpegCodec.encode(w, h, rgb))
      assert(meta.width == w && meta.height == h && meta.kind == "image")
    }
  }

  test("ImageIO (independent decoder) reads this encoder's streams to the same pixels") {
    for ((w, h, id) <- Seq((16, 16, 1L), (20, 11, 9L), (24, 19, 77L))) {
      val bytes = JpegCodec.encode(w, h, blockImage(w, h, id))
      val (iw, ih, theirs) = imageIoPixels(bytes)
      assert(iw == w && ih == h)
      val ours = JpegCodec.pixels(bytes)
      // DC-only blocks: any conformant IDCT is exact; colors may differ by
      // at most 1/sample from the JDK's integer YCbCr conversion tables
      assert(maxDiff(ours, theirs) <= 1, s"${w}x$h id=$id ImageIO disagreement > 1")
    }
  }

  test("general image, quant=1: self round trip within DCT rounding; ImageIO agrees on the stream") {
    val (w, h) = (32, 24)
    val rgb = gradientImage(w, h)
    val bytes = JpegCodec.encode(w, h, rgb)
    val dec = JpegCodec.pixels(bytes)
    assert(maxDiff(dec, rgb) <= 4, "quant=1 round trip drifted > 4")
    val (_, _, theirs) = imageIoPixels(bytes)
    assert(maxDiff(dec, theirs) <= 2, "ImageIO decode of the same stream differs > 2")
  }

  test("restart markers: DRI/RSTn stream decodes identically here and in ImageIO") {
    val (w, h) = (40, 24) // 5x3 = 15 MCUs -> RST0..RST6 with interval 2
    val rgb = blockImage(w, h, 31L)
    val plain = JpegCodec.pixels(JpegCodec.encode(w, h, rgb))
    val withRst = JpegCodec.encode(w, h, rgb, restartInterval = 2)
    assert(JpegCodec.pixels(withRst).sameElements(plain), "restart stream decoded differently")
    val (_, _, theirs) = imageIoPixels(withRst)
    assert(maxDiff(plain, theirs) <= 1, "ImageIO disagreed on the restart stream")
  }

  test("decodes the JDK encoder's output (4:2:0 subsampled) within JPEG tolerance") {
    val (w, h) = (32, 32)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val rgb = gradientImage(w, h)
    for (y <- 0 until h; x <- 0 until w) {
      val o = 3 * (y * w + x)
      img.setRGB(x, y, ((rgb(o) & 0xff) << 16) | ((rgb(o + 1) & 0xff) << 8) | (rgb(o + 2) & 0xff))
    }
    val bos = new java.io.ByteArrayOutputStream()
    val wr = ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(0.95f)
    val ios = ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); wr.dispose()
    val bytes = bos.toByteArray

    val ours = JpegCodec.pixels(bytes)
    val (iw, ih, theirs) = imageIoPixels(bytes)
    assert(iw == w && ih == h)
    // same stream, two decoders: differences = IDCT precision + chroma
    // upsampling filter (box here vs the JDK's); gentle gradient keeps the
    // honest bound small
    assert(maxDiff(ours, theirs) <= 8, "JDK-encoded stream decoded too differently")
    val meanDiff = ours.indices.map(i => math.abs((ours(i) & 0xff) - (theirs(i) & 0xff))).sum.toDouble / ours.length
    assert(meanDiff <= 1.5, s"mean per-sample disagreement $meanDiff > 1.5")
  }

  test("constant-block FDCT fast path is byte-identical to the general loop (round 8)") {
    val rnd = new scala.util.Random(4242)
    // (a) block-constant fixture class — fast path fires on every block
    for (id <- 0L until 20L) {
      val w = (4 + id % 21).toInt; val h = (3 + id % 17).toInt
      val rgb = Array.tabulate(3 * w * h) { o =>
        val x = (o / 3) % w; val y = (o / 3) / w
        val bx = x / 8; val by = y / 8
        (((o % 3) + 1) * id + 7 * bx + 13 * by).toByte
      }
      val fast = JpegCodec.encode(w, h, rgb, constFast = true)
      val slow = JpegCodec.encode(w, h, rgb, constFast = false)
      assert(java.util.Arrays.equals(fast, slow), s"fixture-style image $id diverged")
    }
    // (b) random noise — fast path almost never fires; must still agree
    // (edge-replication padding CAN make boundary blocks constant)
    for (trial <- 0 until 10) {
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(30)
      val rgb = Array.fill(3 * w * h)(rnd.nextInt(256).toByte)
      val q = Array.fill(64)(1 + rnd.nextInt(40))
      val fast = JpegCodec.encode(w, h, rgb, quantTable = q, constFast = true)
      val slow = JpegCodec.encode(w, h, rgb, quantTable = q, constFast = false)
      assert(java.util.Arrays.equals(fast, slow), s"random image trial $trial diverged")
    }
    // (c) fully constant image with a restart interval
    val rgbC = Array.fill(3 * 24 * 16)(99.toByte)
    assert(java.util.Arrays.equals(
      JpegCodec.encode(24, 16, rgbC, restartInterval = 2, constFast = true),
      JpegCodec.encode(24, 16, rgbC, restartInterval = 2, constFast = false)))
  }

  test("malformed inputs fail loudly") {
    val good = JpegCodec.encode(8, 8, blockImage(8, 8, 3L))
    intercept[IllegalArgumentException] { // progressive SOF2
      val b = good.clone(); // rewrite the SOF0 marker byte to SOF2
      val i = (0 until b.length - 1).find(i => (b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xc0).get
      b(i + 1) = 0xc2.toByte
      JpegCodec.pixels(b)
    }
    intercept[IllegalArgumentException] { // no SOI
      JpegCodec.decode("x", Array[Byte](1, 2, 3, 4))
    }
    intercept[Exception] { // truncated entropy stream
      JpegCodec.pixels(java.util.Arrays.copyOfRange(good, 0, good.length - 12))
    }
  }
}
