package graft.operators

/** A REAL baseline JPEG codec, written from the published spec (ITU-T
  * T.81 / ISO 10918-1) with no codec libraries — the round-5 closure of
  * the multimodal decode gap (JPEG entropy decode was the last image
  * format behind `Multimodal.StubCodec`).
  *
  * Decoder ([[JpegCodec.pixels]]): full baseline sequential DCT —
  * SOI/APPn/COM/DQT/DHT/SOF0/DRI/SOS segment walk, canonical Huffman
  * table construction (T.81 Annex C), entropy decode with byte
  * unstuffing (0xFF00) and restart-marker handling, DC prediction,
  * EOB/ZRL AC runs, dequantize + dezigzag, double-precision IDCT,
  * general sampling factors with box upsampling (4:4:4 / 4:2:2 / 4:2:0),
  * JFIF YCbCr→RGB, crop to the declared dimensions. Progressive (SOF2),
  * arithmetic coding and 12-bit precision are rejected loudly.
  *
  * Encoder ([[JpegCodec.encode]]): 4:4:4 baseline with the T.81 Annex K
  * Huffman tables, double-precision FDCT, configurable quantization
  * table (default all-ones — mathematically lossless for per-8×8-block
  * constant images, which is what lets `q_media_jpeg`'s DuckDB oracle
  * recompute pixel means from the generating formula without decoding
  * anything). JpegSpec cross-validates BOTH directions against the JDK's
  * independent ImageIO codec: ImageIO decodes this encoder's streams to
  * the same pixels, and this decoder reproduces ImageIO's own encoder
  * output within JPEG rounding tolerance.
  *
  * The reference has no media path at all (extension surface, like PPM
  * and PNG in rounds 3-4); production users needing EXIF/CMYK/progressive
  * swap in javax.imageio through the same [[Multimodal.MediaCodec]] seam.
  */
object JpegCodec extends Multimodal.MediaCodec {

  // ---- shared tables ------------------------------------------------------

  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** idctBasis(u)(x) = C(u)/2 · cos((2x+1)uπ/16) — f = Σ F(u,v)·b(u,x)·b(v,y). */
  private val idctBasis: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    0.5 * c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  // T.81 Annex K.3 typical Huffman tables (bits per code length 1..16, then
  // the symbol values in canonical order). Correctness net: JpegSpec decodes
  // this encoder's output with the JDK's ImageIO — a transcription error in
  // any table breaks that cross-check.
  private val DcLumBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).map(_.toByte).toArray
  private val DcChrBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChrVals = (0 to 11).map(_.toByte).toArray
  private val AcLumBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)
  private val AcChrBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChrVals: Array[Byte] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  // ---- MediaCodec ---------------------------------------------------------

  def decode(url: String, bytes: Array[Byte]): Multimodal.MediaMeta = {
    val h = parseHeaders(url, bytes)
    Multimodal.MediaMeta(url, "image", bytes.length.toLong, h.width, h.height, 0L)
  }

  def frameHash(bytes: Array[Byte], ts: Long): Long = {
    val px = pixels(bytes)
    var acc = 1125899906842597L
    px.foreach(b => acc = acc * 31 + (b & 0xff))
    acc * 1000003L + ts
  }

  /** Per-channel means over the decoded (cropped) RGB raster. */
  def pixelMeans(bytes: Array[Byte]): (Double, Double, Double) = {
    val px = pixels(bytes)
    val n = px.length / 3
    var r = 0L; var g = 0L; var b = 0L
    var i = 0
    while (i < n) {
      r += px(3 * i) & 0xff; g += px(3 * i + 1) & 0xff; b += px(3 * i + 2) & 0xff
      i += 1
    }
    (r.toDouble / n, g.toDouble / n, b.toDouble / n)
  }

  // ---- decoder ------------------------------------------------------------

  private case class Component(id: Int, hSamp: Int, vSamp: Int, quantId: Int,
                               var dcTable: Int = 0, var acTable: Int = 0)
  private case class Headers(width: Int, height: Int, comps: Array[Component],
                             quant: Array[Array[Int]], // [id][64] zigzag order
                             dcHuff: Array[Huffman], acHuff: Array[Huffman],
                             restartInterval: Int, scanStart: Int)

  /** Canonical Huffman table (T.81 Annex C): minCode/maxCode/valPtr per
    * code length — O(1) per bit during decode.
    */
  private final class Huffman(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    private var code = 0
    private var k = 0
    for (l <- 1 to 16) {
      valPtr(l) = k
      minCode(l) = code
      code += bits(l - 1); k += bits(l - 1)
      maxCode(l) = code - 1
      code <<= 1
    }
    require(k == vals.length, s"DHT: ${vals.length} values for $k codes")
    def value(l: Int, c: Int): Int = vals(valPtr(l) + (c - minCode(l))) & 0xff
    def hasLen(l: Int): Boolean = maxCode(l) >= minCode(l)
  }

  private def u16(b: Array[Byte], o: Int): Int = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  private def parseHeaders(url: String, b: Array[Byte]): Headers = {
    require(b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8,
      s"not a JPEG (missing SOI): $url")
    val quant = new Array[Array[Int]](4)
    val dcHuff = new Array[Huffman](4)
    val acHuff = new Array[Huffman](4)
    var comps: Array[Component] = null
    var w = -1; var h = -1
    var dri = 0
    var o = 2
    while (o + 4 <= b.length) {
      require((b(o) & 0xff) == 0xff, s"expected marker at byte $o: $url")
      val m = b(o + 1) & 0xff
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) { o += 2 } // no payload
      else {
        val len = u16(b, o + 2)
        val seg = o + 4
        m match {
          case 0xdb => // DQT — one or more tables in one segment
            var p = seg
            while (p < seg + len - 2) {
              val pq = (b(p) & 0xf0) >> 4; val tq = b(p) & 0x0f
              require(pq == 0, s"only 8-bit quantization tables supported: $url")
              quant(tq) = Array.tabulate(64)(i => b(p + 1 + i) & 0xff)
              p += 65
            }
          case 0xc4 => // DHT — one or more tables
            var p = seg
            while (p < seg + len - 2) {
              val tc = (b(p) & 0xf0) >> 4; val th = b(p) & 0x0f
              val bits = Array.tabulate(16)(i => b(p + 1 + i) & 0xff)
              val n = bits.sum
              val vals = java.util.Arrays.copyOfRange(b, p + 17, p + 17 + n)
              val t = new Huffman(bits, vals)
              if (tc == 0) dcHuff(th) = t else acHuff(th) = t
              p += 17 + n
            }
          case 0xc0 => // SOF0 baseline
            require((b(seg) & 0xff) == 8, s"only 8-bit precision supported: $url")
            h = u16(b, seg + 1); w = u16(b, seg + 3)
            val nc = b(seg + 5) & 0xff
            require(nc == 1 || nc == 3, s"only 1 or 3 components supported (got $nc): $url")
            comps = Array.tabulate(nc) { i =>
              val p = seg + 6 + 3 * i
              Component(b(p) & 0xff, (b(p + 1) & 0xf0) >> 4, b(p + 1) & 0x0f, b(p + 2) & 0xff)
            }
            comps.foreach(c => require(c.hSamp >= 1 && c.hSamp <= 4 && c.vSamp >= 1 && c.vSamp <= 4,
              s"bad sampling factors ${c.hSamp}x${c.vSamp}: $url"))
          case 0xc2 => throw new IllegalArgumentException(s"progressive JPEG not supported: $url")
          case 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            throw new IllegalArgumentException(f"unsupported SOF marker 0xff$m%02x: $url")
          case 0xdd => dri = u16(b, seg)
          case 0xda => // SOS — scan follows
            require(comps != null, s"SOS before SOF0: $url")
            val ns = b(seg) & 0xff
            for (i <- 0 until ns) {
              val cid = b(seg + 1 + 2 * i) & 0xff
              val tt = b(seg + 2 + 2 * i) & 0xff
              val c = comps.find(_.id == cid).getOrElse(
                throw new IllegalArgumentException(s"SOS references unknown component $cid: $url"))
              c.dcTable = (tt & 0xf0) >> 4; c.acTable = tt & 0x0f
            }
            require(w > 0 && h > 0, s"degenerate JPEG dimensions ${w}x$h: $url")
            return Headers(w, h, comps, quant, dcHuff, acHuff, dri, seg + len - 2)
          case 0xd9 => throw new IllegalArgumentException(s"EOI before SOS: $url")
          case _ => () // APPn / COM / others: skip
        }
        o += 2 + len
      }
    }
    throw new IllegalArgumentException(s"no SOS marker found: $url")
  }

  /** Entropy-coded bit reader with 0xFF00 unstuffing; RSTn markers are
    * surfaced via [[expectRestart]].
    */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    // latched once 0xFF 0xD9 is seen: later refills keep serving 0-bits
    // WITHOUT advancing pos — falling through would re-read the 0xD9
    // marker byte as plain entropy data and decode garbage on an
    // over-reading (truncated/corrupt) stream instead of staying at the
    // well-defined EOI padding semantics
    private var atEoi = false
    def bit(): Int = {
      if (nbits == 0) {
        if (atEoi) { cur = 0; nbits = 8 }
        else {
          require(pos < b.length, "truncated JPEG entropy stream")
          var v = b(pos) & 0xff; pos += 1
          if (v == 0xff) {
            val n = if (pos < b.length) b(pos) & 0xff else -1
            if (n == 0x00) pos += 1 // stuffed data byte
            else if (n == 0xd9) { v = 0; atEoi = true } // EOI padding: T.81 allows pad bits; emit 0s
            else throw new IllegalStateException(f"unexpected marker 0xff$n%02x in entropy stream")
          }
          cur = v; nbits = 8
        }
      }
      nbits -= 1
      (cur >> nbits) & 1
    }
    def receive(n: Int): Int = { var v = 0; var i = 0; while (i < n) { v = (v << 1) | bit(); i += 1 }; v }
    def expectRestart(n: Int): Unit = {
      nbits = 0 // restart markers are byte-aligned; discard pad bits
      require(pos + 2 <= b.length && (b(pos) & 0xff) == 0xff && (b(pos + 1) & 0xff) == (0xd0 | n),
        f"expected RST$n marker at byte $pos")
      pos += 2
    }
  }

  private def huffDecode(br: BitReader, t: Huffman): Int = {
    var code = br.bit()
    var l = 1
    while (!(t.hasLen(l) && code <= t.maxCode(l))) {
      code = (code << 1) | br.bit()
      l += 1
      require(l <= 16, "invalid Huffman code in entropy stream")
    }
    t.value(l, code)
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** Decode to raw RGB bytes (row-major, 3 per pixel, cropped to w×h). */
  def pixels(bytes: Array[Byte]): Array[Byte] = {
    val hd = parseHeaders("<pixels>", bytes)
    val comps = hd.comps
    val hmax = comps.map(_.hSamp).max
    val vmax = comps.map(_.vSamp).max
    val mcusX = (hd.width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (hd.height + 8 * vmax - 1) / (8 * vmax)

    // per-component padded sample planes
    val planeW = comps.map(c => mcusX * c.hSamp * 8)
    val planeH = comps.map(c => mcusY * c.vSamp * 8)
    val planes = comps.indices.map(i => new Array[Byte](planeW(i) * planeH(i))).toArray

    val br = new BitReader(bytes, hd.scanStart)
    val dcPred = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    val block = new Array[Double](64)
    val idctTmp = new Array[Double](64) // scratch reused across blocks
    var mcu = 0
    var rst = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (hd.restartInterval > 0 && mcu > 0 && mcu % hd.restartInterval == 0) {
          br.expectRestart(rst)
          rst = (rst + 1) & 7
          java.util.Arrays.fill(dcPred, 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val qt = hd.quant(c.quantId)
          require(qt != null, s"missing quantization table ${c.quantId}")
          val dcT = hd.dcHuff(c.dcTable); val acT = hd.acHuff(c.acTable)
          require(dcT != null && acT != null, "missing Huffman table")
          var by = 0
          while (by < c.vSamp) {
            var bx = 0
            while (bx < c.hSamp) {
              java.util.Arrays.fill(coef, 0)
              val t = huffDecode(br, dcT)
              dcPred(ci) += extend(br.receive(t), t)
              coef(0) = dcPred(ci) * qt(0)
              var k = 1
              var eob = false
              var nAc = 0
              while (k < 64 && !eob) {
                val rs = huffDecode(br, acT)
                val r = rs >> 4; val s = rs & 15
                if (s == 0) { if (r == 15) k += 16 else eob = true }
                else {
                  k += r
                  require(k < 64, "AC run past end of block")
                  coef(ZigZag(k)) = extend(br.receive(s), s) * qt(k)
                  nAc += 1
                  k += 1
                }
              }
              val x0 = (mx * c.hSamp + bx) * 8
              val y0 = (my * c.vSamp + by) * 8
              val pw = planeW(ci)
              if (nAc == 0) {
                // DC-only block (the dominant case for flat regions, and
                // every block of the block-constant fixture class): the
                // IDCT collapses to the single product coef(0)·b00·b00 —
                // idctBasis(0)(x) is the constant b00 for every x, and the
                // general loops only ADD exact ±0.0 terms to it, which
                // never changes a double — so this value is bit-identical
                // to the full IDCT's output at every sample. One round +
                // clamp instead of 1024 multiply-adds and 64 rounds.
                val b00 = idctBasis(0)(0)
                val v0 = math.round(coef(0) * b00 * b00 + 128.0).toInt
                val sample = (if (v0 < 0) 0 else if (v0 > 255) 255 else v0).toByte
                var y = 0
                while (y < 8) {
                  java.util.Arrays.fill(planes(ci), (y0 + y) * pw + x0, (y0 + y) * pw + x0 + 8, sample)
                  y += 1
                }
              } else {
                idct(coef, block, idctTmp)
                // place samples into the component plane
                var y = 0
                while (y < 8) {
                  var x = 0
                  val rowOff = (y0 + y) * pw + x0
                  while (x < 8) {
                    val v = math.round(block(8 * y + x) + 128.0).toInt
                    planes(ci)(rowOff + x) = (if (v < 0) 0 else if (v > 255) 255 else v).toByte
                    x += 1
                  }
                  y += 1
                }
              }
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }

    // upsample + color convert + crop
    val out = new Array[Byte](hd.width * hd.height * 3)
    val gray = comps.length == 1
    if (!gray && hmax == 1 && vmax == 1) {
      // 4:4:4 fast path: sampling is the identity, so the generic loop's
      // six per-pixel integer divisions and the per-pixel closure go away;
      // the YCbCr arithmetic below is the SAME expressions in the same
      // order as the general path — identical output bytes.
      val p0 = planes(0); val p1 = planes(1); val p2 = planes(2)
      val pw = planeW(0)
      var y = 0
      while (y < hd.height) {
        var x = 0
        val row = y * pw
        var o = 3 * y * hd.width
        while (x < hd.width) {
          val yy = (p0(row + x) & 0xff).toDouble
          val cb = (p1(row + x) & 0xff) - 128.0
          val cr = (p2(row + x) & 0xff) - 128.0
          var v = math.round(yy + 1.402 * cr).toInt
          out(o) = (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          v = math.round(yy - 0.344136 * cb - 0.714136 * cr).toInt
          out(o + 1) = (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          v = math.round(yy + 1.772 * cb).toInt
          out(o + 2) = (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          x += 1
          o += 3
        }
        y += 1
      }
      return out
    }
    var y = 0
    while (y < hd.height) {
      var x = 0
      while (x < hd.width) {
        val o = 3 * (y * hd.width + x)
        if (gray) {
          val v = planes(0)((y * comps(0).vSamp / vmax) * planeW(0) + x * comps(0).hSamp / hmax)
          out(o) = v; out(o + 1) = v; out(o + 2) = v
        } else {
          def samp(ci: Int): Int = {
            val c = comps(ci)
            planes(ci)((y * c.vSamp / vmax) * planeW(ci) + x * c.hSamp / hmax) & 0xff
          }
          val yy = samp(0).toDouble
          val cb = samp(1) - 128.0
          val cr = samp(2) - 128.0
          def clamp(d: Double): Byte = {
            val v = math.round(d).toInt
            (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          }
          out(o) = clamp(yy + 1.402 * cr)
          out(o + 1) = clamp(yy - 0.344136 * cb - 0.714136 * cr)
          out(o + 2) = clamp(yy + 1.772 * cb)
        }
        x += 1
      }
      y += 1
    }
    out
  }

  private def idct(coef: Array[Int], out: Array[Double], tmp: Array[Double]): Unit = {
    // separable: rows then columns, double precision throughout; `tmp` is
    // caller-provided scratch (was allocated per block — per-block garbage
    // on the hot decode path)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += coef(8 * y + u) * idctBasis(u)(x); u += 1 }
        tmp(8 * y + x) = s
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += tmp(8 * v + x) * idctBasis(v)(yy); v += 1 }
        out(8 * yy + x) = s
        yy += 1
      }
      x += 1
    }
  }

  // ---- encoder ------------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var cur = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        cur = (cur << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(cur)
          if (cur == 0xff) out.write(0x00) // byte stuffing
          cur = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) { put(0xff, 8 - nbits) } // 1-pad per T.81
  }

  /** (code, length) per symbol from a bits/vals table (canonical order). */
  private def encodeTable(bits: Array[Int], vals: Array[Byte]): Array[(Int, Int)] = {
    val codes = new Array[(Int, Int)](256)
    var code = 0; var k = 0
    for (l <- 1 to 16) {
      for (_ <- 0 until bits(l - 1)) {
        codes(vals(k) & 0xff) = (code, l)
        code += 1; k += 1
      }
      code <<= 1
    }
    codes
  }

  /** Encode raw RGB as a baseline 4:4:4 JFIF JPEG. `quantTable` (64
    * entries, zigzag order, 1-255) applies to all components; the
    * all-ones default makes per-block-constant images bit-exact through
    * the round trip (DC-only blocks, zero quantization error).
    * `restartInterval` > 0 emits DRI + byte-aligned RSTn markers every
    * that many MCUs with DC-prediction reset (T.81 §B.2.4.4) — used by
    * JpegSpec to exercise the decoder's restart path.
    */
  def encode(w: Int, h: Int, rgb: Array[Byte],
             quantTable: Array[Int] = Array.fill(64)(1),
             restartInterval: Int = 0,
             constFast: Boolean = true): Array[Byte] = {
    require(rgb.length == 3 * w * h, s"need ${3 * w * h} rgb bytes, got ${rgb.length}")
    require(quantTable.length == 64 && quantTable.forall(q => q >= 1 && q <= 255),
      "quantTable must be 64 entries in 1..255")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int, payload: Array[Byte]): Unit = {
      out.write(0xff); out.write(m)
      out.write(((payload.length + 2) >> 8) & 0xff); out.write((payload.length + 2) & 0xff)
      out.write(payload)
    }
    out.write(0xff); out.write(0xd8) // SOI
    marker(0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)) // APP0
    marker(0xdb, (Array(0x00) ++ quantTable).map(_.toByte)) // DQT id 0
    marker(0xc0, (Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 3,
      1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0)).map(_.toByte)) // SOF0 4:4:4
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Byte]): Unit =
      marker(0xc4, (Array((tc << 4) | th) ++ bits).map(_.toByte) ++ vals)
    dht(0, 0, DcLumBits, DcLumVals); dht(1, 0, AcLumBits, AcLumVals)
    dht(0, 1, DcChrBits, DcChrVals); dht(1, 1, AcChrBits, AcChrVals)
    if (restartInterval > 0)
      marker(0xdd, Array((restartInterval >> 8) & 0xff, restartInterval & 0xff).map(_.toByte)) // DRI
    marker(0xda, Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0).map(_.toByte)) // SOS

    // RGB → YCbCr planes, padded to 8 with edge replication
    val bw = (w + 7) / 8 * 8; val bh = (h + 7) / 8 * 8
    val planes = Array.ofDim[Int](3, bw * bh)
    var y = 0
    while (y < bh) {
      val sy = math.min(y, h - 1)
      var x = 0
      while (x < bw) {
        val sx = math.min(x, w - 1)
        val o = 3 * (sy * w + sx)
        val r = rgb(o) & 0xff; val g = rgb(o + 1) & 0xff; val b = rgb(o + 2) & 0xff
        def cl(d: Double): Int = { val v = math.round(d).toInt; if (v < 0) 0 else if (v > 255) 255 else v }
        planes(0)(y * bw + x) = cl(0.299 * r + 0.587 * g + 0.114 * b)
        planes(1)(y * bw + x) = cl(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b)
        planes(2)(y * bw + x) = cl(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b)
        x += 1
      }
      y += 1
    }

    val dcCodes = Array(encodeTable(DcLumBits, DcLumVals), encodeTable(DcChrBits, DcChrVals))
    val acCodes = Array(encodeTable(AcLumBits, AcLumVals), encodeTable(AcChrBits, AcChrVals))
    val bwr = new BitWriter(out)
    val dcPred = new Array[Int](3)
    val freq = new Array[Double](64)
    val q = new Array[Int](64)
    def magnitude(v: Int): Int = { var t = 0; var a = math.abs(v); while (a > 0) { t += 1; a >>= 1 }; t }
    def putCoef(codes: Array[(Int, Int)], sym: Int, v: Int): Unit = {
      val (c, l) = codes(sym)
      bwr.put(c, l)
      val t = sym & 15
      if (t > 0) bwr.put(if (v < 0) v + (1 << t) - 1 else v, t)
    }
    var mcu = 0
    var rst = 0
    var by = 0
    while (by < bh / 8) {
      var bx = 0
      while (bx < bw / 8) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bwr.flush() // byte-align (1-padded) before the marker
          out.write(0xff); out.write(0xd0 | rst)
          rst = (rst + 1) & 7
          java.util.Arrays.fill(dcPred, 0)
        }
        var ci = 0
        while (ci < 3) {
          // Constant-block FDCT fast path (flat regions — every block of
          // the block-constant fixture class): for an all-equal block the
          // REAL DCT is zero at every (u,v) ≠ (0,0), and the float sum
          // the general loop computes is bounded by ~1e-10 (64 products
          // ≤ 22.5 each with ≤ 2^-52 relative rounding + 64 addition
          // errors at ≤ ulp(2^11)) — far below the 0.5·quant rounding
          // half-step with quant ≥ 1, so `round(freq/quant)` is 0 on
          // BOTH paths. The DC term replicates the general loop's fold
          // exactly (64 sequential adds of the identical product), so
          // the quantized coefficient vector — and therefore the encoded
          // byte stream — is identical (JpegSpec pins byte equality on
          // constant, fixture-style and random images). Cost: 64 loads +
          // 64 adds instead of 4096 multiply-adds per block.
          var const = constFast
          val p0 = planes(ci)(by * 8 * bw + bx * 8)
          if (constFast) {
            var yy = 0
            while (yy < 8 && const) {
              var xx = 0
              val row = (by * 8 + yy) * bw + bx * 8
              while (xx < 8 && const) {
                if (planes(ci)(row + xx) != p0) const = false
                xx += 1
              }
              yy += 1
            }
          }
          if (const) {
            java.util.Arrays.fill(freq, 0.0)
            val t = (p0 - 128) * idctBasis(0)(0) * idctBasis(0)(0)
            var s = 0.0
            var i = 0
            while (i < 64) { s += t; i += 1 }
            freq(0) = s
          } else {
            // FDCT (separable would change the summation order — kept as
            // the direct double sum, the bit-pattern the fixtures pin)
            var u = 0
            while (u < 8) {
              var v = 0
              while (v < 8) {
                var s = 0.0
                var yy = 0
                while (yy < 8) {
                  var xx = 0
                  while (xx < 8) {
                    s += (planes(ci)((by * 8 + yy) * bw + bx * 8 + xx) - 128) *
                      idctBasis(u)(xx) * idctBasis(v)(yy)
                    xx += 1
                  }
                  yy += 1
                }
                freq(8 * v + u) = s
                v += 1
              }
              u += 1
            }
          }
          var k = 0
          while (k < 64) { q(k) = math.round(freq(ZigZag(k)) / quantTable(k)).toInt; k += 1 }
          val tix = if (ci == 0) 0 else 1
          val diff = q(0) - dcPred(ci); dcPred(ci) = q(0)
          putCoef(dcCodes(tix), magnitude(diff), diff)
          var run = 0
          k = 1
          while (k < 64) {
            if (q(k) == 0) run += 1
            else {
              while (run >= 16) { putCoef(acCodes(tix), 0xf0, 0); run -= 16 } // ZRL
              putCoef(acCodes(tix), (run << 4) | magnitude(q(k)), q(k))
              run = 0
            }
            k += 1
          }
          if (run > 0) putCoef(acCodes(tix), 0x00, 0) // EOB
          ci += 1
        }
        mcu += 1
        bx += 1
      }
      by += 1
    }
    bwr.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }
}
