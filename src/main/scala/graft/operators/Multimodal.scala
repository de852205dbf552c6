package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media payloads travel as opaque `binary`
  * columns with typed metadata; decode / feature-extract / frame-sample run
  * as partition-local batch transforms (`mapPartitions` — the Scala
  * analogue of `mapInPandas` batches: one iterator pass, no shuffle, schema
  * declared up front).
  *
  * NOTE: the container has no codec libraries, so this library carries
  * its OWN real decoders written from the public format specs — PPM
  * ([[Multimodal.PpmCodec]]), PNG ([[Multimodal.PngCodec]]), baseline
  * JPEG ([[JpegCodec]]), PCM WAVE audio ([[WavCodec]]) and MJPEG-AVI
  * video ([[AviCodec]]) — each oracle-checked end-to-end. The generic
  * `q_media_meta`/`q_media_frames` plumbing queries over the synthetic
  * `pages` payloads (which are NOT valid media files) keep the
  * deterministic `fakeDecode` stub so the batching/schema/null path is
  * verified independently of any format.
  */
object Multimodal {

  case class MediaMeta(url: String, kind: String, byteLen: Long,
                       width: Int, height: Int, durationMs: Long)

  /** The codec seam: every operator below takes a `MediaCodec`, so the
    * decode step is ONE injected implementation — out-of-sandbox users
    * swap in a javax.imageio / ffmpeg-backed codec without touching the
    * oracle-checked plumbing (schema, batching, null handling, frame
    * iteration). Implementations must be Serializable: the instance ships
    * inside task closures to executors.
    */
  trait MediaCodec extends Serializable {
    def decode(url: String, bytes: Array[Byte]): MediaMeta
    /** Identifier/content hash of the frame sampled at `ts` ms. */
    def frameHash(bytes: Array[Byte], ts: Long): Long
    /** Fixed-width feature vector for a payload. */
    def featurize(bytes: Array[Byte], dim: Int): Array[Float] = {
      val v = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) { v((bytes(i) & 0xff) % dim) += 1f; i += 1 }
      val n = math.max(1, bytes.length).toFloat
      v.map(_ / n)
    }
  }

  /** The sandbox default: the deterministic stub (this container has no
    * image/audio codecs). Its math is exact-integer and replicated by the
    * DuckDB oracles (q_media_meta / q_media_frames), so the plumbing is
    * verified end-to-end even though the "decode" is fake.
    */
  object StubCodec extends MediaCodec {
    def decode(url: String, bytes: Array[Byte]): MediaMeta = fakeDecode(url, bytes)
    def frameHash(bytes: Array[Byte], ts: Long): Long =
      java.util.Arrays.hashCode(bytes).toLong * 1000003L + ts
  }

  /** A REAL decoder: binary PPM (P6) needs no codec libraries, so the
    * decode step is genuinely implemented for it even in this sandbox —
    * header tokenizer (whitespace + `#` comment handling per the netpbm
    * spec), dimension parse, strict payload-length validation, and
    * pixel-level statistics over the raster. `q_media_ppm` checks it
    * end-to-end against a DuckDB oracle that recomputes dimensions and
    * per-channel means from the image-generating formula — a parser
    * off-by-one (header skip, channel order, row stride) shows up as a
    * mean mismatch. PNG ([[PngCodec]]), baseline JPEG
    * ([[graft.operators.JpegCodec]]), PCM WAVE audio
    * ([[graft.operators.WavCodec]]) and MJPEG-AVI video
    * ([[graft.operators.AviCodec]]) are likewise genuinely decoded — all
    * four media kinds have a real codec; only entropy-coded audio
    * (MP3/AAC) and inter-coded video (H.264…) still need an external
    * binding injected through this seam.
    */
  object PpmCodec extends MediaCodec {
    def decode(url: String, bytes: Array[Byte]): MediaMeta = {
      val (w, h, off) = parseHeader(url, bytes)
      require(bytes.length == off + 3 * w * h,
        s"P6 payload for $url: expected ${off + 3 * w * h} bytes, got ${bytes.length}")
      MediaMeta(url, "image", bytes.length.toLong, w, h, 0L)
    }

    /** Images carry no frames (sampleFrames skips kind=="image"); defined
      * anyway as a raster checksum so the interface stays total.
      */
    def frameHash(bytes: Array[Byte], ts: Long): Long = {
      val (w, h, off) = parseHeader("<frame>", bytes)
      var acc = 1125899906842597L
      var i = off
      while (i < off + 3 * w * h) { acc = acc * 31 + (bytes(i) & 0xff); i += 1 }
      acc * 1000003L + ts
    }

    /** Per-channel pixel means over the raster — real pixel-level decode
      * output (the quantity q_media_ppm's oracle recomputes independently).
      */
    def pixelMeans(bytes: Array[Byte]): (Double, Double, Double) = {
      val (w, h, off) = parseHeader("<means>", bytes)
      val n = w * h
      var r = 0L; var g = 0L; var b = 0L
      var i = 0
      while (i < n) {
        r += bytes(off + 3 * i) & 0xff
        g += bytes(off + 3 * i + 1) & 0xff
        b += bytes(off + 3 * i + 2) & 0xff
        i += 1
      }
      (r.toDouble / n, g.toDouble / n, b.toDouble / n)
    }

    /** netpbm P6 header: "P6", then width, height, maxval as ASCII ints
      * separated by whitespace (with `#`-to-end-of-line comments allowed
      * anywhere whitespace is), then exactly ONE whitespace byte before
      * the raster. Returns (width, height, rasterOffset).
      */
    private def parseHeader(url: String, bytes: Array[Byte]): (Int, Int, Int) = {
      require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
        s"not a P6 ppm: $url")
      var i = 2
      def skipSpaceAndComments(): Unit = {
        var go = true
        while (go && i < bytes.length) {
          val c = bytes(i)
          if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
          else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') i += 1
          else go = false
        }
      }
      def int(): Int = {
        skipSpaceAndComments()
        val s = i
        while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') i += 1
        require(i > s, s"malformed P6 header int at byte $s: $url")
        new String(bytes, s, i - s, "US-ASCII").toInt
      }
      val w = int(); val h = int(); val maxval = int()
      require(maxval == 255, s"only 8-bit P6 supported (maxval=$maxval): $url")
      require(i < bytes.length, s"P6 header truncated: $url")
      i += 1 // the single whitespace byte separating header from raster
      require(w > 0 && h > 0, s"degenerate P6 dimensions ${w}x$h: $url")
      (w, h, i)
    }
  }

  /** A second REAL decoder, for an actually-web-common format: PNG
    * (8-bit RGB, non-interlaced) decodes pure-JVM — zlib ships in the JDK
    * (`java.util.zip.Inflater`), so a full IDAT inflate + scanline filter
    * reconstruction (all five filter types: None/Sub/Up/Average/Paeth,
    * PNG spec §9) needs no external codec. CRCs are verified per chunk.
    * `q_media_png` checks dims + per-channel pixel means against the same
    * formula-derived DuckDB oracle style as `q_media_ppm` — the oracle
    * never touches compressed bytes, so a chunk-walk, inflate, stride or
    * filter-reconstruction bug breaks the hash.
    */
  object PngCodec extends MediaCodec {
    private val Sig = Array[Int](0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

    def decode(url: String, bytes: Array[Byte]): MediaMeta = {
      val (w, h) = dims(url, bytes)
      MediaMeta(url, "image", bytes.length.toLong, w, h, 0L)
    }

    def frameHash(bytes: Array[Byte], ts: Long): Long = {
      val px = pixels(bytes)
      var acc = 1125899906842597L
      px.foreach(b => acc = acc * 31 + (b & 0xff))
      acc * 1000003L + ts
    }

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

    private def be32(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

    private def chunks(url: String, bytes: Array[Byte]): Iterator[(String, Int, Int)] = {
      require(bytes.length >= 8 && Sig.indices.forall(i => bytes(i) == Sig(i)),
        s"not a PNG: $url")
      new Iterator[(String, Int, Int)] {
        private var o = 8
        def hasNext: Boolean = o + 8 <= bytes.length
        def next(): (String, Int, Int) = {
          val len = be32(bytes, o)
          val typ = new String(bytes, o + 4, 4, "US-ASCII")
          val dataOff = o + 8
          require(dataOff + len + 4 <= bytes.length, s"truncated $typ chunk: $url")
          val crc = new java.util.zip.CRC32
          crc.update(bytes, o + 4, 4 + len)
          require(crc.getValue.toInt == be32(bytes, dataOff + len),
            s"CRC mismatch in $typ chunk: $url")
          o = dataOff + len + 4
          (typ, dataOff, len)
        }
      }
    }

    private def dims(url: String, bytes: Array[Byte]): (Int, Int) = {
      val (typ, off, len) = chunks(url, bytes).next()
      require(typ == "IHDR" && len == 13, s"first PNG chunk must be IHDR(13): $url")
      val w = be32(bytes, off); val h = be32(bytes, off + 4)
      require(bytes(off + 8) == 8 && bytes(off + 9) == 2,
        s"only 8-bit truecolor (RGB) PNG supported: $url")
      require(bytes(off + 12) == 0, s"interlaced PNG not supported: $url")
      require(w > 0 && h > 0, s"degenerate PNG dimensions ${w}x$h: $url")
      (w, h)
    }

    /** Inflate the IDAT stream and undo scanline filters → raw RGB bytes
      * (row-major, 3 bytes per pixel).
      */
    private def pixels(bytes: Array[Byte]): Array[Byte] = {
      val (w, h) = dims("<pixels>", bytes)
      val idat = new java.io.ByteArrayOutputStream()
      chunks("<pixels>", bytes).foreach { case (typ, off, len) =>
        if (typ == "IDAT") idat.write(bytes, off, len)
      }
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      val stride = 3 * w
      val raw = new Array[Byte](h * (1 + stride))
      var done = 0
      var stalled = false
      while (!inf.finished() && done < raw.length && !stalled) {
        val n = inf.inflate(raw, done, raw.length - done)
        // inflate() == 0 with buffer space left means the stream can make
        // no progress — a TRUNCATED IDAT (chunk CRCs can still be valid:
        // they cover the stored bytes, not zlib completeness). Without
        // this check the loop spins forever — a hung executor task on a
        // malformed real-world input instead of a loud failure.
        if (n == 0) stalled = true else done += n
      }
      inf.end()
      require(done == raw.length,
        s"truncated IDAT: inflated $done bytes, expected ${raw.length}")
      // filter reconstruction (PNG spec §9; bpp = 3)
      val out = new Array[Byte](h * stride)
      var y = 0
      while (y < h) {
        val f = raw(y * (1 + stride)) & 0xff
        val rowIn = y * (1 + stride) + 1
        val rowOut = y * stride
        var x = 0
        while (x < stride) {
          val cur = raw(rowIn + x) & 0xff
          val a = if (x >= 3) out(rowOut + x - 3) & 0xff else 0 // left
          val b = if (y > 0) out(rowOut - stride + x) & 0xff else 0 // up
          val c = if (x >= 3 && y > 0) out(rowOut - stride + x - 3) & 0xff else 0 // up-left
          val recon = f match {
            case 0 => cur
            case 1 => cur + a
            case 2 => cur + b
            case 3 => cur + (a + b) / 2
            case 4 => // Paeth predictor
              val p = a + b - c
              val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
              cur + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
            case other => throw new IllegalArgumentException(s"unknown PNG filter $other")
          }
          out(rowOut + x) = (recon & 0xff).toByte
          x += 1
        }
        y += 1
      }
      out
    }

    /** Encode raw RGB pixels as a valid 8-bit truecolor PNG (filter 0
      * rows, one zlib stream) — lets fixtures emit REAL PNG files with no
      * external library; any PNG viewer opens them.
      */
    def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == 3 * w * h, s"need ${3 * w * h} rgb bytes, got ${rgb.length}")
      val out = new java.io.ByteArrayOutputStream()
      out.write(Sig)
      def chunk(typ: String, data: Array[Byte]): Unit = {
        def be(v: Int): Array[Byte] =
          Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
            ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
        out.write(be(data.length))
        val tb = typ.getBytes("US-ASCII")
        out.write(tb); out.write(data)
        val crc = new java.util.zip.CRC32
        crc.update(tb); crc.update(data)
        out.write(be(crc.getValue.toInt))
      }
      val ihdr = new Array[Byte](13)
      ihdr(0) = ((w >> 24) & 0xff).toByte; ihdr(1) = ((w >> 16) & 0xff).toByte
      ihdr(2) = ((w >> 8) & 0xff).toByte; ihdr(3) = (w & 0xff).toByte
      ihdr(4) = ((h >> 24) & 0xff).toByte; ihdr(5) = ((h >> 16) & 0xff).toByte
      ihdr(6) = ((h >> 8) & 0xff).toByte; ihdr(7) = (h & 0xff).toByte
      ihdr(8) = 8; ihdr(9) = 2; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
      chunk("IHDR", ihdr)
      val stride = 3 * w
      val raw = new Array[Byte](h * (1 + stride))
      var y = 0
      while (y < h) {
        raw(y * (1 + stride)) = 0 // filter type None
        System.arraycopy(rgb, y * stride, raw, y * (1 + stride) + 1, stride)
        y += 1
      }
      val defl = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
      defl.setInput(raw); defl.finish()
      val comp = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
      defl.end()
      chunk("IDAT", comp.toByteArray)
      chunk("IEND", Array.empty[Byte])
      out.toByteArray
    }
  }

  /** STUB decode: deterministic pseudo-metadata from the payload bytes.
    * Replace with a real codec (javax.imageio / ffmpeg bindings) outside
    * this sandbox.
    */
  def fakeDecode(url: String, bytes: Array[Byte]): MediaMeta = {
    val h = java.util.Arrays.hashCode(bytes)
    val kind = (h & 3) match {
      case 0 => "image"; case 1 => "audio"; case 2 => "video"; case _ => "image"
    }
    MediaMeta(url, kind, bytes.length.toLong,
      width = 64 + (math.abs(h) % 1024),
      height = 64 + (math.abs(h / 7) % 1024),
      durationMs = if (kind == "image") 0L else 1000L + (math.abs(h) % 600000))
  }

  /** Decode metadata for a (url, payload binary) table — one batch pass per
    * partition. `payloadCol` names the binary column (default "html", the
    * pages fixture's payload).
    */
  def decodeMeta(media: DataFrame, payloadCol: String = "html",
                 codec: MediaCodec = StubCodec): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("url"), col(payloadCol).as("payload")).as[(String, Array[Byte])]
      .mapPartitions(_.map { case (url, bytes) => codec.decode(url, bytes) })
      .toDF()
  }

  /** Feature extraction: fixed-width float vector per payload (STUB:
    * byte-histogram projection — deterministic; the schema/batch shape is
    * what a real embedding model would produce).
    */
  def features(media: DataFrame, dim: Int = 16, payloadCol: String = "html",
               codec: MediaCodec = StubCodec): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("url"), col(payloadCol).as("payload")).as[(String, Array[Byte])]
      .mapPartitions(_.map { case (url, bytes) =>
        (url, codec.featurize(bytes, dim).toSeq)
      })
      .toDF("url", "features")
  }

  /** Frame sampling for video-kind payloads: every `everyMs` up to the
    * (stub) duration → one row per sampled frame with a deterministic
    * frame hash. Like `fakeDecode`, the hash is exact integer math over
    * the payload hash so the plumbing is DuckDB-oracle-checkable
    * (`q_media_frames`): real decoders replace both stubs together.
    */
  def sampleFrames(media: DataFrame, everyMs: Long = 60000L,
                   payloadCol: String = "html",
                   codec: MediaCodec = StubCodec): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("url"), col(payloadCol).as("payload")).as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (url, bytes) =>
        val meta = codec.decode(url, bytes)
        if (meta.kind != "video") Iterator.empty
        else (0L to meta.durationMs by everyMs).iterator.map { ts =>
          (url, ts, codec.frameHash(bytes, ts))
        }
      })
      .toDF("url", "frame_ms", "frame_hash")
  }
}
