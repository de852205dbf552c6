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
  * NOTE: real image/audio codecs are not in this container — the decode
  * step is a clearly-marked DETERMINISTIC STUB (`fakeDecode`) that derives
  * metadata/features purely from the bytes. The Spark-side plumbing —
  * schema, batching, partitioning, null handling — is real and tested; a
  * production build swaps `fakeDecode` for an actual codec.
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
    * mean mismatch. Formats that DO need codec libraries (JPEG, audio,
    * video) remain on `StubCodec` until a real binding is injected.
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
