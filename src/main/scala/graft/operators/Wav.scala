package graft.operators

/** A REAL audio decoder: RIFF/WAVE PCM, written from the public RIFF and
  * WAVE format specs (Microsoft/IBM Multimedia Programming Interface and
  * Data Specifications 1.0; the canonical `fmt `/`data` chunk layout) with
  * no codec libraries — closing the audio half of the multimodal decode
  * gap that `Multimodal.StubCodec` covered through round 4.
  *
  * Decoder ([[WavCodec.samples]]): RIFF header validation, chunk walk with
  * word (2-byte) alignment per the RIFF spec, `fmt ` parse (PCM tag 1 /
  * WAVE_FORMAT_EXTENSIBLE rejected loudly unless PCM, 16-bit mono/stereo),
  * unknown chunks (`LIST`, `fact`, …) skipped by declared size, `data`
  * payload decoded as little-endian signed 16-bit frames. Duration is
  * frames·1000/rate (floor), computed from the ACTUAL data chunk length,
  * not the header rates — a truncated payload fails loudly instead.
  *
  * Encoder ([[WavCodec.encode]]): canonical 44-byte-header PCM writer plus
  * an optional `LIST`/`INFO` chunk between `fmt ` and `data` so the
  * decoder's skip path is exercised by real streams. WavSpec cross-checks
  * BOTH directions against the JDK's independent `javax.sound.sampled`
  * codec: AudioSystem reads this encoder's streams to the same PCM, and
  * this decoder reproduces AudioSystem's own writer output sample-exact.
  *
  * The reference (rubenv/osmtopo) has no media path at all — this is
  * extension surface for the training-data pipeline, like PPM/PNG/JPEG in
  * rounds 3–5. Compressed audio (MP3/AAC/Opus) still needs an external
  * binding, injected through the same [[Multimodal.MediaCodec]] seam.
  */
object WavCodec extends Multimodal.MediaCodec {

  /** Parsed stream: sample rate, channel count, interleaved 16-bit frames. */
  final case class Pcm(sampleRate: Int, channels: Int, samples: Array[Short]) {
    def frames: Int = samples.length / channels
    def durationMs: Long = frames.toLong * 1000L / sampleRate
  }

  // ---- MediaCodec ---------------------------------------------------------

  def decode(url: String, bytes: Array[Byte]): Multimodal.MediaMeta = {
    val p = parse(url, bytes)
    Multimodal.MediaMeta(url, "audio", bytes.length.toLong, 0, 0, p.durationMs)
  }

  /** Audio "frame" at `ts` ms: hash of the PCM window starting at the frame
    * index ts maps to (rate·ts/1000), so different timestamps genuinely
    * sample different stream positions.
    */
  def frameHash(bytes: Array[Byte], ts: Long): Long = {
    val p = parse("<frame>", bytes)
    val start = math.min(p.frames.toLong, ts * p.sampleRate / 1000L).toInt * p.channels
    var acc = 1125899906842597L
    var i = start
    while (i < p.samples.length) { acc = acc * 31 + p.samples(i); i += 1 }
    acc * 1000003L + ts
  }

  /** Convenience: interleaved samples of a mono/stereo stream. */
  def samples(bytes: Array[Byte]): Array[Short] = parse("<samples>", bytes).samples

  /** Integer-exact stats over the decoded samples — the quantities the
    * q_media_wav DuckDB oracle recomputes from the fixture formula without
    * parsing a byte: (frameCount, mean sample value, mean |sample|).
    */
  def sampleStats(bytes: Array[Byte]): (Long, Double, Double) = {
    val s = parse("<stats>", bytes).samples
    require(s.nonEmpty, "empty data chunk")
    var sum = 0L; var abs = 0L
    var i = 0
    while (i < s.length) { sum += s(i); abs += math.abs(s(i).toLong); i += 1 }
    (s.length.toLong, sum.toDouble / s.length, abs.toDouble / s.length)
  }

  // ---- decoder ------------------------------------------------------------

  def parse(url: String, bytes: Array[Byte]): Pcm = {
    require(bytes.length >= 12, s"not a RIFF file (too short): $url")
    require(fourCC(bytes, 0) == "RIFF", s"missing RIFF magic: $url")
    val riffLen = le32(bytes, 4)
    require(riffLen >= 4 && 8L + riffLen <= bytes.length,
      s"RIFF size $riffLen overruns ${bytes.length}-byte payload: $url")
    require(fourCC(bytes, 8) == "WAVE", s"RIFF form is not WAVE: $url")

    var off = 12
    var rate = -1; var channels = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    val end = 8 + riffLen
    while (off + 8 <= end) {
      val id = fourCC(bytes, off)
      val len = le32(bytes, off + 4)
      require(len >= 0 && off + 8 + len <= end,
        s"chunk '$id' size $len overruns RIFF payload: $url")
      id match {
        case "fmt " =>
          require(len >= 16, s"fmt chunk too short ($len): $url")
          val tag = le16(bytes, off + 8)
          require(tag == 1, s"only PCM (tag 1) supported, got format tag $tag: $url")
          channels = le16(bytes, off + 10)
          rate = le32(bytes, off + 12)
          bits = le16(bytes, off + 22)
          require(channels == 1 || channels == 2, s"mono/stereo only, got $channels channels: $url")
          require(rate > 0, s"bad sample rate $rate: $url")
          require(bits == 16, s"16-bit PCM only, got $bits bits: $url")
        case "data" =>
          dataOff = off + 8; dataLen = len
        case _ => // LIST/INFO, fact, cue … — skip by declared size
      }
      off += 8 + len + (len & 1) // RIFF chunks are word-aligned: odd sizes pad
    }
    require(rate > 0, s"no fmt chunk before end of RIFF: $url")
    require(dataOff >= 0, s"no data chunk: $url")
    val bytesPerFrame = 2 * channels
    require(dataLen % bytesPerFrame == 0,
      s"data length $dataLen not a multiple of frame size $bytesPerFrame: $url")
    val out = new Array[Short](dataLen / 2)
    var i = 0
    while (i < out.length) {
      out(i) = ((bytes(dataOff + 2 * i) & 0xff) | (bytes(dataOff + 2 * i + 1) << 8)).toShort
      i += 1
    }
    Pcm(rate, channels, out)
  }

  // ---- encoder ------------------------------------------------------------

  /** Canonical PCM WAVE writer (mono when `channels`=1; `samples` is
    * interleaved for stereo). `withListChunk` inserts a LIST/INFO chunk
    * between `fmt ` and `data` so decoders must genuinely walk chunks
    * rather than assume the fixed 44-byte layout.
    */
  def encode(sampleRate: Int, samples: Array[Short], channels: Int = 1,
             withListChunk: Boolean = false): Array[Byte] = {
    require(channels == 1 || channels == 2, s"mono/stereo only: $channels")
    require(samples.length % channels == 0, "partial final frame")
    val info = if (withListChunk) {
      // LIST size must keep the RIFF even-alignment invariant: ISFT payload
      // is padded to even length inside the sub-chunk declared size math.
      val soft = "graft".getBytes("US-ASCII") :+ 0.toByte // NUL-terminated
      val pad = soft.length & 1
      val b = new java.io.ByteArrayOutputStream()
      b.write("LIST".getBytes("US-ASCII")); writeLe32(b, 4 + 8 + soft.length + pad)
      b.write("INFO".getBytes("US-ASCII"))
      b.write("ISFT".getBytes("US-ASCII")); writeLe32(b, soft.length)
      b.write(soft); if (pad == 1) b.write(0)
      b.toByteArray
    } else Array.emptyByteArray

    val dataLen = 2 * samples.length
    val out = new java.io.ByteArrayOutputStream(44 + info.length + dataLen)
    out.write("RIFF".getBytes("US-ASCII"))
    writeLe32(out, 4 + (8 + 16) + info.length + (8 + dataLen))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); writeLe32(out, 16)
    writeLe16(out, 1) // PCM
    writeLe16(out, channels)
    writeLe32(out, sampleRate)
    writeLe32(out, sampleRate * channels * 2) // byte rate
    writeLe16(out, channels * 2) // block align
    writeLe16(out, 16) // bits per sample
    out.write(info)
    out.write("data".getBytes("US-ASCII")); writeLe32(out, dataLen)
    var i = 0
    while (i < samples.length) {
      out.write(samples(i) & 0xff); out.write((samples(i) >> 8) & 0xff)
      i += 1
    }
    out.toByteArray
  }

  // ---- little-endian helpers ---------------------------------------------

  private def fourCC(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")
  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) | ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def writeLe16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
  }
  private def writeLe32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff); o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff)
  }
}
