package graft.operators

import java.io.ByteArrayInputStream
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.scalatest.funsuite.AnyFunSuite

/** WavCodec validated against the JDK's INDEPENDENT javax.sound.sampled
  * WAVE codec in both directions, plus the malformed-input guards and the
  * stat formulas `q_media_wav`'s DuckDB oracle relies on.
  */
class WavSpec extends AnyFunSuite {

  private def fixtureSamples(id: Long, n: Int): Array[Short] =
    Array.tabulate(n)(k => (((id * 31 + k * 77) % 65536) - 32768).toShort)

  private def audioSystemPcm(bytes: Array[Byte]): (Float, Int, Array[Short]) = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    assert(fmt.getSampleSizeInBits == 16)
    assert(!fmt.isBigEndian)
    val raw = in.readAllBytes()
    val out = new Array[Short](raw.length / 2)
    for (i <- out.indices)
      out(i) = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort
    (fmt.getSampleRate, fmt.getChannels, out)
  }

  test("AudioSystem decodes this encoder's streams sample-exact (mono, with LIST chunk)") {
    val s = fixtureSamples(7L, 123)
    val wav = WavCodec.encode(11025, s, channels = 1, withListChunk = true)
    val (rate, ch, pcm) = audioSystemPcm(wav)
    assert(rate == 11025f && ch == 1)
    assert(pcm.toSeq == s.toSeq)
  }

  test("AudioSystem decodes this encoder's streams sample-exact (stereo)") {
    val s = fixtureSamples(11L, 240) // 120 stereo frames
    val wav = WavCodec.encode(22050, s, channels = 2)
    val (rate, ch, pcm) = audioSystemPcm(wav)
    assert(rate == 22050f && ch == 2)
    assert(pcm.toSeq == s.toSeq)
    val p = WavCodec.parse("stereo", wav)
    assert(p.frames == 120 && p.channels == 2)
  }

  test("this decoder reproduces AudioSystem's own writer output sample-exact") {
    val s = fixtureSamples(3L, 250)
    val raw = new Array[Byte](2 * s.length)
    for (i <- s.indices) {
      raw(2 * i) = (s(i) & 0xff).toByte
      raw(2 * i + 1) = ((s(i) >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(16000f, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(raw), fmt, s.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    val p = WavCodec.parse("jdk-written", out.toByteArray)
    assert(p.sampleRate == 16000 && p.channels == 1)
    assert(p.samples.toSeq == s.toSeq)
  }

  test("round trip + duration floor + stats match the closed forms") {
    val id = 42L
    val n = 40 + (id % 50).toInt
    val rate = 8000 + (id % 3).toInt * 4000
    val s = fixtureSamples(id, n)
    val wav = WavCodec.encode(rate, s, withListChunk = true)
    val meta = WavCodec.decode("u", wav)
    assert(meta.kind == "audio")
    assert(meta.durationMs == n.toLong * 1000L / rate)
    assert(meta.byteLen == wav.length.toLong)
    val (cnt, mean, meanAbs) = WavCodec.sampleStats(wav)
    assert(cnt == n.toLong)
    assert(mean == s.map(_.toLong).sum.toDouble / n)
    assert(meanAbs == s.map(v => math.abs(v.toLong)).sum.toDouble / n)
  }

  test("frameHash samples the window at ts (different ts, different window)") {
    val s = fixtureSamples(5L, 400)
    val wav = WavCodec.encode(8000, s)
    // 0 ms and 25 ms (frame 200) differ; beyond-the-end ts hashes the empty tail
    val h0 = WavCodec.frameHash(wav, 0L)
    val h1 = WavCodec.frameHash(wav, 25L)
    assert(h0 != h1)
    val past = WavCodec.frameHash(wav, 10_000L)
    assert(past == 1125899906842597L * 1000003L + 10_000L)
  }

  test("malformed inputs fail loudly") {
    val good = WavCodec.encode(8000, fixtureSamples(1L, 10))
    assertThrows[IllegalArgumentException](WavCodec.parse("short", good.take(8)))
    val notRiff = good.clone(); notRiff(0) = 'X'
    assertThrows[IllegalArgumentException](WavCodec.parse("magic", notRiff))
    // truncated data: RIFF size claims more than the payload holds
    assertThrows[IllegalArgumentException](WavCodec.parse("trunc", good.dropRight(4)))
    // odd data length (partial sample)
    val odd = good.clone()
    // data length field sits 4 bytes before the payload; force it odd
    val dataIdx = {
      var i = 12
      while (new String(odd, i, 4, "US-ASCII") != "data") i += 8 + ((odd(i + 4) & 0xff) | ((odd(i + 5) & 0xff) << 8))
      i
    }
    odd(dataIdx + 4) = (odd(dataIdx + 4) - 1).toByte
    assertThrows[IllegalArgumentException](WavCodec.parse("odd", odd))
    // non-PCM format tag
    val alaw = good.clone(); alaw(20) = 6 // fmt tag field
    assertThrows[IllegalArgumentException](WavCodec.parse("alaw", alaw))
  }
}
