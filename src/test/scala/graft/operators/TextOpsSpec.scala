package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.Fixtures

class TextOpsSpec extends SparkTestBase {
  import spark.implicits._

  lazy val docs = Fixtures.documents(spark, sf0001).cache()

  test("minhash LSH finds all near-identical pairs brute force finds (high threshold)") {
    // brute force exact jaccard over all pairs (500 docs -> 124750 pairs, fine locally)
    val all = docs.select("doc_id", "text").as[(Long, String)].collect()
    val brute = (for {
      i <- all.indices.iterator
      j <- (i + 1) until all.length
      jac = TextOps.jaccard(TextOps.tokenShingles(all(i)._2), TextOps.tokenShingles(all(j)._2))
      if jac >= 0.9
    } yield (math.min(all(i)._1, all(j)._1), math.max(all(i)._1, all(j)._1))).toSet

    val lsh = TextOps.minhashDedup(docs, 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // LSH at 8 bands x 4 rows: P(detect | jac=0.9) ~ 1 - (1-0.9^4)^8 ~ 0.9993;
    // with the shingle sets in this corpus every >=0.9 pair must band-collide
    assert(brute.subsetOf(lsh) || (brute -- lsh).isEmpty, s"missed: ${brute -- lsh}")
    // and everything LSH emits passed the exact verification >= 0.9
    val verified = TextOps.minhashDedup(docs, 0.9)
      .as[(Long, Long, Double)].collect()
    verified.foreach { case (_, _, j) => assert(j >= 0.9) }
  }

  test("simhash: identical docs collide at hamming 0, verified pairs <= 3") {
    val pairs = TextOps.simhashDedup(docs, 3).as[(Long, Long, Long)].collect()
    pairs.foreach { case (_, _, h) => assert(h <= 3) }
    // identical texts (if any duplicate text exists) must appear at hamming 0
    val dupGroups = docs.groupBy("text").agg(collect_list("doc_id").as("ids"))
      .filter(size($"ids") > 1).select("ids").as[Seq[Long]].collect()
    val got = pairs.map(p => (p._1, p._2)).toSet
    dupGroups.foreach { ids =>
      val sorted = ids.sorted
      for (a <- sorted; b <- sorted if a < b)
        assert(got.contains((a, b)), s"identical pair ($a,$b) missed")
    }
  }

  test("language id picks the profile language on crafted samples") {
    val samples = Seq(
      (1L, "the cat and the dog sat on a mat in the house"),
      (2L, "der hund und die katze ist ein tier mit fell auf dem sofa"),
      (3L, "le chat et la souris est une histoire pour les enfants"),
      (4L, "el perro y el gato es un animal de la casa por la noche")).toDF("doc_id", "text")
    val got = TextOps.langId(samples).select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(got(1L) == "en" && got(2L) == "de" && got(3L) == "fr" && got(4L) == "es")
  }

  test("slidingMins (monotonic deque) equals naive sliding-window min") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(16, 17, 50, 257); w <- Seq(2, 16)) {
      val grams = Array.fill(n)(rnd.nextLong() % 1000) // duplicates likely
      assert(TextOps.slidingMins(grams, w).toSeq ==
        grams.sliding(w).map(_.min).toSeq, s"n=$n w=$w")
    }
  }

  test("winnowing fingerprints: shared substrings share fingerprints") {
    val shared = "the quick brown fox jumps over the lazy dog again and again today"
    val a = TextOps.fingerprints("AAA " + shared + " tail one")
    val b = TextOps.fingerprints("BBB prefix " + shared + " other end")
    assert(a.toSet.intersect(b.toSet).nonEmpty)
    // determinism
    assert(TextOps.fingerprints(shared).toSeq == TextOps.fingerprints(shared).toSeq)
  }

  test("exact dedup groups by content") {
    val d = TextOps.exactDedup(docs)
    assert(d.agg(sum("n_dups")).as[Long].head() == docs.count())
  }

  test("multimodal plumbing: meta schema, features normalized, frames only for video") {
    val pages = Fixtures.pages(spark, sf0001).cache()
    val meta = Multimodal.decodeMeta(pages)
    assert(meta.columns.toSeq == Seq("url", "kind", "byteLen", "width", "height", "durationMs"))
    assert(meta.count() == pages.count())
    val feats = Multimodal.features(pages, dim = 16).select("features").as[Seq[Float]].collect()
    feats.foreach { v => assert(v.length == 16 && math.abs(v.sum - 1.0) < 1e-3) }
    val frames = Multimodal.sampleFrames(pages)
    val kinds = meta.select("url", "kind").as[(String, String)].collect().toMap
    frames.select("url").distinct().as[String].collect()
      .foreach(u => assert(kinds(u) == "video"))
  }

  test("PpmCodec: real P6 parse incl. comments; truncation fails loudly") {
    // a handcrafted 2x2 image with a spec-legal comment in the header
    val raster = Array.tabulate(12)(k => (10 * k).toByte)
    val img = "P6\n# a comment\n2 2\n255\n".getBytes("US-ASCII") ++ raster
    val meta = Multimodal.PpmCodec.decode("u", img)
    assert(meta.width == 2 && meta.height == 2 && meta.kind == "image" &&
      meta.byteLen == img.length && meta.durationMs == 0L)
    val (r, g, b) = Multimodal.PpmCodec.pixelMeans(img)
    // channel c mean over pixels i: bytes 10*(3i+c) & 0xff
    def mean(c: Int) = (0 until 4).map(i => (10 * (3 * i + c)) & 0xff).sum / 4.0
    assert(r == mean(0) && g == mean(1) && b == mean(2))
    intercept[IllegalArgumentException] {
      Multimodal.PpmCodec.decode("u", img.dropRight(1))
    }
    intercept[IllegalArgumentException] {
      Multimodal.PpmCodec.decode("u", "P5\n2 2\n255\n".getBytes("US-ASCII"))
    }
    // the fixture generator emits genuinely valid PPMs the codec round-trips
    val fx = Fixtures.ppmImages(spark, sf0001).as[(String, Array[Byte])].head()
    val m2 = Multimodal.PpmCodec.decode(fx._1, fx._2)
    assert(m2.byteLen == 11 + 3L * m2.width * m2.height)
  }

  test("PngCodec: encode/decode round trip; all five filter types reconstruct; CRC enforced") {
    import Multimodal.PngCodec
    val w = 5; val h = 4
    val rgb = Array.tabulate(3 * w * h)(k => ((k * 7 + 3) % 256).toByte)
    val png = PngCodec.encode(w, h, rgb)
    val meta = PngCodec.decode("u", png)
    assert(meta.width == w && meta.height == h && meta.kind == "image")
    // pixel-exact round trip through deflate + filter-0 reconstruction
    val (r, g, b) = PngCodec.pixelMeans(png)
    def mean(c: Int) = (0 until w * h).map(i => rgb(3 * i + c) & 0xff).sum.toDouble / (w * h)
    assert(r == mean(0) && g == mean(1) && b == mean(2))
    // non-zero filters: re-encode the same pixels with per-row Sub/Up/
    // Average/Paeth filtering and assert the decoder reconstructs them —
    // build the filtered stream by hand (encoder always writes filter 0)
    val stride = 3 * w
    val raw = new Array[Byte](h * (1 + stride))
    for (y <- 0 until h) {
      val f = 1 + (y % 4) // Sub, Up, Average, Paeth
      raw(y * (1 + stride)) = f.toByte
      for (x <- 0 until stride) {
        val cur = rgb(y * stride + x) & 0xff
        val a = if (x >= 3) rgb(y * stride + x - 3) & 0xff else 0
        val bb = if (y > 0) rgb((y - 1) * stride + x) & 0xff else 0
        val c = if (x >= 3 && y > 0) rgb((y - 1) * stride + x - 3) & 0xff else 0
        val pred = f match {
          case 1 => a
          case 2 => bb
          case 3 => (a + bb) / 2
          case 4 =>
            val p = a + bb - c
            val pa = math.abs(p - a); val pb = math.abs(p - bb); val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) bb else c
        }
        raw(y * (1 + stride) + 1 + x) = ((cur - pred) & 0xff).toByte
      }
    }
    val defl = new java.util.zip.Deflater(); defl.setInput(raw); defl.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
    defl.end()
    // splice the hand-filtered IDAT into a fresh PNG (reuse encode's
    // header by rebuilding: signature + IHDR from a filter-0 encode)
    val base = PngCodec.encode(w, h, rgb)
    val ihdrEnd = 8 + 8 + 13 + 4
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, ihdrEnd)
    def be(v: Int): Array[Byte] = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val data = comp.toByteArray
    out.write(be(data.length)); out.write("IDAT".getBytes("US-ASCII")); out.write(data)
    val crc = new java.util.zip.CRC32
    crc.update("IDAT".getBytes("US-ASCII")); crc.update(data)
    out.write(be(crc.getValue.toInt))
    out.write(be(0)); out.write("IEND".getBytes("US-ASCII"))
    val crc2 = new java.util.zip.CRC32; crc2.update("IEND".getBytes("US-ASCII"))
    out.write(be(crc2.getValue.toInt))
    val filteredPng = out.toByteArray
    val (r2, g2, b2) = PngCodec.pixelMeans(filteredPng)
    assert(r2 == r && g2 == g && b2 == b, "filtered reconstruction differs")
    // corrupting one IDAT byte must fail the CRC check loudly
    val bad = png.clone(); bad(ihdrEnd + 9) = (bad(ihdrEnd + 9) ^ 0x40).toByte
    intercept[IllegalArgumentException] { PngCodec.pixelMeans(bad) }
    // fixture emits genuinely valid PNGs the codec round-trips
    val fx = Fixtures.pngImages(spark, sf0001).as[(String, Array[Byte])].head()
    val m2 = PngCodec.decode(fx._1, fx._2)
    assert(m2.width >= 4 && m2.height >= 3)
  }

  test("PngCodec: truncated IDAT with valid chunk CRC fails loudly, never hangs") {
    import Multimodal.PngCodec
    val w = 5; val h = 4
    val rgb = Array.tabulate(3 * w * h)(k => ((k * 7 + 3) % 256).toByte)
    val base = PngCodec.encode(w, h, rgb)
    // rebuild the PNG with the IDAT zlib stream cut in half — the chunk
    // CRC is recomputed over the TRUNCATED bytes, so the chunk walk passes
    // and only the inflate loop can notice the stream never finishes
    val ihdrEnd = 8 + 8 + 13 + 4
    val idatLen = ((base(ihdrEnd) & 0xff) << 24) | ((base(ihdrEnd + 1) & 0xff) << 16) |
      ((base(ihdrEnd + 2) & 0xff) << 8) | (base(ihdrEnd + 3) & 0xff)
    val half = new Array[Byte](idatLen / 2)
    System.arraycopy(base, ihdrEnd + 8, half, 0, half.length)
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, ihdrEnd)
    def be(v: Int): Array[Byte] = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    out.write(be(half.length)); out.write("IDAT".getBytes("US-ASCII")); out.write(half)
    val crc = new java.util.zip.CRC32
    crc.update("IDAT".getBytes("US-ASCII")); crc.update(half)
    out.write(be(crc.getValue.toInt))
    out.write(be(0)); out.write("IEND".getBytes("US-ASCII"))
    val crc2 = new java.util.zip.CRC32; crc2.update("IEND".getBytes("US-ASCII"))
    out.write(be(crc2.getValue.toInt))
    val truncated = out.toByteArray
    val e = intercept[IllegalArgumentException] { PngCodec.pixelMeans(truncated) }
    assert(e.getMessage.contains("truncated IDAT"))
  }

  test("multimodal codec seam: an injected codec replaces the stub end-to-end") {
    // a production build swaps StubCodec for a real decoder without
    // touching the plumbing — this pins that every operator honors the
    // injected implementation (and that it ships through task closures)
    object FixedCodec extends Multimodal.MediaCodec {
      def decode(url: String, bytes: Array[Byte]): Multimodal.MediaMeta =
        Multimodal.MediaMeta(url, "video", bytes.length.toLong, 320, 240, 120000L)
      def frameHash(bytes: Array[Byte], ts: Long): Long = 7L * ts
      override def featurize(bytes: Array[Byte], dim: Int): Array[Float] =
        Array.fill(dim)(1f / dim)
    }
    val pages = Fixtures.pages(spark, sf0001).limit(5).cache()
    val meta = Multimodal.decodeMeta(pages, codec = FixedCodec)
    assert(meta.select("kind").distinct().as[String].collect().toSeq == Seq("video"))
    assert(meta.select("width", "height").distinct().as[(Int, Int)].head() == ((320, 240)))
    val frames = Multimodal.sampleFrames(pages, codec = FixedCodec)
    assert(frames.count() == 5 * 3) // 0, 60000, 120000 per page
    frames.select("frame_ms", "frame_hash").as[(Long, Long)].collect()
      .foreach { case (ts, h) => assert(h == 7L * ts) }
    val feats = Multimodal.features(pages, dim = 4, codec = FixedCodec)
      .select("features").as[Seq[Float]].collect()
    feats.foreach(v => assert(v == Seq(0.25f, 0.25f, 0.25f, 0.25f)))
    pages.unpersist()
  }

  test("BPE-ish token count: crafted strings match hand counts") {
    // hand-derived against the GPT-2 pre-tokenization rules
    val cases = Seq(
      "hello world" -> 2,   // "hello", " world"
      "don't stop" -> 3,    // "don", "'t", " stop"
      "a1b2" -> 4,          // "a", "1", "b", "2"
      "  two spaces" -> 3,  // " " (run minus last space), " two", " spaces"
      "x   " -> 2,          // "x", "   " (trailing run is one token)
      "tab\t\tx" -> 4,      // "tab", "\t" (lookahead alt), "\t" (plain \s+), "x"
      "..!?" -> 1,          // one punctuation run
      "price: $5" -> 4)     // "price", ":", " $", "5"
    cases.foreach { case (s, n) =>
      assert(TextOps.bpeishTokenCount(s) == n, s"'$s'")
    }
    // table output consistent with the scalar function
    val df = Seq((1L, "don't stop"), (2L, "  two spaces")).toDF("doc_id", "text")
    val got = TextOps.tokenCounts(df).as[(Long, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L))
  }

  test("blocked embedding dedup: subset of exact with full-containment recall on clustered pairs") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val exact = Similarity.embeddingDedupExact(emb, 0.4)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val blocked = Similarity.embeddingDedupBlocked(emb, 0.4)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    // no false positives: every blocked pair is an exact pair (same cosine
    // threshold, the blocking only prunes candidates)
    assert(blocked.subsetOf(exact), s"false positives: ${(blocked -- exact).take(5)}")
    // recall: pairs sharing an IVF list are found; report and bound it
    val recall = if (exact.isEmpty) 1.0 else blocked.size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall (${blocked.size}/${exact.size})")
    // and cosine values agree with the exact path on the found pairs
    val exactCos = Similarity.embeddingDedupExact(emb, 0.4)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    Similarity.embeddingDedupBlocked(emb, 0.4).as[(Long, Long, Double)].collect()
      .foreach { case (a, b, c) => assert(exactCos((a, b)) == c) }
  }

  test("blocked dedup verify gate: broadcast-closure and join paths are row-identical (round 8)") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    // threshold MaxValue forces the broadcast-closure verify, 0 forces
    // the attach-join verify — identical rows incl. the rounded cosine
    val viaClosure = Similarity.embeddingDedupBlocked(emb, 0.4, verifyBroadcastBytes = Long.MaxValue)
      .as[(Long, Long, Double)].collect().toSet
    val viaJoin = Similarity.embeddingDedupBlocked(emb, 0.4, verifyBroadcastBytes = 0L)
      .as[(Long, Long, Double)].collect().toSet
    assert(viaClosure == viaJoin,
      s"gate sides diverge: closureOnly=${(viaClosure -- viaJoin).take(3)} joinOnly=${(viaJoin -- viaClosure).take(3)}")
    assert(viaClosure.nonEmpty)
  }

  test("IVF ANN recall >= 0.8 vs brute force at nProbe=4/16") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val brute = Similarity.bruteForceTopK(emb, 0L to 9L, 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, 0L to 9L, 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("IVF non-broadcast centroid paths: chunked assign and flipped probe match the defaults") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").filter(col("vec_id") < 300)
    // chunked assignment (centroid table "too big to broadcast"): a 1-byte
    // budget forces one chunk per centroid; the per-chunk argmax merged by
    // a second groupBy max must equal the single-pass argmax exactly
    val chunked = Similarity.ivfIndex(emb, nCentroids = 8, centroidBroadcastBytes = 1L)
    val plain = Similarity.ivfIndex(emb, nCentroids = 8)
    val aChunked = chunked.assigned.select("vec_id", "centroid_id")
      .as[(Long, Long)].collect().toSet
    val aPlain = plain.assigned.select("vec_id", "centroid_id")
      .as[(Long, Long)].collect().toSet
    assert(aChunked == aPlain, "chunked centroid assignment diverged from single-pass")
    // flipped probe broadcast (centroids scanned distributed under a
    // broadcast query set): doctor the byte estimate past the budget
    val flipped = plain.copy(centroidBytes = Long.MaxValue)
    val viaFlip = Similarity.probeWithIndex(flipped, 0L to 4L, 5, nProbe = 3)
      .select("query_id", "rank", "vec_id").as[(Long, Long, Long)].collect().toSet
    val viaBcast = Similarity.probeWithIndex(plain, 0L to 4L, 5, nProbe = 3)
      .select("query_id", "rank", "vec_id").as[(Long, Long, Long)].collect().toSet
    assert(viaFlip == viaBcast, "flipped-broadcast probe diverged")
    // table-sampled calibration (the 10⁹⁺-row form of probeDepths): the
    // chosen width stays in range and auto results still meet recall on
    // real queries at fixture scale
    val (auto, chosen) = Similarity.ivfTopKAuto(emb, 0L to 4L, 5,
      recallTarget = 0.9, nCentroids = 8, tableFraction = 0.5)
    val nCentroids = plain.centroids.count().toInt
    assert(chosen >= 1 && chosen <= nCentroids)
    val brute = Similarity.bruteForceTopK(emb, 0L to 4L, 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val autoSet = auto.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = brute.intersect(autoSet).size.toDouble / brute.size
    assert(recall >= 0.8, s"measured recall $recall with table-sampled calibration")
  }

  test("auto-nProbe: calibrated width meets the recall target; monotone in the target") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val index = Similarity.ivfIndex(emb)
    val nCentroids = index.centroids.count().toInt
    // monotone: a stricter target can only widen the probe
    val pLo = Similarity.autoNProbe(index, k = 5, recallTarget = 0.5)
    val pMid = Similarity.autoNProbe(index, k = 5, recallTarget = 0.9)
    val pHi = Similarity.autoNProbe(index, k = 5, recallTarget = 1.0)
    assert(pLo >= 1 && pLo <= pMid && pMid <= pHi && pHi <= nCentroids,
      s"probe widths not monotone: $pLo / $pMid / $pHi of $nCentroids")
    // calibration holds BY MEASUREMENT on the sampled depths: at the
    // chosen width, >= target fraction of sampled true neighbors are
    // within the probed lists
    val depths = Similarity.probeDepths(index, k = 5)
    val sampled = depths.count(_ <= pMid).toDouble / depths.length
    assert(sampled >= 0.9, s"sampled recall $sampled at nProbe=$pMid")
    // end-to-end: the auto path returns the same rows as the manual path
    // at its chosen width, and measured recall on real queries meets the
    // target with the sampling slack documented in BENCH.md
    val (auto, chosen) = Similarity.ivfTopKAuto(emb, 0L to 9L, 5, recallTarget = 0.9)
    val manual = Similarity.ivfTopK(emb, 0L to 9L, 5, nProbe = chosen)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val autoSet = auto.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(autoSet == manual)
    val brute2 = Similarity.bruteForceTopK(emb, 0L to 9L, 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val measured = brute2.intersect(autoSet).size.toDouble / brute2.size
    assert(measured >= 0.8, s"measured recall $measured at auto nProbe=$chosen (target 0.9)")
  }
}
