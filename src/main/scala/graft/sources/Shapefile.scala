package graft.sources

import java.io.{DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Real ESRI Shapefile reader + writer, pure JVM, implemented from the
  * published spec ("ESRI Shapefile Technical Description", July 1998).
  * The reference imports its water layer from exactly this format
  * (/root/reference/osmtopo/water.go:17,101-143 via github.com/jonas-p/
  * go-shp); we previously replaced the file layer with a deterministic
  * fixture table — this module closes that gap the way the media codecs
  * did: a genuinely spec-conformant binary format, written and parsed
  * for real, with the decode oracle-checked (q_shp_water).
  *
  * Scope: shape type 5 (Polygon) plus null records (type 0, skipped on
  * read, as go-shp's `case *shp.Null` callers do). Z/M variants fail
  * loudly. A polygon record is a list of parts (rings); outer/inner
  * classification is NOT done here — the reader emits raw parts and
  * `Ingest.waterPolygons` applies the reference's winding rule
  * (water.go:185-192: shoelace ≥ 0 → outer, < 0 → hole) after
  * Visvalingam simplification, identically for fixture and file input.
  *
  * Layout recap (all offsets/lengths the spec counts in 16-bit WORDS):
  *  - main header, 100 bytes: int32-BE file code 9994; 5 unused int32;
  *    int32-BE file length (words); int32-LE version 1000; int32-LE
  *    shape type; 4 × f64-LE bbox (minx,miny,maxx,maxy); 4 × f64-LE
  *    z/m range (zeroes here);
  *  - per record: int32-BE record number (1-based) + int32-BE content
  *    length (words), then content: int32-LE shape type, 4 × f64-LE
  *    bbox, int32-LE numParts, int32-LE numPoints, numParts × int32-LE
  *    part start offsets, numPoints × (f64-LE x, f64-LE y);
  *  - .shx sidecar: same 100-byte header form, then per record
  *    int32-BE offset of the record header in the .shp (words) +
  *    int32-BE content length (words).
  *
  * Scale: the reader reads the .shx on the DRIVER — 8 bytes per record
  * (a planet water layer is ~10⁶–10⁷ records → tens of MB, driver-safe)
  * — and distributes (offset, length) ranges; each task seeks into the
  * .shp and decodes only its own records, so decode parallelism is
  * record-range parallelism exactly like a parquet row-group scan. No
  * task ever holds more than one record's bytes.
  */
object Shapefile {

  val PolygonType = 5
  val NullType = 0

  // ---------------------------------------------------------------- write

  /** Write records (one Seq of rings per record, rings CLOSED or open —
    * points are written verbatim) as `base`.shp + `base`.shx. Record
    * numbers are 1-based file order; readers expose the 0-based index,
    * matching go-shp's `n` that water.go feeds as the polygon id.
    */
  def write(records: Seq[Seq[Seq[(Double, Double)]]], base: String): Unit = {
    val contents = records.map(recordContent)
    val fileBytes = 100 + contents.map(8 + _.length).sum
    val allPts = records.flatten.flatten
    val (bb0, bb1, bb2, bb3) =
      if (allPts.isEmpty) (0.0, 0.0, 0.0, 0.0)
      else (allPts.map(_._1).min, allPts.map(_._2).min,
            allPts.map(_._1).max, allPts.map(_._2).max)

    def header(lengthBytes: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(100)
      b.order(ByteOrder.BIG_ENDIAN)
      b.putInt(9994); (0 until 5).foreach(_ => b.putInt(0))
      b.putInt(lengthBytes / 2)
      b.order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(1000).putInt(PolygonType)
      b.putDouble(bb0).putDouble(bb1).putDouble(bb2).putDouble(bb3)
      (0 until 4).foreach(_ => b.putDouble(0.0))
      b.array()
    }

    val shp = new DataOutputStream(new FileOutputStream(base + ".shp"))
    val shx = new DataOutputStream(new FileOutputStream(base + ".shx"))
    try {
      shp.write(header(fileBytes))
      shx.write(header(100 + 8 * records.length))
      var offsetBytes = 100
      contents.zipWithIndex.foreach { case (c, i) =>
        shp.writeInt(i + 1)          // record number, 1-based, BE
        shp.writeInt(c.length / 2)   // content length in words, BE
        shp.write(c)
        shx.writeInt(offsetBytes / 2)
        shx.writeInt(c.length / 2)
        offsetBytes += 8 + c.length
      }
    } finally { shp.close(); shx.close() }
  }

  private def recordContent(rings: Seq[Seq[(Double, Double)]]): Array[Byte] = {
    val numParts = rings.length
    val numPoints = rings.map(_.length).sum
    if (numPoints == 0) {
      // a record with no points is written as a spec null shape (type 0)
      // — readers skip it; the old behavior was an empty.min crash
      val nb = ByteBuffer.allocate(4)
      nb.order(ByteOrder.LITTLE_ENDIAN)
      nb.putInt(NullType)
      return nb.array()
    }
    val b = ByteBuffer.allocate(4 + 32 + 8 + 4 * numParts + 16 * numPoints)
    b.order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(PolygonType)
    val pts = rings.flatten
    b.putDouble(pts.map(_._1).min).putDouble(pts.map(_._2).min)
    b.putDouble(pts.map(_._1).max).putDouble(pts.map(_._2).max)
    b.putInt(numParts).putInt(numPoints)
    rings.scanLeft(0)(_ + _.length).dropRight(1).foreach(b.putInt)
    pts.foreach { case (x, y) => b.putDouble(x).putDouble(y) }
    b.array()
  }

  // ------------------------------------------------------------------ zip

  /** Unpack a zipped shapefile bundle and locate the .shp — the
    * reference's water flow (water.go:74-99): extract EVERY entry into
    * `folder` (flat basenames; entry paths are never trusted, so a
    * hostile "../" name cannot escape), remember the last `*.shp`
    * basename, fail loudly when none. Returns the extension-less base
    * path to hand to [[read]]. The zip layer is driver-side by design —
    * the archive is not seekable; the extracted .shp then gets the
    * normal distributed record-range read.
    */
  def unzipToBase(zipPath: String, folder: String): String = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(folder))
    val zf = new java.util.zip.ZipFile(zipPath)
    var shpName: String = null
    try {
      val es = zf.entries()
      while (es.hasMoreElements) {
        val e = es.nextElement()
        if (!e.isDirectory) {
          val base = e.getName.split('/').last
          val out = java.nio.file.Paths.get(folder, base)
          val in = zf.getInputStream(e)
          try java.nio.file.Files.copy(in, out,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          finally in.close()
          if (base.endsWith(".shp")) shpName = base
        }
      }
    } finally zf.close()
    require(shpName != null, s"No shape file found in zip: $zipPath")
    s"$folder/${shpName.stripSuffix(".shp")}"
  }

  // ----------------------------------------------------------------- read

  /** Per-record index entry parsed from the .shx (byte offsets/lengths). */
  private[sources] case class RecordRange(idx: Long, offset: Long, contentBytes: Int)

  /** Driver-side .shx parse: tiny (8 bytes/record), validates both file
    * headers agree on shape type.
    */
  private[sources] def index(base: String): (Int, IndexedSeq[RecordRange]) = {
    val head = FsIO.readFullyAt(base + ".shx", 0, 100)
    val hb = ByteBuffer.wrap(head)
    hb.order(ByteOrder.BIG_ENDIAN)
    require(hb.getInt(0) == 9994, s"not a shapefile index: bad file code in $base.shx")
    hb.order(ByteOrder.LITTLE_ENDIAN)
    require(hb.getInt(28) == 1000, "unsupported shapefile version")
    val shapeType = hb.getInt(32)
    val fileWords = { hb.order(ByteOrder.BIG_ENDIAN); hb.getInt(24) }
    val declared = fileWords.toLong * 2 // Long: a >2 GiB .shx overflows Int
    val actual = FsIO.length(base + ".shx")
    // a header that understates the length would silently drop trailing
    // records; fail loudly instead of losing data
    require(declared == actual,
      s"$base.shx header declares $declared bytes but file is $actual")
    require(declared - 100 <= Int.MaxValue.toLong,
      s"$base.shx larger than 2 GiB — index exceeds a single driver buffer")
    val nRec = ((declared - 100) / 8).toInt
    val body = FsIO.readFullyAt(base + ".shx", 100, 8 * nRec)
    val bb = ByteBuffer.wrap(body); bb.order(ByteOrder.BIG_ENDIAN)
    val recs = (0 until nRec).map { i =>
      val contentWords = bb.getInt(8 * i + 4)
      // Long widen + cap: a corrupt word count would otherwise overflow
      // Int into a negative task-side allocation; 256 MiB is far above
      // any real polygon record and fails loudly instead
      require(contentWords >= 0 && contentWords.toLong * 2 <= 256L * 1024 * 1024,
        s"record $i: content length ${contentWords.toLong * 2} bytes out of range")
      RecordRange(i.toLong, bb.getInt(8 * i).toLong * 2, contentWords * 2)
    }
    (shapeType, recs)
  }

  /** Distributed polygon read: (id, rings) with id = 0-based record index
    * (go-shp's `n`) and rings the record's raw parts, points verbatim.
    * Null records are skipped; non-polygon shape types fail loudly.
    */
  /** A contiguous run of records served by ONE positioned read. */
  private[sources] case class Batch(offset: Long, bytes: Int, recs: Seq[RecordRange])

  /** Coalesce the ordered record ranges into contiguous batches of at
    * most `maxBytes`: on an object store every positioned read is a
    * ranged GET, and polygon records are often ~100 bytes — one read per
    * record would mean 10⁶⁺ round trips over a planet water layer. A
    * batch closes at a gap (records not abutting) or at the size cap, so
    * task memory stays bounded by `maxBytes` regardless of layout.
    */
  private[sources] def coalesce(recs: Seq[RecordRange], maxBytes: Int): Seq[Batch] = {
    val out = Seq.newBuilder[Batch]
    var cur = List.empty[RecordRange]
    var curBytes = 0L
    def flush(): Unit = if (cur.nonEmpty) {
      val rs = cur.reverse
      out += Batch(rs.head.offset, curBytes.toInt, rs)
      cur = Nil; curBytes = 0L
    }
    recs.foreach { r =>
      val len = 8L + r.contentBytes
      val contiguous = cur.nonEmpty && cur.head.offset + 8 + cur.head.contentBytes == r.offset
      if (cur.nonEmpty && (!contiguous || curBytes + len > maxBytes)) flush()
      cur = r :: cur
      curBytes += len
    }
    flush()
    out.result()
  }

  def read(spark: SparkSession, base: String, minPartitions: Int = 0,
           batchBytes: Int = 8 * 1024 * 1024): DataFrame = {
    import spark.implicits._
    val (shapeType, recs) = index(base)
    require(shapeType == PolygonType,
      s"unsupported shapefile shape type $shapeType (only Polygon=5)")
    val batches = coalesce(recs, math.max(batchBytes, 1))
    val parts = if (minPartitions > 0) minPartitions
                else math.min(spark.sparkContext.defaultParallelism, math.max(1, batches.length))
    spark.sparkContext.parallelize(batches, parts)
      .mapPartitions { it =>
        FsIO.perTaskStream(base + ".shp", it) { (fin, batch) =>
          val buf = new Array[Byte](batch.bytes)
          fin.readFully(batch.offset, buf, 0, batch.bytes)
          batch.recs.iterator.flatMap { r =>
            val off = (r.offset - batch.offset).toInt
            val b = ByteBuffer.wrap(buf, off, 8 + r.contentBytes).slice()
            b.order(ByteOrder.BIG_ENDIAN)
            val recNo = b.getInt(0)
            require(recNo == r.idx + 1, s"record number $recNo at index ${r.idx} (corrupt .shx?)")
            // compare as Longs: an Int-wrapping corrupt word count must
            // not slip past by overflowing back onto the expected value
            require(b.getInt(4).toLong * 2 == r.contentBytes.toLong,
              s"record ${r.idx}: .shx/.shp length mismatch")
            b.order(ByteOrder.LITTLE_ENDIAN)
            val shape = b.getInt(8)
            if (shape == NullType) Iterator.empty
            else {
              require(shape == PolygonType, s"record ${r.idx}: unsupported shape type $shape")
              val numParts = b.getInt(8 + 36)
              val numPoints = b.getInt(8 + 40)
              // one equality subsumes sign and range checks on both counts:
              // negative or inflated values cannot reproduce the record's
              // actual byte length
              require(numParts >= 0 && numPoints >= 0 &&
                r.contentBytes.toLong == 44L + 4L * numParts + 16L * numPoints,
                s"record ${r.idx}: numParts=$numParts numPoints=$numPoints inconsistent " +
                  s"with content length ${r.contentBytes}")
              // every point must belong to a ring: a nonzero first start
              // or points without parts would SILENTLY drop data
              require(numPoints == 0 || numParts > 0,
                s"record ${r.idx}: $numPoints points but no parts")
              val partOff = 8 + 44
              val ptOff = partOff + 4 * numParts
              val starts = (0 until numParts).map(i => b.getInt(partOff + 4 * i))
              starts.zipWithIndex.foreach { case (st, i) =>
                require(st >= 0 && st <= numPoints &&
                  (i == 0 || st >= starts(i - 1)),
                  s"record ${r.idx}: part start $st out of order or range")
              }
              require(starts.headOption.forall(_ == 0),
                s"record ${r.idx}: first part starts at ${starts.head}, dropping points")
              val rings = (0 until numParts).map { i =>
                val end = if (i + 1 < numParts) starts(i + 1) else numPoints
                (starts(i) until end).map { j =>
                  (b.getDouble(ptOff + 16 * j), b.getDouble(ptOff + 16 * j + 8))
                }: Seq[(Double, Double)]
              }
              Iterator.single((r.idx, rings: Seq[Seq[(Double, Double)]]))
            }
          }
        }
      }
      .toDF("id", "rings")
      .withColumn("rings", expr("transform(rings, r -> transform(r, p -> struct(p._1 AS x, p._2 AS y)))"))
  }
}
