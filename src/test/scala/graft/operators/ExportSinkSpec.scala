package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.Fixtures

class ExportSinkSpec extends SparkTestBase {
  import spark.implicits._

  test("writeSlices emits valid TopoJSON-shaped files with renumbered ^arc indices") {
    val polys = Ingest.polygons(spark, Fixtures.nodesDf(spark), Fixtures.waysDf(spark),
      Fixtures.relationsDf(spark), Fixtures.blacklist)
    val water = Ingest.waterPolygons(spark, Fixtures.waterDf(spark))
    val res = Export.layer(polys, water, "regions", Seq(200L, 201L, 202L, 203L, 204L),
      simplifyDigits = 3, quantize = 1e6, pointLimit = 15,
      relations = Some(Fixtures.relationsDf(spark)), languages = Seq("nl", "en"))
    val out = Files.createTempDirectory("topo_out").toString
    val files = Export.writeSlices(res, out)
    assert(files.nonEmpty)
    assert(files.head.endsWith("0000.topojson"))
    files.foreach { f =>
      val json = Files.readString(java.nio.file.Paths.get(f))
      assert(json.startsWith("""{"type":"Topology","""))
      assert(json.contains(""""transform":{"scale":"""))
      assert(json.contains(""""arcs":"""))
      // every referenced arc index (incl. reversed ~i) must be in range
      val nArcs = json.substring(json.lastIndexOf(""""arcs":""")).count(_ == '[')
      assert(nArcs > 1)
    }
    // all curated objects appear across slices exactly once
    val ids = files.flatMap { f =>
      val json = Files.readString(java.nio.file.Paths.get(f))
      "\"id\":\"(\\d+)\"".r.findAllMatchIn(json).map(_.group(1).toLong)
    }
    assert(ids.sorted == Seq(200L, 201L, 202L, 203L, 204L))
    // name properties emitted per object (export.go:36-43 semantics)
    val allJson = files.map(f => Files.readString(java.nio.file.Paths.get(f))).mkString
    Seq("brussels", "paris", "nyc", "tokyo", "sydney").foreach { city =>
      assert(allJson.contains(s""""properties":{"name":"region_$city"}"""),
        s"missing name property for region_$city")
    }
  }

  test("export-all: writeSlices output tars deterministically (S11 end-to-end)") {
    val polys = Ingest.polygons(spark, Fixtures.nodesDf(spark), Fixtures.waysDf(spark),
      Fixtures.relationsDf(spark), Fixtures.blacklist)
    val water = Ingest.waterPolygons(spark, Fixtures.waterDf(spark))
    val res = Export.layer(polys, water, "countries", Seq(100L, 101L),
      simplifyDigits = 3, quantize = 1e6, pointLimit = 15)
    val out = Files.createTempDirectory("topo_tar")
    Export.writeSlices(res, out.toString)
    val archive = out.resolve("export.tar.gz") // reference layout: inside the dir
    val entries = ExportArchive.tarGz(out, archive)
    assert(entries.nonEmpty && entries.forall(_.endsWith(".topojson")))
    assert(Files.size(archive) > 0)
    // re-archiving (with the archive now inside) is byte-stable
    val archive2 = out.resolve("export2.tar.gz")
    val entries2 = ExportArchive.tarGz(out, archive2)
    assert(entries2 == entries :+ "export.tar.gz" || entries2 == entries,
      s"unexpected second-run entries: $entries2")
  }

  test("LayerResult.release drops caches; outputs stay recomputable") {
    val polys = Ingest.polygons(spark, Fixtures.nodesDf(spark), Fixtures.waysDf(spark),
      Fixtures.relationsDf(spark), Fixtures.blacklist)
    val water = Ingest.waterPolygons(spark, Fixtures.waterDf(spark))
    val res = Export.layer(polys, water, "regions", Seq(200L, 201L),
      simplifyDigits = 3, quantize = 1e6, pointLimit = 15)
    val before = res.topo.arcs.count()
    res.release()
    // caches are gone, lineage is intact: the same result recomputes
    assert(res.topo.arcs.count() == before)
  }

  test("writeSlices without quantization writes absolute positions, no transform") {
    import graft.geom.Jts
    def sqw(x0: Double, y0: Double, x1: Double, y1: Double) =
      Jts.toWkb(Jts.polygon(IndexedSeq((x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0))))
    val fs = Seq((1L, sqw(0, 0, 1, 1)), (2L, sqw(1, 0, 2, 1))).toDF("objId", "wkb")
      .withColumn("bbox", graft.functions.GeomExpressions.st_envelope(col("wkb")))
    val topo = TopoPipeline.topology(fs, 0, 0)
    val res = Export.LayerResult("raw", topo, Seq((1L, 0), (2L, 0)))
    val out = Files.createTempDirectory("topo_raw").toString
    val files = Export.writeSlices(res, out)
    val json = Files.readString(java.nio.file.Paths.get(files.head))
    assert(!json.contains(""""transform""""), "unquantized topology must omit transform")
    // absolute double coordinates, not int-truncated deltas: the shared
    // border arc must contain the exact corner (1.0, 0.0) and (1.0, 1.0)
    assert(json.contains("[1.0,0.0]") && json.contains("[1.0,1.0]"))
  }

  test("spatialRepartition clusters nearby points in the same partitions") {
    val pages = Fixtures.pages(spark, sf0001).select("url", "lon", "lat")
    val parted = Tiling.spatialRepartition(pages, level = 8, numPartitions = 8)
    assert(parted.rdd.getNumPartitions == 8)
    assert(parted.count() == pages.count())
    // all pages of one city hotspot land in at most 2 range partitions
    import org.apache.spark.sql.functions.spark_partition_id
    val brusselsParts = parted
      .filter(col("lon").between(4.0, 4.7) && col("lat").between(50.5, 51.2))
      .select(spark_partition_id()).distinct().count()
    assert(brusselsParts <= 3, s"hotspot scattered over $brusselsParts partitions")
  }
}
