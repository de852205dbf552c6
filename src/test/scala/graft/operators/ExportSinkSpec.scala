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
      simplifyDigits = 3, quantize = 1e6, pointLimit = 15)
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
