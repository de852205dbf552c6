package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Export, Ingest, TopoPipeline}
import graft.sources.Fixtures

/** Temporary stage profiler for the topology export path (q_topo_arcs). */
object ProfileTopo {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("profile-topo")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val polys = t("ingest.polygons+count") {
      val p = Ingest.polygons(spark, Fixtures.nodesDf(spark), Fixtures.waysDf(spark),
        Fixtures.relationsDf(spark), Fixtures.blacklist).cache()
      p.count()
      p
    }
    val water = t("ingest.water") {
      val w = Ingest.waterPolygons(spark, Fixtures.waterDf(spark)).cache()
      w.count(); w
    }
    val curated = polys.filter(col("layer") === "countries" &&
      col("relId").isin(Seq(100L, 101L, 102L, 103L, 104L): _*))
    val features0 = curated.select(col("relId").as("objId"), col("wkb"), col("bbox"))

    val pre = t("topology#1 (pre-simplify)") {
      val tp = TopoPipeline.topology(features0, 3, 0)
      tp.arcs.count(); tp.uses.count(); tp.objects.count()
      tp
    }
    val preSimplified = t("reconstruct+join") {
      val r = Export.reconstruct(pre).join(features0.select("objId", "bbox"), Seq("objId")).cache()
      r.count(); r
    }
    val clipped = t("clipWater") {
      val c = TopoPipeline.clipWater(preSimplified.select("objId", "wkb", "bbox"), water, 3)
      c.count(); c
    }
    val rebboxed = t("rebbox") {
      val r = clipped.withColumn("bbox", graft.functions.GeomExpressions.st_envelope(col("wkb"))).cache()
      r.count(); r
    }
    val topo = t("topology#2 (quantized)") {
      val tp = t("t2.build") { TopoPipeline.topology(rebboxed, 3, 1e6) }
      t("t2.arcsQ.count") { tp.arcsQ.get.count() }
      t("t2.uses.count") { tp.uses.count() }
      t("t2.objects.count") { tp.objects.count() }
      tp
    }
    t("slices") { TopoPipeline.slices(topo.objects, 20) }
    t("full Export.layer (2nd time)") {
      val v = Export.layer(polys, Ingest.waterPolygons(spark, Fixtures.waterDf(spark)),
        "countries", Seq(100L, 101L, 102L, 103L, 104L),
        simplifyDigits = 3, quantize = 1e6, pointLimit = 20,
        relations = Some(Fixtures.relationsDf(spark)), languages = Seq("nl", "en"))
      v.topo.arcsQ.get.count()
    }
    spark.stop()
  }
}
