package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.geom.Jts

/** E1: the per-layer export driver — curated-id filter → pre-clip
  * simplification → water clip → names → quantized topology → greedy
  * slicing (/root/reference/osmtopo/export.go:16-48, env.go:427-431).
  */
object Export {

  /** P3: property enrichment — name + name:<lang> per configured language,
    * skipping name:en when it equals name (geometries.go:147-161).
    */
  def withNames(polygons: DataFrame, relations: DataFrame, languages: Seq[String]): DataFrame = {
    val langCols = languages.map { lang =>
      val v = element_at(col("tags"), s"name:$lang")
      val cleaned = if (lang == "en") when(v === element_at(col("tags"), "name"), null).otherwise(v) else v
      cleaned.as(s"name_$lang")
    }
    polygons.join(
      relations.select((col("id").as("relId")) +: langCols: _*), Seq("relId"), "left")
  }

  /** Rebuild feature geometries from a topology's simplified arcs —
    * the ToGeoJSON step between pre-simplification and clipping
    * (geometries.go:199). Consecutive arcs share their junction endpoint,
    * which is dropped on concatenation.
    */
  def reconstruct(topo: TopoPipeline.Topology): DataFrame = {
    val spark = topo.arcs.sparkSession
    import spark.implicits._
    val arcMap = spark.sparkContext.broadcast(
      topo.arcs.as[(Long, Seq[(Double, Double)])].collect().toMap)

    topo.uses
      .as[(Long, Int, Int, Int, Long, Boolean)]
      .groupByKey(_._1)
      .mapGroups { (objId, it) =>
        val uses = it.toSeq.sortBy(u => (u._2, u._3, u._4)) // polyIdx, ringIdx, segIdx
        val rings = uses.groupBy(u => (u._2, u._3)).toSeq.sortBy(_._1).map { case ((pi, ri), segs) =>
          val pts = segs.sortBy(_._4).foldLeft(Vector.empty[(Double, Double)]) { (acc, u) =>
            val arc = arcMap.value(u._5)
            val seq = if (u._6) arc.reverse else arc
            if (acc.isEmpty) acc ++ seq else acc ++ seq.drop(1)
          }
          (pi, ri, pts)
        }
        val polys = rings.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, rs) =>
          val sorted = rs.sortBy(_._2)
          val shell = sorted.head._3
          val holes = sorted.tail.map(_._3.toIndexedSeq)
          Jts.polygon(shell.toIndexedSeq, holes)
        }
        val geom: org.locationtech.jts.geom.Geometry =
          if (polys.length == 1) polys.head
          else Jts.factory.createMultiPolygon(polys.toArray)
        (objId, Jts.toWkb(geom))
      }
      .toDF("objId", "wkb")
  }

  case class LayerResult(layer: String, topo: TopoPipeline.Topology, slices: Seq[(Long, Int)])

  /** S10: the TopoJSON file sink — one `NNNN.topojson` per slice
    * (export.go:101-114). Arc indices follow the TopoJSON convention:
    * forward i, reversed ^i. Slice files subset objects and renumber the
    * referenced arcs (the topo.Filter step, export.go:95-99); bounding
    * boxes are dropped.
    */
  def writeSlices(result: LayerResult, outDir: String): Seq[String] = {
    import java.nio.file.{Files, Paths}
    val spark = result.topo.uses.sparkSession
    import spark.implicits._

    val arcsQ = result.topo.arcsQ.getOrElse(result.topo.arcs)
    val arcPts: Map[Long, Seq[(Int, Int)]] = result.topo.arcsQ match {
      case Some(q) => q.as[(Long, Seq[(Int, Int)])].collect().toMap
      case None => result.topo.arcs.as[(Long, Seq[(Double, Double)])].collect()
        .map { case (id, pts) => id -> pts.map(p => (p._1.toInt, p._2.toInt)) }.toMap
    }
    val uses = result.topo.uses
      .as[(Long, Int, Int, Int, Long, Boolean)].collect()
      .groupBy(_._1)

    val dir = Paths.get(outDir, result.layer)
    Files.createDirectories(dir)
    val transformJson = result.topo.transform.map { case (kx, ky, x0, y0) =>
      s""""transform":{"scale":[${1 / kx},${1 / ky}],"translate":[$x0,$y0]},"""
    }.getOrElse("")

    result.slices.groupBy(_._2).toSeq.sortBy(_._1).map { case (slice, members) =>
      val objIds = members.map(_._1).sorted
      // renumber arcs used by this slice
      val sliceArcIds = objIds.flatMap(id => uses(id).map(_._5)).distinct.sorted
      val renumber = sliceArcIds.zipWithIndex.toMap
      val arcsJson = sliceArcIds.map { aid =>
        arcPts(aid).map(p => s"[${p._1},${p._2}]").mkString("[", ",", "]")
      }.mkString("[", ",", "]")
      val objectsJson = objIds.map { id =>
        val byPoly = uses(id).groupBy(_._2).toSeq.sortBy(_._1)
        def ringArcs(segs: Array[(Long, Int, Int, Int, Long, Boolean)]): String =
          segs.sortBy(_._4).map { u =>
            val i = renumber(u._5)
            if (u._6) ~i else i
          }.mkString("[", ",", "]")
        val polysJson = byPoly.map { case (_, ringsOfPoly) =>
          ringsOfPoly.groupBy(_._3).toSeq.sortBy(_._1)
            .map { case (_, segs) => ringArcs(segs) }.mkString("[", ",", "]")
        }
        val (gtype, arcs) =
          if (polysJson.length == 1) ("Polygon", polysJson.head)
          else ("MultiPolygon", polysJson.mkString("[", ",", "]"))
        s""""$id":{"type":"$gtype","arcs":$arcs,"id":"$id"}"""
      }.mkString(",")
      val json = s"""{"type":"Topology",$transformJson"objects":{$objectsJson},"arcs":$arcsJson}"""
      val path = dir.resolve(f"$slice%04d.topojson")
      Files.writeString(path, json)
      path.toString
    }
  }

  /** Run the full export for one layer: curated ids → simplify →
    * clip water → quantized topology → slices.
    */
  def layer(polygons: DataFrame, water: DataFrame, layerId: String,
            curatedIds: Seq[Long], simplifyDigits: Int,
            quantize: Double = 1e6, pointLimit: Int = 10000): LayerResult = {
    import org.apache.spark.sql.functions.col

    val features0 = polygons
      .filter(col("layer") === layerId && col("relId").isin(curatedIds: _*))
      .select(col("relId").as("objId"), col("wkb"), col("bbox"))

    // P5: pre-clip simplification (simplify > 0 ∧ clipwater), no quantize
    val preSimplified =
      if (simplifyDigits > 0) {
        val pre = TopoPipeline.topology(features0, simplifyDigits, 0)
        reconstruct(pre)
          .join(features0.select("objId", "bbox"), Seq("objId"))
      } else features0

    // P6: water clip
    val clipped = TopoPipeline.clipWater(
      preSimplified.select("objId", "wkb", "bbox"), water, simplifyDigits)

    // recompute bbox after clipping, then final quantized topology
    val rebboxed = clipped
      .withColumn("bbox", graft.functions.GeomExpressions.st_envelope(col("wkb")))
    val topo = TopoPipeline.topology(rebboxed, simplifyDigits, quantize)
    val sl = TopoPipeline.slices(topo.objects, pointLimit)
    LayerResult(layerId, topo, sl)
  }
}
