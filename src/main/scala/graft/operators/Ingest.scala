package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GeomExpressions._
import graft.geom.{Algorithms, Jts, PolygonAssembly, RingAssembly}

/** The ingest pipeline: OSM-shaped tables → assembled polygon layers →
  * cell-cover index tables. Spark-first re-expression of the reference's
  * 3-pass import + relation assembly + lookup-index load
  * (/root/reference/osmtopo/import.go:61-124, storage.go:128-201,
  * env.go:251-352):
  *
  *  - the PBF passes' needed-id bitmap trie becomes two left-semi joins;
  *  - relation acceptance + tag whitelist are pushed-down filters;
  *  - ring assembly / polygon assembly are per-relation typed aggregations
  *    (`groupByKey(relId).flatMapGroups`) — per-key local, bounded state;
  *  - the segment-tree build becomes a materialized `cell_covers` table
  *    keyed by cover cell id (ranges derivable from the id itself).
  */
object Ingest {

  /** layer id → accepted admin levels (mirrors the reference's
    * config-benelux.yaml layer shape).
    */
  val layerAdminLevels: Seq[(String, Seq[Int])] =
    Seq("countries" -> Seq(2), "regions" -> Seq(4), "cities" -> Seq(6, 8))

  /** S2: relation acceptance (admin_level tag present or natural=water)
    * minus blacklist (storage.go:15-30); S4: tag whitelist projection
    * (storage.go:32-37).
    */
  def acceptedRelations(relations: DataFrame, blacklist: Seq[Long]): DataFrame =
    relations
      .filter(element_at(col("tags"), "admin_level").isNotNull ||
        element_at(col("tags"), "natural") === "water")
      .filter(!col("id").isin(blacklist: _*))
      .withColumn("tags", expr(
        "map_filter(tags, (k, v) -> k = 'admin_level' OR k = 'name' OR k LIKE 'name:%' OR k = 'natural')"))

  case class ChainRow(relId: Long, pos: Int, role: String, refs: Seq[Long])
  case class Chain(relId: Long, role: String, chainIdx: Int, refs: Seq[Long])

  /** Full assembly: returns `polygons(relId, adminLevel, layer, name, wkb,
    * bbox)`. Relations whose geometry fails to assemble (unclosed rings,
    * missing nodes, sub-threshold area) are dropped, mirroring
    * geometries.go:136-140.
    */
  def polygons(spark: SparkSession, nodes: DataFrame, ways: DataFrame,
               relations: DataFrame, blacklist: Seq[Long]): DataFrame = {
    import spark.implicits._

    val rels = acceptedRelations(relations, blacklist)

    // G1: member role split — way members with role outer/inner, in order
    val memberWays = rels
      .select(col("id").as("relId"), posexplode(col("members")).as(Seq("pos", "m")))
      .filter(col("m.type") === 1 && col("m.role").isin("outer", "inner"))
      .select(col("relId"), col("pos"), col("m.role").as("role"), col("m.id").as("wayId"))

    // S3: the needed-way restriction IS this inner join — only ways that
    // are members of an accepted relation survive it, and missing ways
    // drop naturally (storage.go:138-141). Round 8 removed a separate
    // distinct + left-semi pre-pass that shuffled the way table a second
    // time for rows this join filters identically (guide §2.4: remove
    // shuffles outright — a semi-join feeding the same inner join is
    // redundant work at every scale).
    val relWays = memberWays
      .join(ways.withColumnRenamed("id", "wayId"), Seq("wayId"))
      .select(col("relId"), col("pos"), col("role"), col("refs"))
      .as[ChainRow]

    // G2: ring assembly per relation/role in member order (fixpoint merge)
    val chains: Dataset[Chain] = relWays
      .groupByKey(_.relId)
      .flatMapGroups { (relId, it) =>
        val rows = it.toSeq.sortBy(_.pos)
        def merged(role: String): Seq[Chain] =
          RingAssembly.reduce(rows.filter(_.role == role).map(_.refs))
            .zipWithIndex.map { case (c, i) => Chain(relId, role, i, c) }
        merged("outer") ++ merged("inner")
      }

    // S3 for nodes, same shape as the ways case above: the inner join
    // below keeps exactly the needed nodes — the former distinct +
    // left-semi pre-pass shuffled the (planet-dominating) node table
    // twice for the same filtering.
    val chainRefs = chains
      .select(col("relId"), col("role"), col("chainIdx"), size(col("refs")).as("expected"),
        posexplode(col("refs")).as(Seq("refPos", "nodeId")))

    // per-relation chain count BEFORE the node join: a chain whose nodes
    // are ALL missing produces no joined row at all, so the
    // actual-vs-expected length guard below can never see it — the count
    // comparison catches whole-chain loss (same storage.go:194-196 abort)
    val chainCounts = chains.groupBy("relId").agg(count(lit(1)).as("nChains"))

    // G3: node-ref expansion — join coords, reassemble ordered chains.
    // ONE relId exchange (the explicit repartition) serves the per-chain
    // aggregation (HashPartitioning(relId) satisfies the (relId, role,
    // chainIdx, expected) clustering — subset rule), survives the count
    // join, and feeds the final per-relation assembly below with no
    // further shuffle (guide §2.4: operations keyed the same way share
    // one exchange). Was: two extra exchanges — the 4-key agg shuffle
    // and the assembly's opaque groupByKey shuffle.
    val chainCoords = chainRefs
      .join(nodes.withColumnRenamed("id", "nodeId"), Seq("nodeId"))
      .repartition(col("relId"))
      .groupBy("relId", "role", "chainIdx", "expected")
      .agg(sort_array(collect_list(struct(
        col("refPos").as("_1"), col("lon").as("_2"), col("lat").as("_3")))).as("coords"))
      .join(chainCounts, Seq("relId"))

    // G4+G5: polygon assembly + buffer(0) per relation; any chain with a
    // missing node (actual < expected) — or a chain missing ENTIRELY —
    // aborts the whole relation (storage.go:194-196 error propagates out
    // of ToGeometry). Column-keyed groupBy (not groupByKey with a lambda
    // key): the planner sees relId and reuses the exchange above.
    val assembled = chainCoords
      .groupBy("relId")
      .agg(collect_list(struct(col("role"), col("chainIdx"), col("expected"),
        col("coords"), col("nChains"))).as("chains"))
      .as[(Long, Seq[(String, Int, Int, Seq[(Int, Double, Double)], Long)])]
      .flatMap { case (relId, chainRows) =>
        val rows = chainRows.sortBy(r => (r._1, r._2))
        if (rows.exists(r => r._4.length != r._3) ||
            rows.length != rows.head._5) Iterator.empty
        else {
          def rings(role: String): Seq[IndexedSeq[(Double, Double)]] =
            rows.filter(_._1 == role)
              .map(_._4.map { case (_, lon, lat) => (lon, lat) }.toIndexedSeq)
          PolygonAssembly.makePolygons(rings("outer"), rings("inner")) match {
            case Some(g) if !g.isEmpty =>
              try Iterator.single((relId, Jts.toWkb(g.buffer(0))))
              catch { case _: Exception => Iterator.empty }
            case _ => Iterator.empty
          }
        }
      }
      .toDF("relId", "wkb")

    // P3-style projection: admin level, layer, display name
    val layerCase = layerAdminLevels
      .flatMap { case (layer, lvls) => lvls.map(l => s"WHEN $l THEN '$layer'") }
      .mkString("CASE adminLevel ", " ", " ELSE NULL END")
    assembled
      .join(rels.select(col("id").as("relId"),
        coalesce(element_at(col("tags"), "admin_level").cast("int"), lit(0)).as("adminLevel"),
        element_at(col("tags"), "name").as("name"),
        element_at(col("tags"), "natural").as("natural")), Seq("relId"))
      .withColumn("layer", when(col("natural") === "water", lit("water"))
        .otherwise(expr(layerCase)))
      .filter(col("layer").isNotNull)
      .withColumn("bbox", st_envelope(col("wkb")))
      .select("relId", "adminLevel", "layer", "name", "wkb", "bbox")
  }

  /** J1/J3: the materialized cover table. Ranges are derived from the cell
    * id (S2-style lsb arithmetic) — pure column math, no extra expression.
    */
  def cellCovers(polygons: DataFrame): DataFrame =
    polygons
      .select(col("relId"), col("layer"), explode(st_cell_cover(col("wkb"))).as("cellId"))
      .withColumn("cellMin", expr("cellId - (cellId & -cellId) + 1"))
      .withColumn("cellMax", expr("cellId + (cellId & -cellId) - 1"))

  /** S5/G7: water shapefile-part pipeline — per-part Visvalingam(1e-5),
    * |area|<1e-5 drop, shoelace-sign outer/inner classification, polygon
    * assembly, buffer(0) (water.go:146-233). Returns water(id, wkb).
    */
  def waterPolygons(spark: SparkSession, water: DataFrame): DataFrame = {
    import spark.implicits._
    water
      .select(col("id"), col("rings"))
      .as[(Long, Seq[Seq[(Double, Double)]])]
      .flatMap { case (id, parts) =>
        val outer = collection.mutable.ArrayBuffer[IndexedSeq[(Double, Double)]]()
        val inner = collection.mutable.ArrayBuffer[IndexedSeq[(Double, Double)]]()
        for (part <- parts if part.length >= 3) {
          val simplified = Algorithms.visvalingam(part.toIndexedSeq, 1e-5)
          val area = Algorithms.ringArea(simplified)
          if (math.abs(area) >= 1e-5) {
            if (area >= 0) outer += simplified else inner += simplified
          }
        }
        if (outer.isEmpty) Iterator.empty
        else PolygonAssembly.makePolygons(
          outer.toSeq.map(r => (r :+ r.head)), inner.toSeq.map(r => (r :+ r.head))) match {
          case Some(g) if !g.isEmpty =>
            try Iterator.single((id, Jts.toWkb(g.buffer(0)))) catch { case _: Exception => Iterator.empty }
          case _ => Iterator.empty
        }
      }
      .toDF("id", "wkb")
  }
}
