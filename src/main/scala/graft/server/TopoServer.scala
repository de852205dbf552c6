package graft.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
import java.util.concurrent.Executors

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.JsonUtil
import graft.geom.Jts
import graft.operators.{Export, ExportArchive, Ingest, PipJoin}

/** The reference's interactive curation/serving surface
  * (`osmtopo/env.go:140-179` route table, `bin/osmtopo/cmd/cmd_server.go:
  * 30-55`), re-expressed over the Spark engine: every handler is a thin
  * adapter that phrases the request as the SAME DataFrame queries the
  * batch pipeline runs (PipJoin matches/missing/suggestions, Export.layer,
  * Ingest.cellCovers, ExportArchive.tarGz) — the server owns only curation
  * STATE (the per-layer curated relation sets and the missing-coordinate
  * worklist, JSON files under `dataDir`, standing in for the reference's
  * topologies file + LevelDB missing store) and an LRU of rendered
  * TopoJSON documents (`env.go:408-440` topoCache).
  *
  * Routes (reference handler in parens):
  *  - `GET  /api/status`            (env.go:442-445)
  *  - `POST /api/missing`           (env.go:447-456, missing.go:25-61)
  *  - `GET  /api/coordinate`        (env.go:459-470, missing.go:63-140)
  *  - `GET  /api/topo/<layer>/<id>` (env.go:473-500, getTopology 408-440)
  *  - `GET/DELETE /api/coverage/<id>` (env.go:717-756)
  *  - `GET  /api/geometry/<id>`     (env.go:758-… — GeoJSON of a relation)
  *  - `GET  /api/relation/<id>`     (raw entity JSON)
  *  - `POST /api/add`               (env.go:503-…)
  *  - `POST /api/delete`            (env.go:545-…)
  *  - `POST /api/export`            (env.go:566-573, async)
  *  - `GET  /api/topologies`        (env.go:575-…, tar.gz stream)
  *
  * Single-point lookups run through [[PipJoin.matches]] on a tiny probe
  * DataFrame — the broadcast stab+refine path, which is exactly the
  * physical plan you want at 1-100 probe rows; batch imports
  * (`/api/missing`) phrase the whole body as ONE probe table so N
  * coordinates cost one job, not N.
  *
  * `port = 0` binds an ephemeral port (tests); [[boundPort]] reports it.
  */
final class TopoServer(
    spark: SparkSession,
    polygons: DataFrame,
    water: DataFrame,
    layers: Seq[TopoServer.LayerConfig],
    dataDir: Path,
    relations: Option[DataFrame] = None,
    rules: Seq[PipJoin.MatchRule] = Nil,
    port: Int = 0) {

  import TopoServer._

  private val mapper = new ObjectMapper()
  private val lock = new Object
  private val covers = Ingest.cellCovers(polygons).cache()

  // ---- curation state (dataDir/topologies.json: {"layer":[ids…]}) ----
  private var curated: Map[String, Vector[Long]] = {
    val f = dataDir.resolve("topologies.json")
    if (Files.exists(f)) {
      val root = mapper.readTree(Files.readAllBytes(f))
      root.fields().asScala.map { e =>
        e.getKey -> e.getValue.elements().asScala.map(_.asLong()).toVector
      }.toMap
    } else Map.empty
  }

  // ---- missing worklist (dataDir/missing.json: [{"lat":…,"lon":…}]) ----
  private var missing: Vector[MissingCoord] = {
    val f = dataDir.resolve("missing.json")
    if (Files.exists(f)) {
      mapper.readTree(Files.readAllBytes(f)).elements().asScala
        .map(n => MissingCoord(n.get("lat").asDouble(), n.get("lon").asDouble()))
        .toVector
    } else Vector.empty
  }

  private def persistState(): Unit = {
    val topoJson = curated.toSeq.sortBy(_._1).map { case (l, ids) =>
      s"${JsonUtil.quote(l)}:${ids.mkString("[", ",", "]")}"
    }.mkString("{", ",", "}")
    Files.write(dataDir.resolve("topologies.json"), topoJson.getBytes(UTF_8))
    val missJson = missing.map(c =>
      s"""{"lat":${c.lat.toString},"lon":${c.lon.toString}}""")
      .mkString("[", ",", "]")
    Files.write(dataDir.resolve("missing.json"), missJson.getBytes(UTF_8))
  }

  // ---- rendered-topology LRU (env.go topoCache) ----
  private val topoLru = new java.util.LinkedHashMap[String, String](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, String]): Boolean =
      size() > 128
  }

  @volatile private var exportRunning = false
  @volatile private var exportError: String = ""

  // ------------------------------------------------------------------
  // lookups, phrased as engine queries
  // ------------------------------------------------------------------

  private def probeDf(coords: Seq[MissingCoord]): DataFrame = {
    import spark.implicits._
    coords.map(c => (c.key, c.lon, c.lat)).toDF("url", "lon", "lat")
  }

  // Curated dim + covers, cached per curated-set version (the
  // reference's rebuilt `e.topologies` lookup, env.go loadTopologies):
  // /api/coordinate and /api/missing hit these on every request, and
  // recomputing the cover expansion per request would dominate their
  // latency. /api/add bumps the version; the stale pair unpersists.
  private var curatedCacheVersion = -1
  private var curatedCache: Option[(DataFrame, DataFrame)] = None
  @volatile private var curatedVersion = 0

  private def curatedLookup(): Option[(DataFrame, DataFrame)] = lock.synchronized {
    val cur = curated
    val pairs = cur.toSeq.flatMap { case (l, ids) => ids.map(id => (l, id)) }
    if (pairs.isEmpty) return None
    if (curatedCacheVersion != curatedVersion) {
      curatedCache.foreach { case (d, c) => d.unpersist(); c.unpersist() }
      import spark.implicits._
      val curDim = polygons.join(
        broadcast(pairs.toDF("c_layer", "c_relId")),
        col("layer") === col("c_layer") && col("relId") === col("c_relId"), "leftsemi")
        .cache()
      curatedCache = Some((curDim, Ingest.cellCovers(curDim).cache()))
      curatedCacheVersion = curatedVersion
    }
    curatedCache
  }

  /** Per-layer matches of probe coordinates against the CURATED polygon
    * subset (the reference's `e.topologies` lookup) — one Spark job for
    * the whole probe batch. Returns url -> layer -> (relId, name). */
  private def curatedMatches(coords: Seq[MissingCoord]): Map[String, Map[String, (Long, String)]] = {
    if (coords.isEmpty) return Map.empty
    val (curDim, curCovers) = curatedLookup() match {
      case None => return Map.empty
      case Some(p) => p
    }
    val withName = PipJoin.matches(probeDf(coords), curCovers, curDim)
      .join(broadcast(polygons.select(col("relId"), col("layer").as("p_layer"), col("name"))),
        Seq("relId"))
      .filter(col("layer") === col("p_layer"))
      .select("url", "layer", "relId", "name")
    withName.collect().groupBy(_.getString(0)).map { case (u, rows) =>
      u -> rows.map(r => r.getString(1) -> (r.getLong(2), r.getString(3))).toMap
    }
  }

  /** Suggestions for one coordinate from the FULL (uncurated) dimension —
    * the reference's `e.lookup` query in missing.go:87-110 — with the
    * layer match-rules applied. */
  private def suggestFor(c: MissingCoord): Map[String, Seq[(Long, String, Int)]] = {
    val m = PipJoin.matches(probeDf(Seq(c)), covers, polygons)
    val sugg = PipJoin.suggestions(probeDf(Seq(c)), covers, polygons, m, rules)
      .select("layer", "relId", "name", "adminLevel")
      .collect()
    sugg.groupBy(_.getString(0)).map { case (l, rows) =>
      l -> rows.map(r => (r.getLong(1), r.getString(2), r.getInt(3))).toSeq
        .sortBy(_._1)
    }
  }

  /** Render one object's TopoJSON exactly as the batch export does
    * (env.go:408-440: Select(id) → Simplify(layer) → ClipWater →
    * Quantize(1e6)), through [[Export.layer]] + [[Export.writeSlices]]. */
  private def renderTopo(layerId: String, id: Long): Option[String] = {
    val cfg = layers.find(_.id == layerId)
      .getOrElse(throw new IllegalArgumentException(s"Unknown layer: $layerId"))
    val key = s"$layerId-$id"
    lock.synchronized(Option(topoLru.get(key))) match {
      case Some(doc) => Some(doc)
      case None =>
        val exists = polygons
          .filter(col("layer") === layerId && col("relId") === id).limit(1).count() > 0
        if (!exists) None
        else {
          val result = Export.layer(polygons, water, layerId, Seq(id),
            simplifyDigits = cfg.simplifyDigits, quantize = 1e6,
            pointLimit = Int.MaxValue, relations = relations,
            languages = cfg.languages)
          try {
            val tmp = Files.createTempDirectory("topo_api")
            try {
              val files = Export.writeSlices(result, tmp.toString)
              val doc = new String(Files.readAllBytes(Path.of(files.head)), UTF_8)
              lock.synchronized(topoLru.put(key, doc))
              Some(doc)
            } finally {
              Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
                .forEach(p => Files.deleteIfExists(p))
            }
          } finally result.release()
        }
    }
  }

  /** Import missing coordinates: keep only those NOT matched by every
    * configured layer's curated set (missing.go:25-61) — one batch job. */
  private def importMissing(coords: Seq[MissingCoord]): Int = {
    val matched = curatedMatches(coords)
    val layerIds = layers.map(_.id).toSet
    val incomplete = coords.filter { c =>
      val m = matched.getOrElse(c.key, Map.empty)
      !layerIds.forall(m.contains)
    }
    lock.synchronized {
      val known = missing.map(_.key).toSet
      val add = incomplete.filterNot(c => known(c.key))
      missing = missing ++ add
      persistState()
      missing.size
    }
  }

  /** Next incomplete coordinate + per-layer matched/suggestions
    * (missing.go:63-140): complete heads are removed and the scan
    * continues, exactly the reference's recursion. Returns JSON. */
  private def nextCoordinate(): String = {
    while (true) {
      val head = lock.synchronized(missing.headOption)
      head match {
        case None => return "null"
        case Some(c) =>
          val matched = curatedMatches(Seq(c)).getOrElse(c.key, Map.empty)
          val unmatchedLayers = layers.map(_.id).filterNot(matched.contains)
          if (unmatchedLayers.isEmpty) {
            lock.synchronized { missing = missing.filterNot(_.key == c.key); persistState() }
            // loop: next head
          } else {
            val sugg = suggestFor(c)
            val suggJson = unmatchedLayers.map { l =>
              val entries = sugg.getOrElse(l, Nil).map { case (id, name, al) =>
                s"""{"id":$id,"name":${JsonUtil.quote(Option(name).getOrElse(""))},"admin_level":$al}"""
              }.mkString("[", ",", "]")
              s"${JsonUtil.quote(l)}:$entries"
            }.mkString("{", ",", "}")
            val matchedJson = matched.keys.toSeq.sorted.map(l => s"${JsonUtil.quote(l)}:true")
              .mkString("{", ",", "}")
            val nameJson = matched.toSeq.sortBy(_._1).map { case (l, (_, n)) =>
              s"${JsonUtil.quote(l)}:${JsonUtil.quote(Option(n).getOrElse(""))}"
            }.mkString("{", ",", "}")
            val idJson = matched.toSeq.sortBy(_._1).map { case (l, (id, _)) =>
              s"${JsonUtil.quote(l)}:$id"
            }.mkString("{", ",", "}")
            return s"""{"coordinate":{"lat":${c.lat.toString},"lon":${c.lon.toString}},""" +
              s""""suggestions":$suggJson,"matched":$matchedJson,""" +
              s""""matchnames":$nameJson,"matchids":$idJson}"""
          }
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def runExport(): Unit = {
    exportRunning = true; exportError = ""
    try {
      val exportDir = dataDir.resolve("export")
      Files.createDirectories(exportDir)
      val cur = lock.synchronized(curated)
      layers.foreach { cfg =>
        val ids = cur.getOrElse(cfg.id, Vector.empty)
        if (ids.nonEmpty) {
          val result = Export.layer(polygons, water, cfg.id, ids,
            simplifyDigits = cfg.simplifyDigits, quantize = 1e6,
            relations = relations, languages = cfg.languages)
          try {
            val layerDir = exportDir.resolve(cfg.id)
            Files.createDirectories(layerDir)
            Export.writeSlices(result, layerDir.toString)
          } finally result.release()
        }
      }
      ExportArchive.tarGz(exportDir, dataDir.resolve("export.tar.gz"))
    } catch {
      case e: Exception => exportError = Option(e.getMessage).getOrElse(e.toString)
    } finally exportRunning = false
  }

  // ------------------------------------------------------------------
  // HTTP plumbing
  // ------------------------------------------------------------------

  private val server: HttpServer = HttpServer.create(new InetSocketAddress(port), 0)
  // non-daemon pool: must be shut down in stop() or it pins the JVM
  // (DestroyJavaVM waits on live non-daemon threads after main returns)
  private val executor = Executors.newFixedThreadPool(4)
  server.setExecutor(executor)

  def boundPort: Int = server.getAddress.getPort

  private def respond(ex: HttpExchange, code: Int, body: Array[Byte],
                      contentType: String = "application/json"): Unit = {
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
    if (body.nonEmpty) ex.getResponseBody.write(body)
    ex.close()
  }
  private def respond(ex: HttpExchange, code: Int, body: String): Unit =
    respond(ex, code, body.getBytes(UTF_8))

  private def handle(path: String)(f: HttpExchange => Unit): Unit =
    server.createContext(path, (ex: HttpExchange) =>
      try f(ex)
      catch {
        case e: IllegalArgumentException => respond(ex, 400, Option(e.getMessage).getOrElse(""))
        case e: Exception => respond(ex, 500, Option(e.getMessage).getOrElse(e.toString))
      })

  private def idFromPath(ex: HttpExchange, depth: Int): Long = {
    val parts = ex.getRequestURI.getPath.split("/")
    if (parts.length != depth) throw new IllegalArgumentException("Missing ID")
    parts.last.toLong
  }

  handle("/api/status") { ex =>
    val n = lock.synchronized(missing.size)
    val layersJson = layers.map(l => JsonUtil.quote(l.id)).mkString("[", ",", "]")
    respond(ex, 200,
      s"""{"missing":$n,"export":{"running":$exportRunning,"error":${JsonUtil.quote(exportError)}},"layers":$layersJson}""")
  }

  handle("/api/missing") { ex =>
    if (ex.getRequestMethod != "POST") respond(ex, 400, "Should send a POST request")
    else {
      val root = mapper.readTree(ex.getRequestBody)
      val coords = root.elements().asScala
        .map(n => MissingCoord(n.get("lat").asDouble(), n.get("lon").asDouble())).toSeq
      val total = importMissing(coords)
      respond(ex, 200, s"""{"missing":$total}""")
    }
  }

  handle("/api/coordinate") { ex => respond(ex, 200, nextCoordinate()) }

  handle("/api/topo/") { ex =>
    val parts = ex.getRequestURI.getPath.split("/")
    if (parts.length != 5) respond(ex, 404, "Missing ID")
    else renderTopo(parts(3), parts(4).toLong) match {
      case Some(doc) => respond(ex, 200, doc)
      case None => respond(ex, 404, "Not Found")
    }
  }

  handle("/api/coverage/") { ex =>
    val id = idFromPath(ex, 4)
    ex.getRequestMethod match {
      case "GET" =>
        val cells = covers.filter(col("relId") === id)
          .select("cellId").collect().map(_.getLong(0)).sorted
        if (cells.isEmpty) respond(ex, 404, "Not Found")
        else respond(ex, 200, cells.mkString("[", ",", "]"))
      case "DELETE" =>
        // covers are DERIVED here (recomputed from geometry on ingest);
        // deleting a persisted cover to force recompute, as the
        // reference does, has no analogue — evict any rendered topo
        // documents for the relation instead
        lock.synchronized {
          topoLru.keySet().removeIf(_.endsWith(s"-$id")); ()
        }
        respond(ex, 200, "")
      case m => respond(ex, 400, s"Method not allowed: $m")
    }
  }

  handle("/api/geometry/") { ex =>
    val id = idFromPath(ex, 4)
    val rows = polygons.filter(col("relId") === id).select("wkb").limit(1).collect()
    if (rows.isEmpty) respond(ex, 404, "Not Found")
    else respond(ex, 200, geoJson(Jts.fromWkb(rows.head.getAs[Array[Byte]](0))))
  }

  handle("/api/relation/") { ex =>
    val id = idFromPath(ex, 4)
    relations match {
      case None => respond(ex, 404, "Not Found")
      case Some(rels) =>
        val rows = rels.filter(col("id") === id).limit(1).collect()
        if (rows.isEmpty) respond(ex, 404, "Not Found")
        else respond(ex, 200, entityJson(rows.head))
    }
  }

  handle("/api/add") { ex =>
    if (ex.getRequestMethod != "POST") respond(ex, 400, "Should send a POST request")
    else {
      val root = mapper.readTree(ex.getRequestBody)
      lock.synchronized {
        layers.foreach { cfg =>
          val node = root.get(cfg.id)
          if (node != null) {
            val id = node.asLong()
            if (!curated.getOrElse(cfg.id, Vector.empty).contains(id)) {
              curated = curated.updated(cfg.id, curated.getOrElse(cfg.id, Vector.empty) :+ id)
              curatedVersion += 1 // invalidates the cached curated lookup
            }
          }
        }
        persistState()
      }
      respond(ex, 200, "")
    }
  }

  handle("/api/delete") { ex =>
    if (ex.getRequestMethod != "POST") respond(ex, 400, "Should send a POST request")
    else {
      val n = mapper.readTree(ex.getRequestBody)
      val c = MissingCoord(n.get("lat").asDouble(), n.get("lon").asDouble())
      lock.synchronized { missing = missing.filterNot(_.key == c.key); persistState() }
      respond(ex, 200, "")
    }
  }

  handle("/api/export") { ex =>
    if (ex.getRequestMethod != "POST") respond(ex, 400, "Should send a POST request")
    else {
      if (!exportRunning) {
        val t = new Thread(() => runExport(), "topo-export")
        t.setDaemon(true); t.start()
      }
      respond(ex, 200, "")
    }
  }

  handle("/api/topologies") { ex =>
    if (exportRunning) respond(ex, 400, "Export is currently running")
    else if (exportError.nonEmpty) respond(ex, 500, s"Export failed: $exportError")
    else {
      val f = dataDir.resolve("export.tar.gz")
      if (!Files.exists(f)) respond(ex, 404, "Not Found")
      else respond(ex, 200, Files.readAllBytes(f), "application/gzip")
    }
  }

  def start(): TopoServer = { server.start(); this }

  def stop(): Unit = {
    server.stop(0)
    executor.shutdown()
    covers.unpersist()
    lock.synchronized {
      curatedCache.foreach { case (d, c) => d.unpersist(); c.unpersist() }
      curatedCache = None
    }
  }
}

object TopoServer {

  /** One export layer (reference `config.Layers`): simplification level
    * and the languages whose `name:<lang>` tags ride export properties. */
  case class LayerConfig(id: String, simplifyDigits: Int, languages: Seq[String] = Nil)

  case class MissingCoord(lat: Double, lon: Double) {
    def key: String = s"$lat,$lon"
  }

  /** Relation row → entity JSON (id + tags map, the reference's raw
    * model JSON). Columns beyond relId/tags are ignored. */
  private[server] def entityJson(row: Row): String = {
    val id = row.getLong(row.fieldIndex("id"))
    val tagsJson =
      if (row.schema.fieldNames.contains("tags")) {
        val m = row.getAs[Map[String, String]]("tags")
        m.toSeq.sortBy(_._1)
          .map { case (k, v) => s"${JsonUtil.quote(k)}:${JsonUtil.quote(v)}" }
          .mkString("{", ",", "}")
      } else "{}"
    s"""{"id":$id,"tags":$tagsJson}"""
  }

  /** Minimal Polygon/MultiPolygon GeoJSON writer (geometry only — the
    * reference serves the stored per-relation GeoJSON blob). */
  private[server] def geoJson(g: org.locationtech.jts.geom.Geometry): String = {
    def ringJson(r: org.locationtech.jts.geom.LineString): String =
      r.getCoordinates.map(c => s"[${c.x},${c.y}]")
        .mkString("[", ",", "]")
    def polyJson(p: org.locationtech.jts.geom.Polygon): String =
      (ringJson(p.getExteriorRing) +:
        (0 until p.getNumInteriorRing).map(i => ringJson(p.getInteriorRingN(i))))
        .mkString("[", ",", "]")
    g match {
      case p: org.locationtech.jts.geom.Polygon =>
        s"""{"type":"Polygon","coordinates":${polyJson(p)}}"""
      case mp: org.locationtech.jts.geom.MultiPolygon =>
        val polys = (0 until mp.getNumGeometries)
          .map(i => polyJson(mp.getGeometryN(i).asInstanceOf[org.locationtech.jts.geom.Polygon]))
          .mkString("[", ",", "]")
        s"""{"type":"MultiPolygon","coordinates":$polys}"""
      case other =>
        throw new IllegalArgumentException(s"Unsupported geometry: ${other.getGeometryType}")
    }
  }
}
