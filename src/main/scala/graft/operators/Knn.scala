package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.cells.Cell
import graft.functions.GeomExpressions._

/** E7: k-nearest-neighbors via expanding cell-ring search (graft extension
  * required by the north rule). For a small set of query points, iterate
  * rings of cells at a fixed index level around each query: candidates
  * come from a broadcast equi-join of the cell-indexed page table against
  * the frontier cells (the join filters to frontier pages; the scan
  * itself is per-round — cache absorbs it here, and a planet-scale
  * deployment would pre-partition the table by cellId, see
  * `Tiling.spatialRepartition`, so the equi-join prunes at the source).
  * The loop stops once every query's k-th best distance is provably
  * closer than anything a further ring could hold (ring r's nearest
  * possible point is ≥ (r-1) cell-heights away).
  *
  * Deterministic: ties broken by url.
  */
object Knn {

  case class Query(queryId: String, lon: Double, lat: Double)

  /** `maxRounds <= 0` (default) derives a budget from `level` that always
    * reaches the whole-grid radius (the frontier doubles per round, so
    * level+4 rounds suffice); passing an explicit smaller budget that
    * exhausts before every query completes FAILS loudly — a silently
    * truncated search would return wrong neighbors as if definitive.
    */
  def knn(pages: DataFrame, queries: Seq[Query], k: Int, level: Int = 8,
          maxRounds: Int = -1): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._

    val indexed = pages
      .withColumn("cellId", st_cell_at(col("lon"), col("lat"), level))
      .select("url", "lon", "lat", "cellId")
      .cache() // one materialization feeds every round's frontier join

    // meters per cell-height at this level (latitude degrees are uniform on
    // the equirectangular grid; conservative lower bound for ring pruning)
    val cellLatDeg = 180.0 / (1L << level).toDouble
    val metersPerLatDeg = graft.geom.Algorithms.EarthRadius * math.Pi / 180.0

    val maxRadius = (1L << level).toInt // whole grid searched beyond this
    val roundBudget = if (maxRounds > 0) maxRounds else level + 4

    // bounded per-round state: only each query's best-k survives a round
    // (≤ queries×k rows), so the per-round checkpoint is O(qk), not the
    // full accumulated candidate history
    var best: Option[DataFrame] = None
    // searched radius per query (-1 = nothing searched yet); ring batches
    // double in width so sparse regions converge in O(log grid) rounds
    var frontier = queries.map(q => q.queryId -> -1).toMap
    var done = Set.empty[String]
    var round = 0

    while (done.size < queries.size && round < roundBudget) {
      val probeCells = queries.filterNot(q => done(q.queryId)).flatMap { q =>
        val qcell = Cell.cellAt(q.lon, q.lat, level)
        val from = frontier(q.queryId) + 1
        val to = math.min(maxRadius, if (from == 0) 0 else math.max(from, frontier(q.queryId) * 2))
        (from to to).flatMap(r => Cell.ring(qcell, r)).map(c => (q.queryId, q.lon, q.lat, c))
      }
      if (probeCells.nonEmpty) {
        val probesDf = probeCells.toDF("queryId", "qlon", "qlat", "cellId")
        val cand = indexed
          .join(broadcast(probesDf), Seq("cellId"))
          .withColumn("dist", st_geo_distance(col("qlon"), col("qlat"), col("lon"), col("lat")))
          .select("queryId", "url", "dist")
        // fold the new ring's candidates into the running best-k and
        // checkpoint THAT (tiny), truncating lineage each round
        val merged = best.map(_.unionByName(cand)).getOrElse(cand)
        val w = Window.partitionBy(col("queryId")).orderBy(col("dist"), col("url"))
        best = Some(merged
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k)
          .drop("rn")
          .localCheckpoint())
      }

      // per-query k-th distance so far (best is already ≤ k per query)
      val stats = best.get
        .groupBy("queryId").agg(count(lit(1)).as("n"), max("dist").as("kth"))
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

      queries.foreach { q =>
        if (!done(q.queryId)) {
          val from = frontier(q.queryId) + 1
          val searched = math.min(maxRadius, if (from == 0) 0 else math.max(from, frontier(q.queryId) * 2))
          // anything in ring >= searched+1 is at least `searched` cell-heights
          // away vertically, or `searched` cell-widths horizontally (lon
          // shrinks by cos(lat) under the equirectangular metric — take min)
          val latBound = searched * cellLatDeg * metersPerLatDeg
          val cosLat = math.cos(math.toRadians(
            math.min(89.9, math.abs(q.lat) + (searched + 1) * cellLatDeg)))
          val lonBound = searched * (2 * cellLatDeg) * math.max(0.0, cosLat) * metersPerLatDeg
          val lowerBound = math.min(latBound, lonBound)
          stats.get(q.queryId) match {
            // STRICT <: at kth == lowerBound an unsearched ring could hold
            // an equal-distance, lexicographically-smaller url whose tie
            // must win under the documented (dist, url) order
            case Some((n, kth)) if n >= k && (kth < lowerBound || searched >= maxRadius) =>
              done += q.queryId
            case _ if searched >= maxRadius => done += q.queryId
            case _ => frontier += q.queryId -> searched
          }
        }
      }
      round += 1
    }
    indexed.unpersist()
    if (done.size < queries.size)
      throw new IllegalStateException(
        s"knn: ${queries.size - done.size} queries unfinished after $roundBudget rounds — " +
          "raise maxRounds (results would be silently wrong if returned)")

    val w = Window.partitionBy(col("queryId")).orderBy(col("dist"), col("url"))
    best.getOrElse(Seq.empty[(String, String, Double)].toDF("queryId", "url", "dist"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("queryId"), col("rn").as("rank"), col("url"), col("dist"))
  }
}
