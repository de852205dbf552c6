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
  * the frontier cells. The loop stops once every query's k-th best
  * distance is provably closer than anything a further ring could hold
  * (ring r's nearest possible point is ≥ (r-1) cell-heights away).
  *
  * Two candidate sources share one search loop:
  *  - [[knn]] — an in-memory cell-indexed cache of the page table; the
  *    frontier join filters rows but every round re-scans the cached
  *    table (fine when the table fits the cluster's cache);
  *  - [[knnIndexed]] — a parquet table written by [[writeIndexed]],
  *    hive-partitioned by the coarse parent cell and cellId-sorted within
  *    files, so each round's read PRUNES whole partition directories
  *    (PartitionFilters on the parent cell) and row-groups (cellId
  *    min/max) instead of re-scanning: the planet-scale shape where the
  *    page table is far bigger than cache.
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
    *
    * `partitionLevel >= 0` pre-partitions the CACHED index by the coarse
    * level-`partitionLevel` parent cell (repartition + sort-within, same
    * layout [[writeIndexed]] puts on disk) and filters each round's scan to
    * the frontier's parent cells BEFORE the join. The in-memory columnar
    * scan keeps per-batch min/max stats and skips non-matching batches
    * (`spark.sql.inMemoryColumnarStorage.partitionPruning`, on by
    * default), so with pcell-clustered batches a round touches only
    * cached batches near the frontier — the in-memory analogue of
    * [[knnIndexed]]'s directory pruning — instead of re-scanning the
    * whole cached table per ring. Default (-1) keeps the plain layout:
    * one shuffle cheaper to build, right when rounds are few or the
    * table is small.
    */
  def knn(pages: DataFrame, queries: Seq[Query], k: Int, level: Int = 8,
          maxRounds: Int = -1, partitionLevel: Int = -1): DataFrame = {
    val spark = pages.sparkSession
    val base = pages.withColumn("cellId", st_cell_at(col("lon"), col("lat"), level))
    val indexed =
      if (partitionLevel >= 0) {
        require(partitionLevel <= level,
          s"partitionLevel $partitionLevel must be <= index level $level")
        base
          .withColumn("pcell", st_cell_at(col("lon"), col("lat"), partitionLevel))
          .select("url", "lon", "lat", "cellId", "pcell")
          .repartition(col("pcell"))
          .sortWithinPartitions(col("pcell"), col("cellId"))
          .cache() // pcell-clustered batches -> per-round batch pruning
      } else {
        base.select("url", "lon", "lat", "cellId")
          .cache() // one materialization feeds every round's frontier join
      }
    try
      search(spark, queries, k, level, maxRounds, (probes, cells) => {
        val source =
          if (partitionLevel >= 0) {
            val parents = cells.map(Cell.parent(_, partitionLevel)).distinct
            indexed.filter(col("pcell").isin(parents: _*))
          } else indexed
        source.join(broadcast(probes), Seq("cellId"))
      })
    finally indexed.unpersist() // result rides checkpointed best-k, not `indexed`
  }

  /** Write the cell-indexed page table for [[knnIndexed]]: hive-partitioned
    * by the level-`partitionLevel` parent cell (`pcell`), cellId-sorted
    * within partitions so parquet row-group min/max stats stay tight. One
    * shuffle; rewriting is only needed when the page table changes.
    */
  def writeIndexed(pages: DataFrame, path: String, level: Int = 8,
                   partitionLevel: Int = 4): Unit = {
    require(partitionLevel <= level,
      s"partitionLevel $partitionLevel must be <= index level $level")
    pages
      .withColumn("cellId", st_cell_at(col("lon"), col("lat"), level))
      // cellAt truncates the same leaf coordinates, so the level-P cell of
      // (lon, lat) IS the level-P ancestor of the level-L cell
      .withColumn("pcell", st_cell_at(col("lon"), col("lat"), partitionLevel))
      .select("url", "lon", "lat", "cellId", "pcell")
      .repartition(col("pcell"))
      .sortWithinPartitions(col("pcell"), col("cellId"))
      .write.mode("overwrite").partitionBy("pcell").parquet(path)
  }

  /** kNN over a [[writeIndexed]] table: identical results to [[knn]]
    * (shared loop), but each round reads ONLY the partition directories
    * whose coarse cell is an ancestor of a frontier cell — the per-round
    * scan is proportional to the frontier, not the table. This is the
    * shape that holds when the page table is planet-scale: no cache big
    * enough to absorb it, no full scan per ring.
    */
  def knnIndexed(spark: SparkSession, path: String, queries: Seq[Query], k: Int,
                 level: Int = 8, partitionLevel: Int = 4,
                 maxRounds: Int = -1): DataFrame = {
    require(partitionLevel <= level,
      s"partitionLevel $partitionLevel must be <= index level $level")
    // ONE file-index listing for the whole search: partition pruning is
    // extracted from each round's filter at planning time, so reusing the
    // DataFrame keeps the per-round PartitionFilters while re-listing the
    // table's directories once instead of once per ring
    val table = spark.read.parquet(path)
    search(spark, queries, k, level, maxRounds, (probes, cells) => {
      val parents = cells.map(Cell.parent(_, partitionLevel)).distinct
      table
        .filter(col("pcell").isin(parents: _*)) // directory-level pruning
        .join(broadcast(probes), Seq("cellId"))
    })
  }

  /** The shared expanding-ring loop. `candFor(probesDf, probeCells)` must
    * return the pages joined to the frontier probes — columns (queryId,
    * qlon, qlat, url, lon, lat) — from whichever source it owns.
    */
  private def search(spark: SparkSession, queries: Seq[Query], k: Int, level: Int,
                     maxRounds: Int,
                     candFor: (DataFrame, Seq[Long]) => DataFrame): DataFrame = {
    import spark.implicits._

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
        val cand = candFor(probesDf, probeCells.map(_._4))
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
