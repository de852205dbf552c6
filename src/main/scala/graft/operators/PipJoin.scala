package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GeomExpressions._

/** The central spatial join: "for each page (point), which polygons of
  * each layer contain it?" — the Spark re-expression of the reference's
  * segment-tree stab + exact GEOS refine
  * (/root/reference/osmtopo/lookup/lookup.go:156-174, env.go:657-715).
  *
  * Coarse phase: a cover cell containing a point's leaf cell is necessarily
  * an *ancestor* of that leaf (quadtree ranges are nested-or-disjoint), so
  * the interval-stab becomes an **equi-join**: explode each page into its
  * ancestor cell ids at the cover's level band and hash-join against the
  * cover table on cellId. No range predicate, no false negatives.
  *
  * Exact phase: residual `ST_Contains(polyWkb, lon, lat)` with prepared
  * geometries memoized per executor.
  *
  * Two physical strategies, per the north rule's skew requirement:
  *  - broadcast (default): covers ⋈ polygons is tiny → broadcast; the
  *    explode is map-side, zero shuffle of the page table;
  *  - partitioned: for dimension tables too big to broadcast — covers are
  *    exploded to a fixed join level and shuffled; pages carry one row per
  *    fixed-level cell, optionally salted for hot cells.
  */
object PipJoin {

  /** Auto-prune rule for [[matchesPartitioned]]: enable the probe-side
    * pre-shuffle semi-join when the build side covers less than this
    * fraction of the join-level grid. Below it, enough probe cells are
    * guaranteed-uncovered that dropping their pages before the shuffle
    * beats the broadcast-semi-join's per-row cost; at ~full coverage the
    * semi-join keeps every row and is pure overhead.
    */
  val PruneCoverageThreshold = 0.8

  /** Level band actually present in a cover table — probing only these
    * levels shrinks the page-side explode from 19 ancestors to the band in
    * use (collected once; the cover table is the small side).
    */
  // level from a cell id's trailing-zero count. Round, don't truncate:
  // log2(2^58) evaluates to 58.000000000000004 in doubles, and truncation
  // would misclassify coarse levels (shrinking the ancestor band and
  // silently dropping matches). Single definition — band and join-level
  // stats must never drift apart.
  private val levelExpr = "cast(round(30 - log2(cellId & -cellId) / 2) as int)"

  def coverLevelBand(covers: DataFrame): (Int, Int) = {
    val row = covers
      .select(expr(levelExpr).as("lvl"))
      .agg(min("lvl"), max("lvl")).head()
    // empty cover table → empty match set; any band works, use the
    // narrowest (one ancestor) instead of NPEing on the null aggregate
    if (row.isNullAt(0)) (graft.cells.Coverer.MinLevel, graft.cells.Coverer.MinLevel)
    else (row.getInt(0), row.getInt(1))
  }

  /** Broadcast strategy. `pages` needs (url, lon, lat); covers
    * (relId, layer, cellId); polygons (relId, wkb). Output: one row per
    * (url, layer, relId) containment — identical row set to the
    * reference's queryLookup matches.
    */
  def matches(pages: DataFrame, covers: DataFrame, polygons: DataFrame,
              extraPageCols: Seq[String] = Nil): DataFrame = {
    val (minL, maxL) = coverLevelBand(covers)
    // TWO broadcasts, geometry broadcast ONCE per relation: joining
    // covers⋈polygons before broadcasting would replicate each polygon's
    // WKB onto every cover cell (≤8× blob inflation of the broadcast —
    // the budget-killer exactly where broadcast is supposed to win). A
    // page's ancestor chain hits at most one cell of a relation's
    // normalized-disjoint cover, so candidate multiplicity is unchanged;
    // the exact refine rides the second join's condition.
    val polyDim = polygons.select(col("relId").as("p_relId"), col("wkb"))
    pages
      .withColumn("cellId", explode(st_cell_ancestors(col("lon"), col("lat"), minL, maxL)))
      .join(broadcast(covers.select("relId", "layer", "cellId")), Seq("cellId"))
      .join(broadcast(polyDim),
        col("relId") === col("p_relId") &&
          st_contains_point_keyed(col("relId"), col("wkb"), col("lon"), col("lat")))
      .select((Seq("url", "layer", "relId") ++ extraPageCols).map(col): _*)
  }

  /** Broadcast-index strategy: the hot path for fact-side scans. The whole
    * stab+refine runs inside one probe expression over a broadcast
    * PipIndex, emitting only true matches — ~2-3 output rows per matched
    * page instead of ~11 ancestor join rows, which removes the dominant
    * memory traffic at scale. Identical rows to `matches` (tested).
    */
  def matchesIndexed(pages: DataFrame, covers: DataFrame, polygons: DataFrame,
                     extraPageCols: Seq[String] = Nil): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val coverArr = covers.select("relId", "layer", "cellId")
      .as[(Long, String, Long)].collect()
    val polyMap = polygons.select("relId", "wkb").as[(Long, Array[Byte])].collect().toMap
    // a cover row whose relation is absent from `polygons` (caller passed
    // a filtered polygon slice) must drop like the join strategies drop
    // it, not NoSuchElementException on the driver
    val index = PipIndex.build(coverArr.filter(c => polyMap.contains(c._1)), polyMap)
    val bc = spark.sparkContext.broadcast(index)
    val ordinals = index.polys.zipWithIndex
      .map { case (p, i) => (i, p.relId, p.layer) }.toSeq
      .toDF("ordinal", "relId", "layer")

    val probe = org.apache.spark.sql.graft.Bridge.column(PipProbe(
      org.apache.spark.sql.graft.Bridge.expression(col("lon")),
      org.apache.spark.sql.graft.Bridge.expression(col("lat")), bc))

    pages
      .withColumn("ordinal", explode(probe))
      .join(broadcast(ordinals), Seq("ordinal"))
      .select((Seq("url", "layer", "relId") ++ extraPageCols).map(col): _*)
  }

  /** joinLevel from cover stats: fine enough that most cover cells map UP
    * to their ancestor (no 4^Δ descend blow-up), coarse enough to keep the
    * per-key build rows bounded — the 75th-percentile cover level, clamped.
    */
  def chooseJoinLevel(covers: DataFrame, maxJoinLevel: Int = 12): Int = {
    val row = covers
      .select(expr(levelExpr).as("lvl"))
      .agg(expr("percentile(lvl, 0.75)")).head()
    if (row.isNullAt(0)) graft.cells.Coverer.MinLevel // empty covers → empty join
    else math.max(graft.cells.Coverer.MinLevel,
      math.min(maxJoinLevel, math.round(row.getDouble(0)).toInt))
  }

  /** Partitioned strategy for non-broadcastable dimension sides: covers are
    * exploded down/up to `joinLevel` and **pre-aggregated to one build row
    * per (relId, layer, joinCell)** carrying the merged leaf-range list;
    * pages carry exactly one join key (their `joinLevel` ancestor) plus a
    * salt. Because the build side is unique per key and each page has one
    * key, the probe join emits at most one candidate per (page, relation) —
    * no output-side dropDuplicates shuffle of the (huge) match set.
    * Coarse cover cells descend to their `joinLevel` descendants (range =
    * whole join cell); finer cells map to their ancestor keeping their own
    * range for the residual test. AQE's skew-join handles stragglers;
    * `salt` > 1 additionally replicates the cover side for hot cells.
    * `joinLevel <= 0` picks the level from cover stats.
    *
    * `pruneProbe` — probe-side pre-shuffle semi-join pruning. `None`
    * (default) decides from cover DENSITY: count the distinct build
    * joinCells against the level-`jl` grid (2·4^jl cells) and prune when
    * the covered fraction is below [[PruneCoverageThreshold]] — a sparse
    * cover means whole swaths of probe cells can only be dropped by the
    * join, which the semi-join does BEFORE the shuffle (measured 14.8×
    * with salt on the skewed 100 M bench, BENCH.md round 6); a dense
    * cover makes the semi-join pure cost (every probe survives).
    * `Some(x)` forces the choice (benchmarks, known-shape callers).
    */
  def matchesPartitioned(pages: DataFrame, covers: DataFrame, polygons: DataFrame,
                         joinLevel: Int = 0, salt: Int = 1,
                         pruneProbe: Option[Boolean] = None): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val jl = if (joinLevel > 0) joinLevel else chooseJoinLevel(covers)

    val coverCellsBase = covers.select(col("relId"), col("layer"), col("cellId"))
      .as[(Long, String, Long)]
      .flatMap { case (relId, layer, cellId) =>
        val l = graft.cells.Cell.level(cellId)
        if (l >= jl) {
          // fine cell: ancestor key, keep the cell's own leaf range
          Iterator.single((relId, layer, graft.cells.Cell.parent(cellId, jl),
            graft.cells.Cell.rangeMin(cellId), graft.cells.Cell.rangeMax(cellId)))
        } else {
          // descend to joinLevel: at most 4^(jl-l) cells; coarse cover
          // cells are rare (big polygons) by construction. The descendant
          // IS the join cell, so its range is the whole cell.
          def desc(c: Long): Iterator[Long] =
            if (graft.cells.Cell.level(c) == jl) Iterator.single(c)
            else graft.cells.Cell.children(c).iterator.flatMap(desc)
          desc(cellId).map(j =>
            (relId, layer, j, graft.cells.Cell.rangeMin(j), graft.cells.Cell.rangeMax(j)))
        }
      }
      .toDF("relId", "layer", "joinCell", "rmin", "rmax")
    // ONE build row per (relId, layer, joinCell): merged range list.
    // This shuffles only the (small) dimension side, once. The distinct
    // joinCell set below derives from THIS aggregated form, so the cover
    // explode's exchange is shared (ReuseExchange) instead of the explode
    // running twice (ADVICE round 6).
    val coverAgg = coverCellsBase
      .groupBy("relId", "layer", "joinCell")
      .agg(collect_list(struct(col("rmin"), col("rmax"))).as("ranges"))
    val coverCells = coverAgg
      .withColumn("salt", explode(sequence(lit(0), lit(salt - 1))))

    val doPrune = pruneProbe.getOrElse(
      autoPrune(coverAgg.select("joinCell").distinct().count(), jl))

    val probes0 = pages
      .withColumn("joinCell", st_cell_at(col("lon"), col("lat"), jl))
      .withColumn("leaf", st_cell_at(col("lon"), col("lat"), graft.cells.Cell.MaxLevel))
      .withColumn("salt", pmod(hash(col("url")), lit(salt)))

    // probe-side pruning: pages whose joinCell has NO build row can only
    // be dropped by the join — a broadcast SEMI-join on the distinct
    // build cells (grid-bounded: ≤ #cells at joinLevel, independent of
    // dimension size) drops them BEFORE the shuffle instead of after.
    // Spark's own runtime bloom filter does this automatically only past
    // its 10 GB application-side scan threshold; this makes the pruning
    // unconditional. Row set unchanged (semi-join of an inner-join key).
    val probes =
      if (!doPrune) probes0
      else probes0.join(broadcast(coverAgg.select("joinCell").distinct()),
        Seq("joinCell"), "left_semi")

    probes
      .join(coverCells, Seq("joinCell", "salt"))
      .filter(exists(col("ranges"),
        r => col("leaf") >= r.getField("rmin") && col("leaf") <= r.getField("rmax")))
      .join(polygons.select(col("relId"), col("wkb")), Seq("relId"))
      .filter(st_contains_point_keyed(col("relId"), col("wkb"), col("lon"), col("lat")))
      .select("url", "layer", "relId")
  }

  /** The auto-prune density rule: prune when the build side covers less
    * than [[PruneCoverageThreshold]] of the level-`jl` grid. The Cell
    * scheme is ONE quadtree square — exactly 4^jl cells at level jl. (A
    * doubled denominator here capped the fraction at 0.5 and made auto
    * mode enable the semi-join unconditionally: dense covers paid the
    * broadcast semi-join for zero dropped rows — ADVICE r7 #1.
    * PipelineSpec pins full coverage ⇒ no prune.)
    */
  private[operators] def autoPrune(coveredCells: Long, jl: Int): Boolean =
    coveredCells.toDouble / math.pow(4.0, jl) < PruneCoverageThreshold

  /** Hybrid strategy (SURVEY §4 physical notes): split the polygon
    * dimension by expected probe traffic — relations whose covers span the
    * most leaf range (the proxy for "how many pages will stab this
    * polygon") are served by the broadcast index up to a byte budget; the
    * heavy tail goes through the partitioned shuffle join. Each relation
    * is handled by exactly one path, so the union is duplicate-free and
    * row-identical to `matches` (tested). This is the load-bearing shape
    * when the FULL dimension no longer fits an executor but the hot subset
    * does: hot traffic stays shuffle-free, cold traffic shuffles once.
    *
    * The hot prefix is selected DISTRIBUTED: rank rows are range-
    * partitioned in (hits desc, relId) order, a per-partition byte-total
    * pass (one tiny row per partition) yields each partition's starting
    * offset, and an in-partition running sum marks rows whose inclusive
    * cumulative bytes fit the budget. Only the hot subset — bounded by the
    * budget by construction, the same class of data the broadcast build
    * collects anyway — ever reaches the driver; the full dimension ranking
    * never does.
    */
  def matchesHybrid(pages: DataFrame, covers: DataFrame, polygons: DataFrame,
                    broadcastBudgetBytes: Long = 64L << 20, salt: Int = 1): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val ranked = covers
      .groupBy("relId").agg(sum(col("cellMax") - col("cellMin") + lit(1)).as("hits"))
      .join(polygons.select(col("relId"), length(col("wkb")).as("bytes")), Seq("relId"))
      .select(col("hits"), col("relId"), col("bytes"))
      // localCheckpoint pins one physical layout: the totals pass and the
      // prefix pass below must observe identical partitioning + order
      .repartitionByRange(col("hits").desc, col("relId").asc)
      .sortWithinPartitions(col("hits").desc, col("relId").asc)
      .as[(Long, Long, Long)]
      .localCheckpoint()
    // pass 1: per-partition (bytes total, row count) — numPartitions rows
    val partStats = ranked.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var bytes = 0L; var n = 0L
        it.foreach { r => bytes += r._3; n += 1 }
        Iterator.single((pid, bytes, n))
      }.collect().sortBy(_._1)
    val nTotal = partStats.map(_._3).sum
    val offsets = partStats.scanLeft(0L)(_ + _._2).dropRight(1) // bytes before pid
    // pass 2: in-partition running sum; keep the prefix whose INCLUSIVE
    // cumulative bytes fit the budget. (Prefix semantics: selection stops
    // at the first relation that overflows — a cumulative-sum rule every
    // partition can evaluate from its offset alone. DELIBERATE trade-off
    // vs first-fit, ADVICE r4: one oversized high-rank relation can push
    // the whole tail to the shuffle path and strand budget — accepted,
    // because first-fit needs kept-bytes-only offsets, which are not
    // partition-local, and output rows are identical on either path.)
    val hot: Array[Long] = ranked.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var run = offsets(pid)
        it.flatMap { case (_, relId, bytes) =>
          run += bytes
          if (run <= broadcastBudgetBytes) Iterator.single(relId) else Iterator.empty
        }
      }.collect()
    // split via broadcast semi/anti join, NOT a literal isin: an In-list
    // builds one literal per hot relation — fine for dozens, pathological
    // (expression-tree sized) for 10⁵ hot relations
    val hotDf = broadcast(hot.toSeq.toDF("relId"))
    def hotOnly(df: DataFrame) = df.join(hotDf, Seq("relId"), "left_semi")
    def coldOnly(df: DataFrame) = df.join(hotDf, Seq("relId"), "left_anti")
    val bcastPart =
      if (hot.isEmpty) None
      else Some(matchesIndexed(pages, hotOnly(covers), hotOnly(polygons)))
    val shufflePart =
      if (hot.length == nTotal) None
      // pruneProbe: the cold tail's cover cells are the SPARSE part of
      // the grid (hot relations absorbed the high-traffic cells), so the
      // pre-shuffle semi-join drop is exactly where it pays — pages in
      // hot-only cells never enter the cold shuffle
      else Some(matchesPartitioned(pages, coldOnly(covers), coldOnly(polygons), salt = salt,
        pruneProbe = Some(true)))
    (bcastPart, shufflePart) match {
      case (Some(b), Some(s)) => b.unionByName(s)
      case (Some(b), None) => b
      case (None, Some(s)) => s
      case (None, None) => pages.sparkSession.emptyDataFrame
        .select(lit("").as("url"), lit("").as("layer"), lit(0L).as("relId")).limit(0)
    }
  }

  /** Skew-aware salt selection (SURVEY §7 hard part c): sample the pages'
    * join-level cells and size the salt so the hottest cell's share of a
    * shuffle partition stays bounded. salt ≈ ceil(hottestShare × shuffle
    * partitions), clamped to [1, maxSalt]. AQE's skew join remains the
    * runtime backstop; this bounds the build-side replication up front.
    */
  def autoSalt(pages: DataFrame, joinLevel: Int = 8, sampleFraction: Double = 0.05,
               maxSalt: Int = 16): Int = {
    val spark = pages.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sample = pages.sample(withReplacement = false, sampleFraction, seed = 42)
      .withColumn("joinCell", st_cell_at(col("lon"), col("lat"), joinLevel))
      .groupBy("joinCell").count()
      .agg(max("count").as("hot"), sum("count").as("total")).head()
    if (sample.isNullAt(0) || sample.getLong(1) == 0) 1
    else {
      val hotShare = sample.getLong(0).toDouble / sample.getLong(1)
      math.max(1, math.min(maxSalt, math.ceil(hotShare * parts).toInt))
    }
  }

  /** J7: matched-per-layer pivot — one row per url with the matched relId
    * per layer (first match, deterministic by min relId).
    */
  def perLayer(matches: DataFrame, layers: Seq[String]): DataFrame =
    matches.groupBy("url").pivot("layer", layers).agg(min("relId"))

  /** J8: completeness — pages NOT matched in all `layers` (the "missing"
    * workflow, missing.go:25-61): emitted with the set of layers they did
    * match.
    */
  def missing(pages: DataFrame, matches: DataFrame, layers: Seq[String]): DataFrame = {
    val counts = matches
      .filter(col("layer").isin(layers: _*))
      .groupBy("url").agg(countDistinct("layer").as("nLayers"))
    pages.join(counts, Seq("url"), "left")
      .filter(coalesce(col("nLayers"), lit(0)) < layers.length)
      .select(pages.columns.toIndexedSeq.map(col): _*)
  }

  /** J9+J10: suggestions for unmatched points — query the *uncurated*
    * polygon set, then apply match-rules: when the point's match in
    * `rule.matchLayer` equals `rule.matchRelId`, suggestions in
    * `rule.restrictLayer` must have adminLevel ∈ restrict set
    * (config.go:62-65 + frontend store.tsx:103-124 semantics, applied
    * server-side).
    */
  case class MatchRule(matchLayer: String, matchRelId: Long,
                       restrictLayer: String, restrictAdminLevels: Seq[Int])

  def suggestions(missingPages: DataFrame, covers: DataFrame, polygons: DataFrame,
                  matches: DataFrame, rules: Seq[MatchRule]): DataFrame = {
    val sugg = PipJoin.matches(missingPages, covers, polygons)
      .join(polygons.select(col("relId"), col("adminLevel"), col("name")), Seq("relId"))
    rules.foldLeft(sugg) { (acc, rule) =>
      val ruled = matches
        .filter(col("layer") === rule.matchLayer && col("relId") === rule.matchRelId)
        .select(col("url").as("r_url")).distinct()
      acc.join(ruled, acc("url") === col("r_url"), "left")
        .filter(col("r_url").isNull || col("layer") =!= rule.restrictLayer ||
          col("adminLevel").isin(rule.restrictAdminLevels: _*))
        .drop("r_url")
    }
  }
}
