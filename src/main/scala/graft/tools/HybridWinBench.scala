package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Bench, SparkEntry}
import graft.operators.{Ingest, PipJoin}

/** The hybrid strategy's STATED win condition, measured (round-6 addendum
  * said it, the uniform fixture couldn't show it): hot-relation candidate
  * traffic dominates AND the probe side is prunable for the cold arm.
  *
  * Fixture: the real city-region dimension (the HOT relations — all probe
  * traffic concentrates there) plus `nCold` synthetic octagons on a
  * sparse grid in an otherwise-empty box (the COLD tail a planet
  * dimension carries). Pages: `hotFrac` jittered around the five city
  * centers (hot-only join cells), the rest uniform over the cold box
  * (mostly in gaps between cold polygons).
  *
  *  - pure broadcast-index must collect + broadcast the WHOLE dimension
  *    (hot + all nCold cold polygons) to every executor;
  *  - pure partitioned (at-scale forced-shuffle form) must shuffle EVERY
  *    page — the hot 80% sit in covered cells, so probe pruning cannot
  *    drop them;
  *  - hybrid serves the hot relations from a small broadcast index
  *    (map-side, zero shuffle for 80% of pages) and shuffles only the
  *    cold-box remainder, pre-pruned by the cold covers' semi-join.
  *
  * Rows are fingerprint-checked identical across all variants.
  *
  * Usage: SPARK_GRAFT_REPLICATE=5000 SPARK_GRAFT_NCOLD=20000 \
  *          sbt "runMain graft.tools.HybridWinBench"
  */
object HybridWinBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicate = sys.env.getOrElse("SPARK_GRAFT_REPLICATE", "5000").toInt
    val nCold = sys.env.getOrElse("SPARK_GRAFT_NCOLD", "20000").toInt
    val hotFrac = sys.env.getOrElse("SPARK_GRAFT_HOT_FRAC", "0.8").toDouble
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt)
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

    // ---- dimension: real fixture relations (hot) + synthetic cold grid
    val (cityPolys, _) = SparkEntry.sharedDims(spark)
    val gridW = 200
    val coldPolys = spark.range(nCold).map { n =>
      val gx = (n % gridW).toInt; val gy = (n / gridW).toInt
      val cx = 60.0 + gx * 0.3 + 0.15
      val cy = 10.0 + gy * 0.3 + 0.15
      val ring = graft.sources.Fixtures.octagon(cx, cy, 0.1)
      (100000L + n, 0, "cold", s"cold_$n",
        graft.geom.Jts.toWkb(graft.geom.Jts.polygon(ring :+ ring.head)))
    }.toDF("relId", "adminLevel", "layer", "name", "wkb")
      .withColumn("bbox", graft.functions.GeomExpressions.st_envelope(col("wkb")))
    val polys = cityPolys.unionByName(coldPolys).cache()
    val nPolys = polys.count()
    val covers = Ingest.cellCovers(polys).cache()
    val nCovers = covers.count()
    val hotBytes = cityPolys.agg(sum(length(col("wkb")))).head().getLong(0)
    val coldBytes = coldPolys.agg(sum(length(col("wkb")))).head().getLong(0)

    // ---- pages: hotFrac at city centers, remainder uniform over cold box
    val sfTag = sfDir.replaceAll("[^a-z0-9.]", "_")
    val path = s"/tmp/graft_bench/pages_hybridwin_${(hotFrac * 100).toInt}_${sfTag}_" +
      s"${SparkEntry.fixtureFingerprint(sfDir)}_rep$replicate"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_SUCCESS"))) {
      val cities = graft.sources.Fixtures.cities
      val cLon = cities.map(_._2)
      val cLat = cities.map(_._3)
      val base = graft.sources.Fixtures.pages(spark, sfDir, replicate)
        .select("url", "lang", "lon", "lat")
      val h = pmod(xxhash64(col("url")), lit(1000000))
      val isHot = h < (hotFrac * 1000000).toLong
      val cityIdx = pmod(xxhash64(col("url"), lit(3)), lit(cities.length)).cast("int")
      val hotLon = element_at(array(cLon.map(lit): _*), cityIdx + 1) +
        (pmod(xxhash64(col("url"), lit(4)), lit(2001)) - 1000) * lit(2e-4)
      val hotLat = element_at(array(cLat.map(lit): _*), cityIdx + 1) +
        (pmod(xxhash64(col("url"), lit(5)), lit(2001)) - 1000) * lit(2e-4)
      val coldLon = lit(60.0) + pmod(xxhash64(col("url"), lit(6)), lit(600000)) * lit(1e-4)
      val coldLat = lit(10.0) + pmod(xxhash64(col("url"), lit(7)),
        lit((math.ceil(nCold.toDouble / gridW) * 0.3 * 10000).toLong)) * lit(1e-4)
      base
        .withColumn("lon", when(isHot, hotLon).otherwise(coldLon))
        .withColumn("lat", when(isHot, hotLat).otherwise(coldLat))
        .repartition(64)
        .write.mode("overwrite").parquet(path)
    }
    val pages = spark.read.parquet(path)
    val nPages = pages.count()
    println(s"== hybrid win condition: $nPages pages ($hotFrac hot at cities), " +
      s"dim=$nPolys polys ($nCovers covers; hot=${hotBytes}B cold=${coldBytes}B), min of $reps ==")

    def fingerprint(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        sum(pmod(xxhash64(col("url"), col("layer"), col("relId")), lit(1000000007L))))
        .head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    def bench(label: String, mk: => DataFrame): (Long, Long) = {
      var fp: (Long, Long) = null
      val secs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fp = fingerprint(mk)
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$label%-42s $secs%8.2f s   rows=${fp._1}%d hash=${fp._2}%d")
      fp
    }
    def withForcedShuffle[A](f: => A): A = {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }

    // budget: everything the cities weigh fits the hot arm, the synthetic
    // cold tail does not — matchesHybrid ranks by cover leaf span, and the
    // city-region relations dwarf every 0.1-degree cold octagon there
    val budget = (hotBytes * 1.5).toLong
    val fpI = bench("pure broadcast-index (full dim)",
      PipJoin.matchesIndexed(pages, covers, polys))
    val fpP = withForcedShuffle(bench("pure partitioned (forced shuffle)",
      PipJoin.matchesPartitioned(pages, covers, broadcast(polys))))
    val fpH = withForcedShuffle(bench(s"hybrid (budget=${budget}B)",
      PipJoin.matchesHybrid(pages, covers, polys, broadcastBudgetBytes = budget)))
    require(Set(fpI, fpP, fpH).size == 1, s"variants disagree: $fpI $fpP $fpH")
    println("rows identical across index / partitioned / hybrid")
    spark.stop()
  }
}
