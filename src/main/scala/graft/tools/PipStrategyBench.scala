package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Bench, SparkEntry}
import graft.operators.PipJoin

/** Two measurements the round-5 verdict asked for, at the scaling-harness
  * scale (default 100 M pages = 20000 × sf0.1 documents, local[32]):
  *
  *  1. **Strategy comparison** (uniform pages): broadcast vs
  *     broadcast-index vs partitioned vs hybrid wall time on the SAME
  *     input, rows cross-checked identical (count + order-independent
  *     hash). Hybrid runs with a budget that genuinely splits the
  *     dimension (~half the polygon bytes hot) — at the default 64 MB
  *     budget the fixture dimension is all-hot and hybrid degenerates to
  *     the index path by design.
  *
  *  2. **Skewed-input salting** (the north rule's skew claim, measured
  *     rather than by construction): a pages table with `skewFrac`
  *     (default 0.4) of all pages jittered inside ONE city join cell
  *     (Brussels), then the partitioned strategy at salt=1/AQE-off,
  *     salt=autoSalt/AQE-off, and salt=1/AQE-on (the runtime backstop
  *     alone). Rows identical across variants; the table documents how
  *     much of the straggler the up-front salt removes vs AQE's
  *     split-on-size.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_REPLICATE=20000 \
  *          sbt "runMain graft.tools.PipStrategyBench"
  */
object PipStrategyBench {

  /** Pages with `skewFrac` of rows moved into one join cell: jitter
    * ±0.001° around the Brussels fixture center. One-cell containment
    * holds at every join level `chooseJoinLevel` can pick (≤ 12 — the
    * nearest level-12 lon boundaries are 4.3066/4.3945); at level 13/14
    * the 4.3505859 cell boundary falls INSIDE the jitter range and
    * would split ~21% of the hot mass — re-center the jitter if
    * maxJoinLevel is ever raised. Deterministic per url hash;
    * fingerprint-keyed like Bench.pagesTable.
    */
  def skewedPagesTable(spark: SparkSession, sfDir: String, replicate: Int,
                       skewFrac: Double): String = {
    val sfTag = sfDir.replaceAll("[^a-z0-9.]", "_")
    val pct = (skewFrac * 100).toInt
    val path = s"/tmp/graft_bench/pages_skew${pct}_${sfTag}_" +
      s"${SparkEntry.fixtureFingerprint(sfDir)}_rep$replicate"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_SUCCESS"))) {
      val base = graft.sources.Fixtures.pages(spark, sfDir, replicate)
        .select("url", "lang", "lon", "lat")
      val h = pmod(xxhash64(col("url")), lit(1000000))
      val inSkew = h < (skewFrac * 1000000).toLong
      base
        .withColumn("lon", when(inSkew,
          lit(4.35) + (pmod(xxhash64(col("url"), lit(1)), lit(2001)) - 1000) * lit(1e-6))
          .otherwise(col("lon")))
        .withColumn("lat", when(inSkew,
          lit(50.85) + (pmod(xxhash64(col("url"), lit(2)), lit(2001)) - 1000) * lit(1e-6))
          .otherwise(col("lat")))
        .repartition(64)
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicate = sys.env.getOrElse("SPARK_GRAFT_REPLICATE", "20000").toInt
    val skewFrac = sys.env.getOrElse("SPARK_GRAFT_SKEW_FRAC", "0.4").toDouble
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt)
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    val (polys, covers) = SparkEntry.sharedDims(spark)
    polys.count(); covers.count()
    val polyBytes = polys.agg(sum(length(col("wkb")))).head().getLong(0)
    val splitBudget = polyBytes / 2 // forces a genuine hot/cold split

    // order-independent row-set fingerprint. pmod before the sum: ANSI
    // mode (Spark 4 default) THROWS on Long-sum overflow, and raw
    // xxhash64 values at 10^8 rows would overflow; modded values stay
    // within [0, 1e9) so the sum caps at ~1e17
    def fingerprint(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        sum(pmod(xxhash64(col("url"), col("layer"), col("relId")), lit(1000000007L))))
        .head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def bench(label: String, mk: => DataFrame): (Long, Long) = {
      var fp: (Long, Long) = null
      val secs = (1 to reps).map { _ =>
        val (f, s) = time(fingerprint(mk)); fp = f; s
      }.min
      println(f"$label%-34s ${secs}%8.2f s   rows=${fp._1}%d hash=${fp._2}%d")
      fp
    }

    def withConf[A](key: String, v: String)(f: => A): A = {
      val prev = spark.conf.get(key)
      spark.conf.set(key, v)
      try f finally spark.conf.set(key, prev)
    }
    def withAqe[A](on: Boolean)(f: => A): A =
      withConf("spark.sql.adaptive.enabled", on.toString)(f)
    // the at-scale physical form of the partitioned path: a planet cover
    // table (~10⁷ exploded rows) is NOT broadcastable, so the cover join
    // genuinely shuffles — at fixture dim sizes Catalyst would rescue it
    // with an auto-broadcast and no skew could ever materialize. The
    // polygons refine join stays broadcast-HINTED at the call site to
    // isolate the cover-join salting (the relId-side story at scale is
    // matchesHybrid's split, not this measurement).
    def withForcedShuffle[A](f: => A): A =
      withConf("spark.sql.autoBroadcastJoinThreshold", "-1")(f)

    // ---- 1. strategy comparison, uniform pages -------------------------
    val uniform = spark.read.parquet(Bench.pagesTable(spark, sfDir, replicate))
    val nPages = uniform.count()
    println(s"== strategy comparison: uniform, $nPages pages, local[32], min of $reps ==")
    val fpB = bench("broadcast (matches)", PipJoin.matches(uniform, covers, polys))
    val fpI = bench("broadcast-index (matchesIndexed)", PipJoin.matchesIndexed(uniform, covers, polys))
    val fpP = bench("partitioned (auto-bcast rescue)", PipJoin.matchesPartitioned(uniform, covers, polys))
    val fpPS = withForcedShuffle(bench("partitioned (forced shuffle)",
      PipJoin.matchesPartitioned(uniform, covers, broadcast(polys))))
    val fpH = bench(s"hybrid (budget=${splitBudget}B split)",
      PipJoin.matchesHybrid(uniform, covers, polys, broadcastBudgetBytes = splitBudget))
    require(Set(fpB, fpI, fpP, fpPS, fpH).size == 1,
      s"strategies disagree: $fpB $fpI $fpP $fpPS $fpH")
    println("rows identical across all five strategy variants")

    // ---- 2. skewed-input salting ---------------------------------------
    val skewed = spark.read.parquet(skewedPagesTable(spark, sfDir, replicate, skewFrac))
    val nSkew = skewed.count()
    val salt = PipJoin.autoSalt(skewed)
    println(s"== skewed pages: ${(skewFrac * 100).toInt}% of $nSkew pages in one " +
      s"join cell; autoSalt picked $salt; cover join forced to shuffle ==")
    // sanity: the forced plan really is a shuffle join on the cover side
    // and a broadcast on the refine side
    withForcedShuffle(withAqe(false) {
      val plan = PipJoin.matchesPartitioned(skewed, covers, broadcast(polys), salt = 1)
        .queryExecution.executedPlan.toString
      require(plan.contains("BroadcastHashJoin"), "polygons refine join lost its broadcast hint")
      require(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"cover join did not shuffle:\n$plan")
    })
    val fp1 = withForcedShuffle(withAqe(false)(bench("partitioned salt=1   AQE off",
      PipJoin.matchesPartitioned(skewed, covers, broadcast(polys), salt = 1))))
    val fpS = withForcedShuffle(withAqe(false)(bench(s"partitioned salt=$salt  AQE off",
      PipJoin.matchesPartitioned(skewed, covers, broadcast(polys), salt = salt))))
    val fpA = withForcedShuffle(withAqe(true)(bench("partitioned salt=1   AQE on (skew-join)",
      PipJoin.matchesPartitioned(skewed, covers, broadcast(polys), salt = 1))))
    val fpSA = withForcedShuffle(withAqe(true)(bench(s"partitioned salt=$salt  AQE on",
      PipJoin.matchesPartitioned(skewed, covers, broadcast(polys), salt = salt))))
    // probe-side pre-shuffle pruning: pages in cover-free cells (most of
    // the uniform-global 40/60 remainder) drop before the shuffle
    val fp1P = withForcedShuffle(withAqe(false)(bench("partitioned salt=1   prune AQE off",
      PipJoin.matchesPartitioned(skewed, covers, broadcast(polys), salt = 1, pruneProbe = Some(true)))))
    val fpSP = withForcedShuffle(withAqe(false)(bench(s"partitioned salt=$salt  prune AQE off",
      PipJoin.matchesPartitioned(skewed, covers, broadcast(polys), salt = salt, pruneProbe = Some(true)))))
    require(Set(fp1, fpS, fpA, fpSA, fp1P, fpSP).size == 1,
      s"salt/AQE variants disagree: $fp1 $fpS $fpA $fpSA $fp1P $fpSP")
    println("rows identical across all salt/AQE variants")
    spark.stop()
  }
}
