package graft.tools

import org.apache.spark.sql.functions._

import graft.Bench
import graft.operators.Knn

/** Batch-kNN at its design shape: 10⁵ queries against the 100 M-point
  * replicated pages table. Index level 14 (dense-city cells at level 8
  * hold ~10⁷ points — every same-cell query would pull the whole cell;
  * at level 14 city cells hold ~10³, so candidates stay proportional
  * to k·cell population). Queries are pages sampled hash-spread and
  * jittered, so every query sits near data and the ring search
  * converges in a few rounds.
  *
  * Usage: SPARK_GRAFT_REPLICATE=20000 SPARK_GRAFT_QUERIES=100000 \
  *          sbt "runMain graft.tools.KnnBatchBench"
  */
object KnnBatchBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicate = sys.env.getOrElse("SPARK_GRAFT_REPLICATE", "20000").toInt
    val nQ = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "100000").toInt
    val k = 10
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val pages = spark.read.parquet(Bench.pagesTable(spark, sfDir, replicate))
    val nPages = pages.count()

    val queries = pages
      .orderBy(xxhash64(col("url"))).limit(nQ)
      .select(col("url").as("queryId"),
        (col("lon") + (pmod(xxhash64(col("url"), lit(7)), lit(2001)) - 1000) * lit(1e-5)).as("lon"),
        (col("lat") - (pmod(xxhash64(col("url"), lit(8)), lit(2001)) - 1000) * lit(1e-5)).as("lat"))
      .cache()
    queries.count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$label%-28s $secs%8.2f s  rows=$rows%d (${nQ / secs}%.0f queries/s)")
    }
    time(s"knnBatch $nQ q x $nPages pts") {
      Knn.knnBatch(pages, queries, k, level = 14).count()
    }
    time(s"knnBatch pruned (pcell 6)") {
      Knn.knnBatch(pages, queries, k, level = 14, partitionLevel = 6).count()
    }
    spark.stop()
  }
}
