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
  * Round 7 adds the window-vs-partial-top-k A/B (the per-round best-k
  * used to shuffle EVERY candidate row through a rank window; the
  * bounded partial+final aggregation ships ≤ k rows per query per map
  * task) and reports total shuffle bytes written per variant via a
  * task-metrics listener.
  *
  * Usage: SPARK_GRAFT_REPLICATE=20000 SPARK_GRAFT_QUERIES=100000 \
  *          sbt "runMain graft.tools.KnnBatchBench" [variants]
  * variants: comma list of partial,window,pruned (default all three)
  */
object KnnBatchBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicate = sys.env.getOrElse("SPARK_GRAFT_REPLICATE", "20000").toInt
    val nQ = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "100000").toInt
    val variants = args.headOption.map(_.split(",").toSet)
      .getOrElse(Set("partial", "window", "pruned"))
    // index level: 14 keeps city cells ~10³ (the converge-fast shape);
    // lower levels make cells DENSE (10⁴-10⁵ points) — the shape where
    // the bounded partial top-k is supposed to beat the rank window
    val level = sys.env.getOrElse("SPARK_GRAFT_LEVEL", "14").toInt
    val k = 10
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val pages = spark.read.parquet(Bench.pagesTable(spark, sfDir, replicate))
    val nPages = pages.count()

    // shuffle-volume accounting: task-level write metrics summed across
    // the variant's jobs (reset between variants). byCallsite attributes
    // each stage's shuffle write to its code line (stage details carry
    // the call site) so the A/B can say WHICH exchange the bytes belong
    // to, not just the total.
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    val byCallsite = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val w = si.taskMetrics.shuffleWriteMetrics.bytesWritten
        if (w > 0) {
          val site = si.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("tools."))
            .getOrElse(si.name).trim
          byCallsite.computeIfAbsent(site, _ => new java.util.concurrent.atomic.AtomicLong())
            .addAndGet(w)
        }
      }
    })

    val queries = pages
      .orderBy(xxhash64(col("url"))).limit(nQ)
      .select(col("url").as("queryId"),
        (col("lon") + (pmod(xxhash64(col("url"), lit(7)), lit(2001)) - 1000) * lit(1e-5)).as("lon"),
        (col("lat") - (pmod(xxhash64(col("url"), lit(8)), lit(2001)) - 1000) * lit(1e-5)).as("lat"))
      .cache()
    queries.count()

    val diag = sys.env.get("SPARK_GRAFT_DIAG").contains("1")
    def time(label: String)(f: => Long): Unit = {
      shuffleBytes.set(0L)
      byCallsite.clear()
      val t0 = System.nanoTime()
      val rows = f
      val secs = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; give the bus a beat to
      // settle before reading (listenerBus is spark-private; 2 s covers
      // the default 1 s poll comfortably at these job sizes)
      Thread.sleep(2000)
      val gb = shuffleBytes.get() / 1e9
      println(f"$label%-28s $secs%8.2f s  rows=$rows%d (${nQ / secs}%.0f queries/s, shuffleWrite=$gb%.2f GB)")
      if (diag) {
        import scala.jdk.CollectionConverters._
        byCallsite.asScala.toSeq.sortBy(-_._2.get()).foreach { case (site, b) =>
          println(f"    ${b.get() / 1e9}%8.3f GB  $site")
        }
      }
    }
    if (variants("partial")) time(s"knnBatch partial $nQ q") {
      Knn.knnBatch(pages, queries, k, level = level).count()
    }
    if (variants("window")) time(s"knnBatch window  $nQ q") {
      Knn.knnBatch(pages, queries, k, level = level, partialTopK = false).count()
    }
    if (variants("pruned")) time(s"knnBatch pruned (pcell 6)") {
      Knn.knnBatch(pages, queries, k, level = level, partitionLevel = 6).count()
    }
    spark.stop()
  }
}
