package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-8 measurement harness (guide §1): isolate the fixed per-query
  * overheads the bench pays 78 times — temp-view (re)registration
  * (10 parquet metadata reads per SQL-backed query) and the noop-sink
  * cost of a trivial query — so the optimization targets the right
  * term. Prints one line per probe; not part of the bench contract.
  */
object OverheadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Bench.session(cpus)

    def time[A](label: String, reps: Int)(f: => A): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-40s min ${times.min}%.3f  med ${times.sorted.apply(reps / 2)}%.3f  all ${times.map(t => f"$t%.3f").mkString(",")}")
    }

    // warmup
    spark.read.parquet(s"$sfDir/documents.parquet").limit(10).count()
    graft.SparkEntry.registerViews(spark, sfDir)

    time("registerViews (10 tables)", 7) { graft.SparkEntry.registerViews(spark, sfDir) }
    time("read.parquet(documents) metadata only", 7) { spark.read.parquet(s"$sfDir/documents.parquet") }
    time("sql('select 1').count", 7) { spark.sql("select 1").count() }
    time("documents count (no views)", 7) { spark.read.parquet(s"$sfDir/documents.parquet").count() }
    time("q_except full (views + sql + count)", 5) {
      graft.SparkEntry.registerViews(spark, sfDir)
      spark.sql(graft.SparkEntry.sharedSql("q_except")).count()
    }
    time("q_except no re-register", 5) {
      spark.sql(graft.SparkEntry.sharedSql("q_except")).count()
    }
    spark.stop()
  }
}
