package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Clusters
import graft.sources.Fixtures

/** Temporary stage profiler for the near-dup clustering chain
  * (q_jaccard_pairs → q_dedup_clusters → q_dedup_canonical).
  */
object ProfileClusters {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROFILE $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("profile-clusters")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = Fixtures.documents(spark, dir)

    val pairs = t("jaccardPairs") {
      val p = Clusters.jaccardPairs(docs, 0.3).cache(); p.count(); p
    }
    val clusters = t("labelClusters") {
      val c = Clusters.labelClusters(docs, pairs).cache(); c.count(); c
    }
    t("canonical") { Clusters.canonical(docs, clusters).count() }
    spark.stop()
  }
}
