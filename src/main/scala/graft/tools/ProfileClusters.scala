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

    // sub-stage surrogate: replicate the shingle construction to see how
    // much of jaccardPairs is the map-side shingle pass alone
    {
      import org.apache.spark.sql.functions._
      val toks = docs.select(col("doc_id"),
        filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= "").as("ts"))
      val shingled = toks.select(col("doc_id"),
        when(size(col("ts")) >= 3,
          array_distinct(transform(sequence(lit(1), size(col("ts")) - 2),
            i => array_join(slice(col("ts"), i, lit(3)), " "))))
          .otherwise(array().cast("array<string>")).as("s"))
      t("shingle-pass only") { shingled.select(sum(size(col("s")))).head() }
      t("tokenize only") { toks.select(sum(size(col("ts")))).head() }
    }
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
