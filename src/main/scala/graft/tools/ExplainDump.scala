package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dump formatted plans for PLANS.md (dev tooling). */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("explain-dump")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    println("==== q_embed_pairs (exact, VecDot) ====")
    graft.operators.Similarity.embeddingDedupExact(
      spark.read.parquet(s"$dir/embeddings.parquet").filter(col("vec_id") < 1000), 0.4)
      .explain("formatted")
    println("==== PIP broadcast join (matches, post-reshape) ====")
    locally {
      val polys = graft.operators.Ingest.polygons(spark,
        graft.sources.Fixtures.nodesDf(spark), graft.sources.Fixtures.waysDf(spark),
        graft.sources.Fixtures.relationsDf(spark), graft.sources.Fixtures.blacklist).cache()
      val covers = graft.operators.Ingest.cellCovers(polys).cache()
      graft.operators.PipJoin.matches(
        graft.sources.Fixtures.pages(spark, dir), covers, polys).explain("formatted")
    }
    println("==== jaccardPairs candidate stage ====")
    graft.operators.Clusters.jaccardPairs(
      graft.sources.Fixtures.documents(spark, dir), 0.3).explain("formatted")
    println("==== knnIndexed per-round read (PartitionFilters on pcell) ====")
    locally {
      val path = java.nio.file.Files.createTempDirectory("knn_idx_explain").toString
      graft.operators.Knn.writeIndexed(graft.sources.Fixtures.pages(spark, dir), path)
      val parent = graft.cells.Cell.cellAt(4.35, 50.85, 4)
      spark.read.parquet(path).filter(col("pcell").isin(parent)).explain("formatted")
    }
    spark.stop()
  }
}
