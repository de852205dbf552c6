package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Similarity

/** Records the IVF tuning surface for BENCH.md: recall@k of
  * `Similarity.ivfTopK` vs the brute-force baseline as nProbe sweeps the
  * centroid count. The q_ann_ivf oracle pins that build+probe are
  * computed EXACTLY as specified; this table documents what that spec
  * buys a user at each probe width (recall is a property of the data,
  * not the engine — the sweep is the documentation).
  *
  * Usage: sbt "runMain graft.tools.IvfRecallSweep [sfDir] [k]"
  */
object IvfRecallSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .appName("ivf-recall-sweep").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
      val n = emb.count()
      // mirror Similarity.ivfIndex's default EXACTLY (max(16, √n)) — the
      // final sweep row must probe every centroid the index really has,
      // or its "full probe" recall is not the exhaustive bound it claims
      val nCentroids = math.max(16, math.sqrt(n.toDouble).toInt)
      val queries = 0L until 50L
      val brute = Similarity.bruteForceTopK(emb, queries, k)
        .select("query_id", "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"sfDir=$sfDir n=$n dims=64 k=$k queries=${queries.length} " +
        s"centroids=$nCentroids (sqrt-n default)")
      println(f"${"nProbe"}%8s ${"recall@" + k}%10s ${"probe_s"}%8s")
      for (nProbe <- Seq(1, 2, 4, 8, 16, nCentroids)) {
        val t0 = System.nanoTime()
        val ivf = Similarity.ivfTopK(emb, queries, k, nProbe = nProbe)
          .select("query_id", "vec_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val secs = (System.nanoTime() - t0) / 1e9
        val recall = ivf.intersect(brute).size.toDouble / brute.size
        println(f"$nProbe%8d $recall%10.4f $secs%8.2f")
      }
      // auto-calibration: nProbe from the measured sampled depth
      // distribution must deliver the target on the real sweep queries
      for (target <- Seq(0.85, 0.95)) {
        val t0 = System.nanoTime()
        val (df, chosen) = Similarity.ivfTopKAuto(emb, queries, k, target)
        val got = df.select("query_id", "vec_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val secs = (System.nanoTime() - t0) / 1e9
        val recall = got.intersect(brute).size.toDouble / brute.size
        println(f"auto(target=$target%.2f) -> nProbe=$chosen%3d  recall=$recall%.4f  " +
          f"strictly_met=${recall >= target}%b  $secs%6.2f s")
        // the calibration is a 64-query sampled estimate, so real-query
        // recall carries sampling error; the assertion allows a small
        // documented slack instead of crashing the sweep on a borderline
        // sample (sf0.1 measures 0.976/0.994 vs 0.85/0.95 — far inside)
        require(recall >= target - 0.02,
          f"auto-nProbe calibration missed beyond sampling slack: " +
            f"measured $recall%.4f < target $target%.2f - 0.02")
      }
      // table-side-sampled calibration (the 10⁹⁺-row form: the brute pass
      // scores the query sample against a hash sample of the table
      // instead of all of it) must still deliver the target
      for (target <- Seq(0.85, 0.95); frac <- Seq(0.25)) {
        val t0 = System.nanoTime()
        val (df, chosen) = Similarity.ivfTopKAuto(emb, queries, k, target,
          tableFraction = frac)
        val got = df.select("query_id", "vec_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val secs = (System.nanoTime() - t0) / 1e9
        val recall = got.intersect(brute).size.toDouble / brute.size
        println(f"auto(target=$target%.2f, tableFraction=$frac%.2f) -> nProbe=$chosen%3d  " +
          f"recall=$recall%.4f  strictly_met=${recall >= target}%b  $secs%6.2f s")
        require(recall >= target - 0.02,
          f"table-sampled calibration missed beyond sampling slack: " +
            f"measured $recall%.4f < target $target%.2f - 0.02 (frac $frac)")
      }
    } finally spark.stop()
  }
}
