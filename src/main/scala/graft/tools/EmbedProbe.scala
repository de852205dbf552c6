package graft.tools

import org.apache.spark.sql.functions._

/** Stage isolation for q_embed_pairs_blocked (guide §1.4): times sketch,
  * bucket agg, pair explosion, distinct and verify separately.
  */
object EmbedProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet").limit(10).count()

    val emb = graft.sources.Fixtures.readParquet(spark, s"$sfDir/embeddings.parquet")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s  -> $r")
      r
    }
    // replicate the internals piecewise
    val full = graft.operators.Similarity.embeddingDedupBlocked(emb, 0.4)
    time("full (warm 1)") { full.count() }
    time("full (warm 2)") { graft.operators.Similarity.embeddingDedupBlocked(emb, 0.4).count() }
    for (_ <- 1 to 3) {
      time("verify via closure") {
        graft.operators.Similarity.embeddingDedupBlocked(emb, 0.4, verifyBroadcastBytes = Long.MaxValue).count()
      }
      time("verify via joins") {
        graft.operators.Similarity.embeddingDedupBlocked(emb, 0.4, verifyBroadcastBytes = 0L).count()
      }
    }
    // stage counts (each its own jobs; just for volume numbers)
    val p = graft.operators.TextOps.MersennePrime
    val bands = 16; val rowsPerBand = 4
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val buckets = vecs.as[(Long, Seq[Double])].flatMap { case (id, v) =>
      val q = v.iterator.map(x => math.floor(x * 1e6 + 0.5).toLong).toArray
      (0 until bands).iterator.map { b =>
        var h = 0L
        var r = 0
        while (r < rowsPerBand) {
          val j = b * rowsPerBand + r
          var s = 0L; var i = 0
          while (i < q.length) {
            val u = (graft.operators.Similarity.PlaneA(j) * (i + 1) + graft.operators.Similarity.PlaneB(j)) % p
            val w = (u * u) % p
            s += (if (2 * w < p) q(i) else -q(i)); i += 1
          }
          h = (h << 1) | (if (s >= 0) 1L else 0L); r += 1
        }
        (b, h, id)
      }
    }.toDF("band", "bandVal", "vec_id")
    val agg = buckets.groupBy("band", "bandVal").agg(collect_list(col("vec_id")).as("ids"))
    time("bucket count / max size") {
      agg.select(count(lit(1)), max(size(col("ids")))).head().toString
    }
    val pre = agg.select(explode(col("ids")).as("vec_a"), col("ids"))
      .select(col("vec_a"), explode(expr("filter(ids, x -> x > vec_a)")).as("vec_b"))
    time("pre-distinct pair rows") { pre.count() }
    time("distinct pairs") { pre.distinct().count() }
    spark.stop()
  }
}
