package graft.tools

/** Scratch driver: time one named query N times (dev tooling). */
object Drive {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_embed_pairs_blocked")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.read.parquet(s"$sfDir/documents.parquet").limit(10).count()
    val fn = graft.SparkEntry.queries(name)
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      (t, n)
    }
    println(f"[drive] $name rows=${ts.head._2} min ${ts.map(_._1).min}%.3f all ${ts.map(t => f"${t._1}%.3f").mkString(",")}")
    spark.stop()
  }
}
