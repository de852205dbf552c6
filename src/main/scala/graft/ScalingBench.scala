package graft

/** Two-parallelism-level scaling evidence for the north rule's N→4N
  * executor criterion (sandbox proxy: local[8] vs local[32] on the same
  * input — see BASELINE.md). The sandbox VM's CPU availability fluctuates
  * (noisy neighbors), so the benchmark alternates sessions at the two
  * levels and takes the minimum time per level over `trials` rounds — the
  * min approximates uncontended capability at each level.
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicate = sys.env.getOrElse("SPARK_GRAFT_REPLICATE", "20000").toInt
    val low = sys.env.getOrElse("SPARK_GRAFT_CPUS_LOW", "8")
    val high = sys.env.getOrElse("SPARK_GRAFT_CPUS_HIGH", "32")
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "3").toInt

    def pass(cpus: String): (Long, Double) = {
      val spark = Bench.session(cpus)
      // small warm-up (JIT/codegen), then two measured passes; keep best
      Bench.headline(spark, sfDir, math.max(1, replicate / 10))
      val a = Bench.headline(spark, sfDir, replicate)
      val b = Bench.headline(spark, sfDir, replicate)
      spark.stop()
      if (a._2 <= b._2) a else b
    }

    // JIT-warming session, discarded
    pass(low)
    var bestLow: (Long, Double) = (0L, Double.MaxValue)
    var bestHigh: (Long, Double) = (0L, Double.MaxValue)
    for (_ <- 1 to trials) {
      val h = pass(high); if (h._2 < bestHigh._2) bestHigh = h
      val l = pass(low); if (l._2 < bestLow._2) bestLow = l
    }

    val (n1, s1) = bestLow
    val (n2, s2) = bestHigh
    val t1 = n1 / s1
    val t2 = n2 / s2
    val eff = (t2 / t1) / (high.toDouble / low.toDouble)
    def num(fmt: String, v: Double): String = JsonUtil.num(fmt, v)
    println(s"""{"metric":"scaling_efficiency","value":${num("%.3f", eff)},"unit":"ratio",""" +
      s""""pages":$n1,"low_cpus":$low,"high_cpus":$high,"trials":$trials,""" +
      s""""low_pages_per_sec":${num("%.1f", t1)},"high_pages_per_sec":${num("%.1f", t2)},""" +
      s""""low_sec":${num("%.3f", s1)},"high_sec":${num("%.3f", s2)},"sf":"$sfDir"}""")
  }
}
