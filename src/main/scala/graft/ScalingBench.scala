package graft

/** Two-parallelism-level scaling evidence for the north rule's N→4N
  * executor criterion (sandbox proxy: local[8] vs local[32] on the same
  * input — see BASELINE.md). Runs the headline spatial-join + tiling
  * pipeline at both levels sequentially and prints one JSON line with both
  * throughputs and the scaling efficiency (throughput32/throughput8)/4.
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicate = sys.env.getOrElse("SPARK_GRAFT_REPLICATE", "200").toInt
    val low = sys.env.getOrElse("SPARK_GRAFT_CPUS_LOW", "8")
    val high = sys.env.getOrElse("SPARK_GRAFT_CPUS_HIGH", "32")

    def run(cpus: String): (Long, Double) = {
      val spark = Bench.session(cpus)
      // warm-up pass (JIT + codegen caches), then the measured pass
      Bench.headline(spark, sfDir, math.max(1, replicate / 10))
      val r = Bench.headline(spark, sfDir, replicate)
      spark.stop()
      r
    }

    val (n1, s1) = run(low)
    val (n2, s2) = run(high)
    val t1 = n1 / s1
    val t2 = n2 / s2
    val eff = (t2 / t1) / (high.toDouble / low.toDouble)
    println(s"""{"metric":"scaling_efficiency","value":${f"$eff%.3f"},"unit":"ratio",""" +
      s""""pages":$n1,"low_cpus":$low,"high_cpus":$high,""" +
      s""""low_pages_per_sec":${f"$t1%.1f"},"high_pages_per_sec":${f"$t2%.1f"},""" +
      s""""low_sec":${f"$s1%.3f"},"high_sec":${f"$s2%.3f"},"sf":"$sfDir"}""")
  }
}
