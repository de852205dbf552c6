package graft.tools

import org.apache.spark.sql.SparkSession

import graft.sources.OsmPbf

/** Measures the PBF format layer at a scale the fixtures don't reach:
  * writes N synthetic dense nodes (default 2M — ~250 blobs at the
  * standard 8k-entity block size), then times the distributed decode at
  * two parallelism levels so the blob-range fan-out is visible as
  * wall-clock scaling, not just an architecture claim.
  *
  * Usage: sbt "runMain graft.tools.PbfThroughput [nNodes] [lowCpus] [highCpus]"
  */
object PbfThroughput {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000000)
    val low = args.lift(1).map(_.toInt).getOrElse(8)
    val high = args.lift(2).map(_.toInt).getOrElse(32)

    val path = java.nio.file.Files.createTempDirectory("pbf_tp")
      .resolve(s"synth_$n.osm.pbf").toString
    val t0 = System.nanoTime()
    // deterministic synthetic nodes; written in one stream (the writer is
    // a driver-side fixture tool — the READER is the engine component).
    // splitmix64-scattered coordinates: consecutive DELTAS are wide and
    // unpredictable, so the sint64 varint chains and the zlib layer see
    // realistic entropy (a linear or strided formula delta-encodes to
    // constant runs that zlib collapses to nothing).
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val nodes = (0 until n).map { i =>
      val h = mix(i.toLong)
      (i.toLong * 7 + 3,
        -90.0 + math.floorMod(h, 1800000000L) * 1e-7,
        -180.0 + math.floorMod(mix(h), 3600000000L) * 1e-7)
    }
    OsmPbf.write(nodes, Nil, Nil, path)
    val writeSecs = (System.nanoTime() - t0) / 1e9
    val bytes = java.nio.file.Files.size(java.nio.file.Paths.get(path))
    println(f"wrote $n%d nodes, ${bytes / 1e6}%.1f MB, $writeSecs%.1f s")

    def timeDecode(cpus: Int): Double = {
      val spark = SparkSession.builder()
        .appName(s"pbf-throughput-$cpus").master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", false)
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        OsmPbf.nodes(spark, path).count() // warm (codegen + page cache)
        (1 to 3).map { _ =>
          val t = System.nanoTime()
          val c = OsmPbf.nodes(spark, path).count()
          require(c == n, s"decoded $c of $n")
          (System.nanoTime() - t) / 1e9
        }.min
      } finally spark.stop()
    }

    val lowSecs = timeDecode(low)
    val highSecs = timeDecode(high)
    val eff = (lowSecs / highSecs) / (high.toDouble / low)
    println(f"decode local[$low%d]:  $lowSecs%6.2f s  (${n / lowSecs / 1e6}%.2f M nodes/s)")
    println(f"decode local[$high%d]: $highSecs%6.2f s  (${n / highSecs / 1e6}%.2f M nodes/s)")
    println(f"scaling efficiency ${low}->$high: $eff%.3f")

    // ---- blob-kind index: the 3-pass import at planet blob ratios ------
    // ~89% node / ~10% way / ~1% relation blobs. The first pass must scan
    // everything (and records kinds); with the index, the way and
    // relation passes then read only their own blobs instead of
    // re-inflating the node majority — I/O drops from 3 passes to ~1.11.
    val nw = n / 10
    val nr = n / 100
    val ways = (0 until nw).map { i =>
      (i.toLong * 3 + 1, (0 until 8).map(j => mix(i.toLong * 8 + j) % 1000000L))
    }
    val rels = (0 until nr).map { i =>
      (i.toLong * 5 + 2, Map("type" -> "multipolygon", "name" -> s"r$i"),
        (0 until 4).map(j => (mix(i.toLong * 4 + j) % 100000L, j % 2, if (j == 0) "outer" else "inner")))
    }
    def writeMixed(tag: String): String = {
      val p = java.nio.file.Files.createTempDirectory("pbf_tp")
        .resolve(s"mixed_$tag.osm.pbf").toString
      OsmPbf.write(nodes, ways, rels, p)
      p
    }
    val spark = SparkSession.builder()
      .appName("pbf-threepass").master(s"local[$high]")
      .config("spark.sql.shuffle.partitions", high)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      def threePass(path: String, label: String): (Double, Double) = {
        val t0 = System.nanoTime()
        require(OsmPbf.nodes(spark, path).count() == n)
        val tNodes = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        require(OsmPbf.ways(spark, path).count() == nw)
        require(OsmPbf.relations(spark, path).count() == nr)
        val tWR = (System.nanoTime() - t1) / 1e9
        println(f"3-pass [$label%-9s] nodes $tNodes%5.2f s, ways+rels $tWR%5.2f s, total ${tNodes + tWR}%5.2f s")
        (tNodes, tWR)
      }
      OsmPbf.kindIndexEnabled = false
      val pOff = writeMixed("off")
      threePass(pOff, "warmup")
      val (_, wrOff) = threePass(pOff, "index off")
      OsmPbf.kindIndexEnabled = true
      val pOn = writeMixed("on")
      val (_, wrOn) = threePass(pOn, "index on")
      println(f"way+relation pass speedup from blob-kind index: ${wrOff / wrOn}%.2fx")
    } finally { spark.stop(); OsmPbf.kindIndexEnabled = true }
  }
}
