package graft.tools

import org.apache.spark.sql.functions._

import graft.Bench
import graft.geom.Jts
import graft.operators.TopoPipeline

/** Topology build at scale (the fixtures are ≤15 arcs; this measures the
  * real shuffle shape): a G×G grid of unit squares whose edges are
  * subdivided into S segments, so every interior edge is a FULL shared
  * vertex chain between two objects — shared-arc dedup and junction
  * cutting do real volume — and the expected structure is closed-form:
  *
  *  - junctions are exactly the grid corners (interior subdivided points
  *    are shared by the same two rings with the same neighbors);
  *  - arcs after dedup = grid edges = 2·G·(G+1);
  *  - uses = 4·G² (each square uses 4 arcs);
  *  - arc points = S+1 each.
  *
  * The tool runs two sizes (4× apart in objects) and prints wall time,
  * shuffle bytes and the structural counts — the counts are ASSERTED, so
  * a wrong junction rule or dedup at scale fails the run rather than
  * producing a plausible number. Coordinates of shared edges are built
  * from the identical arithmetic on both sides, so they match
  * bit-for-bit (the dedup key hashes the canonical serialization).
  *
  * Usage: sbt "runMain graft.tools.TopoScaleBench [G] [S]"
  *        (defaults G=100 S=24 → 10⁴ objects, 9.6·10⁵ input ring points)
  */
object TopoScaleBench {
  def main(args: Array[String]): Unit = {
    val gTop = args.headOption.map(_.toInt).getOrElse(100)
    val segs = args.lift(1).map(_.toInt).getOrElse(24)
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })

    def gridFeatures(g: Int) = {
      val s = segs
      spark.range(g.toLong * g).map { n =>
        val i = (n % g).toInt; val j = (n / g).toInt
        // Every edge is generated CANONICALLY (from its low corner,
        // ascending) and REVERSED as a list when the ring walks it the
        // other way — recomputing reversed coordinates arithmetically
        // ((j+1) - k/s vs j + (s-k)/s) differs by 1 ulp on non-dyadic
        // fractions, which silently breaks the shared-edge bit-identity
        // the dedup key relies on (measured: chains matched only at
        // dyadic points and arcs shattered).
        def hEdge(x0: Int, y0: Int): IndexedSeq[(Double, Double)] =
          (0 to s).map(k => (x0 + k.toDouble / s, y0.toDouble))
        def vEdge(x0: Int, y0: Int): IndexedSeq[(Double, Double)] =
          (0 to s).map(k => (x0.toDouble, y0 + k.toDouble / s))
        val ring =
          hEdge(i, j).dropRight(1) ++            // bottom, ascending
          vEdge(i + 1, j).dropRight(1) ++        // right, ascending
          hEdge(i, j + 1).reverse.dropRight(1) ++ // top, walked right-to-left
          vEdge(i, j).reverse.dropRight(1)       // left, walked top-to-bottom
        val closed = (ring :+ ring.head).toIndexedSeq
        (n, Jts.toWkb(Jts.polygon(closed)), i.toDouble, j.toDouble, i + 1.0, j + 1.0)
      }.toDF("objId", "wkb", "minx", "miny", "maxx", "maxy")
        .withColumn("bbox", struct(col("minx"), col("miny"), col("maxx"), col("maxy")))
        .select("objId", "wkb", "bbox")
    }

    def run(g: Int, quantize: Double, label: String): Double = {
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val topo = TopoPipeline.topology(gridFeatures(g), simplifyDigits = 0, quantize = quantize)
      val nArcs = topo.arcs.count()
      val nUses = topo.uses.count()
      val ptsOk = topo.arcs.select(size(col("pts"))).distinct().as[Int].collect().toSet
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // listener bus settle
      val gb = shuffleBytes.get() / 1e9
      // grid edges, minus the 4 extreme corners of the whole grid: those
      // are degree-1 points inside a single ring (not junctions), so the
      // two boundary edges meeting there merge into one 2-edge arc —
      // and that ring has one fewer arc use
      val expArcs = 2L * g * (g + 1) - 4
      val expUses = 4L * g * g - 4
      println(f"$label%-28s G=$g obj=${g.toLong * g}%d arcs=$nArcs uses=$nUses " +
        f"ptsPerArc=$ptsOk secs=$secs%.2f shuffleGB=$gb%.3f")
      require(nArcs == expArcs, s"arc dedup broke at scale: $nArcs != $expArcs")
      require(nUses == expUses, s"use assignment broke at scale: $nUses != $expUses")
      require(ptsOk == Set(segs + 1, 2 * segs + 1),
        s"arc point counts $ptsOk != {${segs + 1}, ${2 * segs + 1}}")
      topo.release()
      secs
    }

    run(gTop / 2, 0, "warmup (discard)") // JIT + codegen warm; not timed
    val tSmall = run(gTop / 2, 0, "topology raw")
    val tBig = run(gTop, 0, "topology raw")
    val tBigQ = run(gTop, 1e6, "topology quantized 1e6")
    // 4x the objects: linear scaling = ratio ~4 (job-overhead makes the
    // small run look worse, so the ratio is usually BELOW 4)
    println(f"scaling: ${gTop / 2}x${gTop / 2} -> ${gTop}x$gTop wall ratio ${tBig / tSmall}%.2f " +
      f"(linear = 4.0); quantize overhead ${tBigQ / tBig}%.2f x")
    spark.stop()
  }
}
