package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 at-scale evidence for the IVF build changes (guide §1/§2.4):
  * builds the IVF index over N deterministic synthetic vectors with the
  * round-8 path (map-side Lloyd argmax + VecDecimalSum single-shuffle
  * means) and with the round-7 form inlined here for comparison
  * (crossJoin+broadcast + groupBy(vec_id) argmax per round, posexplode
  * + two-shuffle means), asserts the assignments are row-identical, and
  * reports wall seconds + total shuffle write bytes per build.
  *
  * Env: IVF_N (vectors, default 2e6), IVF_DIM (64), IVF_K (200),
  * SPARK_GRAFT_CPUS (32).
  */
object IvfScaleBench {

  final class ShuffleTally extends SparkListener {
    @volatile var bytes = 0L
    @volatile var records = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      bytes += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
      records += sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten
    }
  }

  /** The ROUND-7 build, inlined verbatim in shape (broadcast crossJoin
    * argmax + posexplode decimal means), for the A/B only.
    */
  def oldBuild(spark: SparkSession, emb: DataFrame, k: Int, iterations: Int = 2): DataFrame = {
    def assign(centroids: DataFrame): DataFrame =
      emb.crossJoin(broadcast(centroids))
        .withColumn("csim", graft.operators.Similarity.cosine(col("vec"), col("cvec")))
        .groupBy("vec_id")
        .agg(first(col("vec")).as("vec"),
          max(struct(col("csim"), (-col("centroid_id")).as("nid"))).as("best"))
        .select(col("vec_id"), col("vec"), (-col("best.nid")).as("centroid_id"))
    var centroids = emb.orderBy("vec_id").limit(k)
      .select(col("vec_id").as("centroid_id"), col("vec").as("cvec"))
    var assigned = assign(centroids).localCheckpoint()
    for (_ <- 1 to iterations) {
      val means = assigned
        .select(col("centroid_id"), posexplode(col("vec")).as(Seq("dim", "x")))
        .groupBy("centroid_id", "dim")
        .agg((sum(col("x").cast("decimal(38,20)")) / count(lit(1)))
          .cast("double").as("m"))
        .groupBy("centroid_id")
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("centroid_id"), expr("transform(dm, p -> p.m)").as("cvec"))
      centroids = means
      assigned = assign(centroids).localCheckpoint()
    }
    assigned
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("IVF_N", "2000000").toLong
    val dim = sys.env.getOrElse("IVF_DIM", "64").toInt
    val k = sys.env.getOrElse("IVF_K", "200").toInt
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

    // deterministic unit-scale vectors: component d of row i derives from
    // a splitmix-style hash (no RNG, reproducible at any parallelism)
    val emb0 = spark.range(n).toDF("vec_id")
      .withColumn("embedding", expr(
        s"transform(sequence(0, ${dim - 1}), d -> " +
          "cast(pmod(xxhash64(vec_id * 131 + d), 2000001) as double) / 1000000.0 - 1.0)"))
    val emb = emb0.select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
      .repartition(64).cache()
    emb.count()

    val tally = new ShuffleTally
    spark.sparkContext.addSparkListener(tally)

    def measure(label: String)(f: => DataFrame): DataFrame = {
      val b0 = tally.bytes; val r0 = tally.records
      val t0 = System.nanoTime()
      val out = f
      val cnt = out.count()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // let the listener bus drain stage metrics
      println(f"$label%-14s wall ${secs}%8.1f s  rows $cnt  shuffleWrite ${(tally.bytes - b0) / 1e6}%10.1f MB (${tally.records - r0} records)")
      out
    }

    println(s"n=$n dim=$dim k=$k")
    spark.sparkContext.setJobDescription("ivf: round-8 build")
    val newA = measure("round-8 build") {
      graft.operators.Similarity.ivfIndex(emb.select(col("vec_id"), col("vec").as("embedding")),
        nCentroids = k).assigned
    }
    spark.sparkContext.setJobDescription("ivf: round-7 build (inlined)")
    val oldA = measure("round-7 build") { oldBuild(spark, emb, k) }
    spark.sparkContext.setJobDescription(null)

    // assignments must be row-identical (bit-identical csim argmax)
    val diff = newA.select("vec_id", "centroid_id")
      .exceptAll(oldA.select("vec_id", "centroid_id")).count()
    println(s"assignment diff rows: $diff ${if (diff == 0) "(IDENTICAL)" else "(MISMATCH!)"}")
    spark.stop()
  }
}
