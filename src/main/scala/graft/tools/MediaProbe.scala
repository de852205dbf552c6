package graft.tools

import org.apache.spark.sql.functions._

/** Round-8 media-path breakdown (guide §1.4 noop isolation): splits
  * q_media_avi's cost into fixture ENCODE (aviVideos generation) vs
  * container parse vs full frame decode, each timed with a noop sink.
  */
object MediaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

    def time(label: String, reps: Int = 3)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-34s min ${ts.min}%.3f  all ${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    spark.read.parquet(s"$sfDir/documents.parquet").limit(10).count() // warm

    time("aviVideos encode only") { noop(graft.sources.Fixtures.aviVideos(spark, sfDir)) }
    time("encode + parse (no pixel decode)") {
      noop(graft.sources.Fixtures.aviVideos(spark, sfDir).as[(String, Array[Byte])]
        .mapPartitions(_.map { case (url, avi) =>
          val v = graft.operators.AviCodec.parse(url, avi)
          (url, v.width, v.height, v.frames.length)
        }).toDF("url", "w", "h", "nf"))
    }
    time("full q_media_avi") {
      graft.SparkEntry.queries("q_media_avi")(spark, sfDir).count()
    }
    time("jpegImages encode only") { noop(graft.sources.Fixtures.jpegImages(spark, sfDir)) }
    time("full q_media_jpeg") {
      graft.SparkEntry.queries("q_media_jpeg")(spark, sfDir).count()
    }
    spark.stop()
  }
}
