package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: GoldenSpec-canonical hash of one query (stability probe before
  * freezing a golden). Usage: runMain graft.tools.DriveGolden <name> <cpus>
  */
object DriveGolden {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_ann_ivf")
    val cpus = args.drop(1).headOption.getOrElse("4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    val rows = df.collect().map(_.toString).sorted
    val md = java.security.MessageDigest.getInstance("SHA-256")
    rows.foreach(r => md.update(r.getBytes("UTF-8")))
    println(s"GOLDEN $name cpus=$cpus rows=${rows.length} hash=" +
      md.digest().map("%02x".format(_)).mkString.take(16))
    spark.stop()
  }
}
