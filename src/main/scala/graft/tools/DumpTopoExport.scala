package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the sources.TopoGolden literal body from the LIVE engine's
  * countries-topology export — the intentional-refreeze path for the
  * frozen arcs/uses fixture backing the q_topo_objects/q_topo_slices
  * oracles. Usage: runMain graft.tools.DumpTopoExport [cpus]
  * (document WHY in the commit message whenever the output changes).
  */
object DumpTopoExport {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (arcs, uses) = graft.SparkEntry.liveTopoExport(spark)
    def d(v: Double): String = {
      val s = java.lang.Double.toString(v)
      if (s.contains('.') || s.contains('E')) s else s + ".0"
    }
    println("  val arcs: Seq[(Long, Long, Double, Double, Double, Double)] = Seq(")
    println(arcs.map { case (id, len, x0, y0, x1, y1) =>
      s"    (${id}L, ${len}L, ${d(x0)}, ${d(y0)}, ${d(x1)}, ${d(y1)})"
    }.mkString(",\n") + ")")
    println("  val uses: Seq[(Long, Long)] = Seq(")
    println(uses.map { case (o, a) => s"    (${o}L, ${a}L)" }.mkString(",\n") + ")")
    spark.stop()
  }
}
