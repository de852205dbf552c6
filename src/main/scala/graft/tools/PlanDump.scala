package graft.tools

import java.nio.file.{Files, Paths}

/** Round-8 plan capture (guide §1: capture `.explain("formatted")` for
  * every declared query): writes one `<query>.txt` per SparkEntry query
  * into the given out dir. Args: outDir [sfDir] [name,name,...].
  * Dev/judge evidence tooling; not part of the bench contract.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r08/after")
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
    val only: Option[Set[String]] = args.drop(2).headOption.map(_.split(",").toSet)
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    Files.createDirectories(Paths.get(outDir))
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/$name.txt"), plan)
          println(s"[plandump] $name ok (${plan.length} chars)")
        } catch {
          case e: Throwable =>
            Files.writeString(Paths.get(s"$outDir/$name.txt"),
              s"PLAN CAPTURE FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}\n")
            println(s"[plandump] $name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
