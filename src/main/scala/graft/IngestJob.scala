package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Ingest
import graft.sources.{Fixtures, SnapshotTable}

/** The ingest job: OSM-shaped sources → assembled polygon layers →
  * cell-cover index, committed as snapshot-table snapshots with
  * per-partition lineage + row/byte metrics (the reference's update loop,
  * env.go:227-249, made resumable). Run:
  *
  *   sbt "runMain graft.IngestJob <baseDir> [--resume]"
  *
  * A second invocation with --resume after an interruption completes only
  * the missing partitions; a second invocation without --resume is a no-op
  * refresh (skip-if-current: every layer partition is carried over).
  */
object IngestJob {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/tmp/graft_tables")
    val resume = args.contains("--resume")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val inputs = Seq("nodes", "ways", "relations")
    val polys = Ingest.polygons(spark, Fixtures.nodesDf(spark), Fixtures.waysDf(spark),
      Fixtures.relationsDf(spark), Fixtures.blacklist)

    val mPolys =
      if (resume) SnapshotTable.resume(polys, base, "polygons", "layer", inputs)
      else {
        // skip-if-current: layers already in the parent snapshot are
        // carried over untouched (staleness-stamp semantics)
        val current = SnapshotTable.latest(base, "polygons")
          .map(_.partitions.map(_.key).toSet).getOrElse(Set.empty)
        SnapshotTable.commit(polys, base, "polygons", "layer", inputs,
          keepFromParent = current)
      }

    val covers = Ingest.cellCovers(SnapshotTable.read(spark, base, "polygons"))
    val mCovers = SnapshotTable.commit(covers, base, "cell_covers", "layer",
      inputs = Seq(s"polygons@snapshot=${mPolys.snapshot}"),
      lineage = mPolys.partitions.map(p => p.key -> Seq(s"polygons/${p.key}")).toMap)

    println(s"""{"polygons_snapshot":${mPolys.snapshot},"polygons_rows":${mPolys.partitions.map(_.rows).sum},""" +
      s""""covers_snapshot":${mCovers.snapshot},"covers_rows":${mCovers.partitions.map(_.rows).sum}}""")
    spark.stop()
  }
}
