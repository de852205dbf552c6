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
    // flags are not positional args: `runMain graft.IngestJob --resume`
    // must keep the default baseDir, not ingest into a dir named --resume
    val base = args.filterNot(_.startsWith("--")).headOption.getOrElse("/tmp/graft_tables")
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

    // skip-if-current for the covers too, at LAYER granularity: a cover
    // layer is current when its recorded lineage still names the same
    // polygons partition (path + row count identity — a kept polygons
    // partition keeps its path across snapshot bumps, so a no-op polygons
    // refresh leaves every cover layer current). Current layers are
    // carried over AND excluded from the (expensive) cover computation
    // itself; a fully-current refresh is a true no-op.
    val coversLineage = mPolys.partitions
      .map(p => p.key -> Seq(s"polygons/${p.key}@${p.path}#${p.rows}")).toMap
    val coversParent = SnapshotTable.latest(base, "cell_covers")
    val coversCurrent = coversParent
      .map(_.partitions.filter(p => coversLineage.get(p.key).contains(p.lineage))
        .map(_.key).toSet)
      .getOrElse(Set.empty)
    val polyLayers = mPolys.partitions.map(_.key).toSet
    // the fully-current shortcut requires the parent's partition KEY SET to
    // equal polyLayers exactly: with a subset check alone, a polygons layer
    // REMOVED since the parent snapshot would stay in the returned parent
    // manifest (it is excluded from coversCurrent but still present there),
    // leaving cell_covers a stale superset of polygons — the commit path
    // below drops it correctly via keepFromParent
    val parentKeys = coversParent.map(_.partitions.map(_.key).toSet).getOrElse(Set.empty)
    val mCovers =
      if (coversCurrent.nonEmpty && polyLayers.subsetOf(coversCurrent) && parentKeys == polyLayers)
        coversParent.get // fully current
      else {
        val staleOnly = SnapshotTable.read(spark, base, "polygons")
          .filter(!org.apache.spark.sql.functions.col("layer")
            .isin(coversCurrent.toSeq: _*)) // layer count is small (curated)
        SnapshotTable.commit(Ingest.cellCovers(staleOnly), base, "cell_covers", "layer",
          inputs = Seq(s"polygons@snapshot=${mPolys.snapshot}"),
          lineage = coversLineage,
          keepFromParent = coversCurrent)
      }

    println(s"""{"polygons_snapshot":${mPolys.snapshot},"polygons_rows":${mPolys.partitions.map(_.rows).sum},""" +
      s""""covers_snapshot":${mCovers.snapshot},"covers_rows":${mCovers.partitions.map(_.rows).sum}}""")
    spark.stop()
  }
}
