package graft.sources

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-style snapshot table layer over partitioned Parquet: every
  * commit writes a JSON manifest listing the snapshot's partitions with
  * per-partition row counts, byte sizes and lineage — the Spark analogue
  * of the reference's stamp/flag/sequence checkpoint keys
  * (/root/reference/osmtopo/db.go:52-142) that make the hourly update loop
  * resumable and auditable.
  *
  * Layout:
  *   <base>/<table>/data/snapshot=<N>/<partCol>=<v>/...parquet
  *   <base>/<table>/manifests/snapshot-<N>.json
  *
  * Semantics:
  *  - `commit` — full write of a new snapshot; partitions already present
  *    in the parent snapshot whose keys are in `keep` are *referenced*,
  *    not rewritten (skip-if-current: the reference's staleness stamps,
  *    water.go:26-34);
  *  - `resume` — recommit after a crash: only partitions missing from the
  *    interrupted snapshot's data dir are computed and written;
  *  - `merge` — keyed upsert+delete producing a new snapshot (the diff
  *    replication semantics, source.go:93-220), with the change-batch
  *    sequence number recorded like `int/seq/<name>`.
  */
object SnapshotTable {

  case class PartitionMeta(key: String, path: String, rows: Long, bytes: Long,
                           lineage: Seq[String])
  case class Manifest(table: String, partCol: String, snapshot: Long, parent: Long,
                      seq: Long, inputs: Seq[String], partitions: Seq[PartitionMeta])

  private def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** In-file shadow copy of the partition value (partitionBy strips the
    * column itself from the data files). Constant per file → parquet
    * dictionary/RLE encodes it to ~nothing.
    */
  private[sources] def shadowCol(partCol: String): String = s"__${partCol}_v"

  /** Inverse of the %XX escaping partitionBy applies to special chars in
    * partition dir names — manifest keys must be LOGICAL values (they are
    * compared against column values in merge/commit-keep paths).
    */
  private def unescapeDir(s: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.unescapePathName(s)

  private def manifestJson(m: Manifest): String = {
    val parts = m.partitions.map { p =>
      s"""{"key":${q(p.key)},"path":${q(p.path)},"rows":${p.rows},"bytes":${p.bytes},""" +
        s""""lineage":[${p.lineage.map(q).mkString(",")}]}"""
    }.mkString("[", ",", "]")
    s"""{"table":${q(m.table)},"partCol":${q(m.partCol)},"snapshot":${m.snapshot},"parent":${m.parent},""" +
      s""""seq":${m.seq},"inputs":[${m.inputs.map(q).mkString(",")}],"partitions":$parts}"""
  }

  /** Minimal JSON field extraction (manifests are engine-written, flat). */
  private def parseManifest(json: String): Manifest = {
    // inverse of q()'s escaping — keys/paths containing " or \ must
    // round-trip exactly (merge compares manifest keys to column values)
    def unesc(v: String): String =
      "\\\\(.)".r.replaceAllIn(v, m => scala.util.matching.Regex.quoteReplacement(m.group(1)))
    def longOf(name: String): Long =
      s""""$name":(-?\\d+)""".r.findFirstMatchIn(json).map(_.group(1).toLong).get
    def strList(arr: String): Seq[String] =
      "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(arr).map(m => unesc(m.group(1))).toSeq
    val partsJson = json.substring(json.indexOf("\"partitions\":") + 13)
    val parts = "\\{[^{}]*\\}".r.findAllIn(partsJson).toSeq.map { pj =>
      def f(n: String) = s""""$n":(-?\\d+)""".r.findFirstMatchIn(pj).map(_.group(1).toLong).get
      def s(n: String) = (s""""$n":"((?:[^"\\\\]|\\\\.)*)"""").r.findFirstMatchIn(pj).map(m => unesc(m.group(1))).get
      val lineage = pj.indexOf("\"lineage\":[") match {
        case -1 => Nil
        case i => strList(pj.substring(i + 11, pj.indexOf("]", i)))
      }
      PartitionMeta(s("key"), s("path"), f("rows"), f("bytes"), lineage)
    }
    val inputsArr = json.indexOf("\"inputs\":[") match {
      case -1 => Nil
      case i => strList(json.substring(i + 10, json.indexOf("]", i)))
    }
    def strField(name: String): String =
      (s""""$name":"((?:[^"\\\\]|\\\\.)*)"""").r.findFirstMatchIn(json).map(m => unesc(m.group(1))).get
    Manifest(strField("table"), strField("partCol"),
      longOf("snapshot"), longOf("parent"), longOf("seq"), inputsArr, parts)
  }

  def manifestDir(base: String, table: String): Path = Paths.get(base, table, "manifests")

  def latest(base: String, table: String): Option[Manifest] = {
    val dir = manifestDir(base, table)
    if (!Files.exists(dir)) None
    else {
      val listing = Files.list(dir)
      val files =
        try listing.iterator().asScala
          .filter(_.getFileName.toString.startsWith("snapshot-")).toSeq
        finally listing.close()
      if (files.isEmpty) None
      else {
        val newest = files.maxBy(p =>
          p.getFileName.toString.stripPrefix("snapshot-").stripSuffix(".json").toLong)
        Some(parseManifest(Files.readString(newest)))
      }
    }
  }

  private def dirBytes(p: Path): Long = {
    val walk = Files.walk(p)
    try walk.iterator().asScala.filter(Files.isRegularFile(_)).map(Files.size).sum
    finally walk.close()
  }

  /** Per-partition completion marker (underscore-prefixed → invisible to
    * parquet readers, like _SUCCESS). Written only after the write job for
    * a partition directory has fully succeeded; resume() treats any
    * partition directory WITHOUT it as a torn write and recomputes it —
    * a crash mid-job can leave task-committed files in a directory that
    * never finished (the reference gates on stamp keys written only after
    * completion, db.go:52-88).
    */
  private val Marker = "_GRAFT_COMMITTED"

  private def partitionDirs(dataDir: Path, partCol: String): Seq[Path] =
    if (!Files.exists(dataDir)) Nil
    else {
      val listing = Files.list(dataDir)
      try listing.iterator().asScala
        .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith(s"$partCol="))
        .toSeq
      finally listing.close()
    }

  private def writeMarkers(dataDir: Path, partCol: String): Unit =
    partitionDirs(dataDir, partCol).foreach { p =>
      val m = p.resolve(Marker)
      if (!Files.exists(m)) Files.writeString(m, "")
    }

  private def deleteRecursively(p: Path): Unit = {
    val walk = Files.walk(p)
    try walk.sorted(java.util.Comparator.reverseOrder[Path]())
      .iterator().asScala.foreach(Files.delete)
    finally walk.close()
  }

  /** Fail loudly when the write produced a null-partition-value directory.
    * The old `!isin` keep-filter silently dropped null-partCol rows (null
    * predicate); the anti-join keeps them, and partitionBy then writes
    * them to a __HIVE_DEFAULT_PARTITION__ directory whose dir key can
    * never equal the (null) shadow value — the manifest would record
    * rows=0 for a non-empty partition and merge() could never address it.
    * Null partition values are a data bug either way: reject before the
    * marker is stamped (the unmarked dir reads as a torn write to any
    * later resume, so nothing downstream ever trusts it).
    */
  private def rejectNullPartition(dataDir: Path, partCol: String): Unit = {
    val hd = dataDir.resolve(s"$partCol=__HIVE_DEFAULT_PARTITION__")
    if (Files.exists(hd))
      throw new IllegalArgumentException(
        s"snapshot table write produced null $partCol values " +
          s"(${hd}); null partition values are not supported — filter or " +
          "coalesce them before commit")
  }

  /** Drop rows whose partition value is in `keys` — a broadcast anti-join,
    * not an `isin` literal: a 10^4-partition snapshot would otherwise bake
    * 10^4 literals into the plan (the hybrid-join rule: sets that scale
    * with data never become expression trees).
    */
  private def exceptPartitions(df: DataFrame, partCol: String, keys: Set[String]): DataFrame =
    if (keys.isEmpty) df
    else {
      val spark = df.sparkSession
      val keysDf = spark.createDataset(keys.toSeq)(org.apache.spark.sql.Encoders.STRING)
        .toDF("__keep_key")
      df.join(broadcast(keysDf), col(partCol).cast("string") === col("__keep_key"), "left_anti")
    }

  /** Write df partitioned by `partCol` into a new snapshot. Partition keys
    * listed in `keepFromParent` are carried over from the parent manifest
    * (not recomputed). Returns the committed manifest.
    */
  def commit(df: DataFrame, base: String, table: String, partCol: String,
             inputs: Seq[String] = Nil, lineage: Map[String, Seq[String]] = Map.empty,
             keepFromParent: Set[String] = Set.empty, seq: Long = 0L): Manifest = {
    val parent = latest(base, table)
    val snapId = parent.map(_.snapshot + 1).getOrElse(0L)
    val dataDir = Paths.get(base, table, "data", s"snapshot=$snapId")

    val kept = parent.toSeq.flatMap(_.partitions).filter(p => keepFromParent(p.key))
    val toWrite = exceptPartitions(df, partCol, keepFromParent)

    toWrite.withColumn(shadowCol(partCol), col(partCol))
      .write.mode(SaveMode.Overwrite).partitionBy(partCol)
      .parquet(dataDir.toString)
    rejectNullPartition(dataDir, partCol)
    writeMarkers(dataDir, partCol) // job succeeded: stamp every partition

    val written = writtenPartitions(df.sparkSession, dataDir, partCol, lineage, inputs)
    val manifest = Manifest(table, partCol, snapId, parent.map(_.snapshot).getOrElse(-1L),
      seq, inputs, (written ++ kept).sortBy(_.key))
    writeManifest(base, table, manifest)
    manifest
  }

  private def writtenPartitions(spark: SparkSession, dataDir: Path, partCol: String,
                                lineage: Map[String, Seq[String]], inputs: Seq[String]): Seq[PartitionMeta] = {
    val dirs = partitionDirs(dataDir, partCol)
    if (dirs.isEmpty) return Nil
    // ONE aggregate scan for every partition's row count (a per-partition
    // count() loop is O(partitions) driver-sequential Spark jobs per
    // commit). Grouping by the in-file SHADOW column, not the discovered
    // partition column: discovery type-infers dir names ("01" becomes
    // int 1), so its stringified value can diverge from the dir key and
    // silently record rows=0; the shadow column is the exact value.
    val counts = spark.read.parquet(dataDir.toString)
      .groupBy(col(shadowCol(partCol)).cast("string").as("__k"))
      .count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    dirs.map { p =>
      val key = unescapeDir(p.getFileName.toString.stripPrefix(s"$partCol="))
      PartitionMeta(key, p.toString, counts.getOrElse(key, 0L), dirBytes(p),
        lineage.getOrElse(key, inputs))
    }
  }

  private def writeManifest(base: String, table: String, m: Manifest): Unit = {
    val dir = manifestDir(base, table)
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(s"snapshot-${m.snapshot}.json"), manifestJson(m))
  }

  /** Resume an interrupted commit: partitions whose directories carry the
    * completion marker are kept as-is; unmarked directories are torn
    * writes — deleted and recomputed along with the missing ones. Produces
    * the manifest the original commit would have produced.
    */
  def resume(df: DataFrame, base: String, table: String, partCol: String,
             inputs: Seq[String] = Nil, seq: Long = 0L): Manifest = {
    val parent = latest(base, table)
    val snapId = parent.map(_.snapshot + 1).getOrElse(0L)
    val dataDir = Paths.get(base, table, "data", s"snapshot=$snapId")
    // nothing to resume: no interrupted snapshot dir exists past the
    // latest manifest — the previous commit COMPLETED, so return it
    // unchanged instead of recomputing every partition into a brand-new
    // snapshot (a crash strictly before the first partition file leaves
    // no dir either; rerun without --resume for a fresh commit then)
    parent match {
      case Some(m) if !Files.exists(dataDir) => return m
      case _ =>
    }
    val (complete, torn) = partitionDirs(dataDir, partCol)
      .partition(p => Files.exists(p.resolve(Marker)))
    torn.foreach(deleteRecursively)
    val existing: Set[String] =
      complete.map(p => unescapeDir(p.getFileName.toString.stripPrefix(s"$partCol="))).toSet

    val missing = exceptPartitions(df, partCol, existing)
    missing.withColumn(shadowCol(partCol), col(partCol))
      .write.mode(SaveMode.Append).partitionBy(partCol).parquet(dataDir.toString)
    rejectNullPartition(dataDir, partCol)
    writeMarkers(dataDir, partCol)

    val manifest = Manifest(table, partCol, snapId, parent.map(_.snapshot).getOrElse(-1L),
      seq, inputs, writtenPartitions(df.sparkSession, dataDir, partCol, Map.empty, inputs).sortBy(_.key))
    writeManifest(base, table, manifest)
    manifest
  }

  def read(spark: SparkSession, base: String, table: String): DataFrame = {
    val m = latest(base, table).getOrElse(sys.error(s"no snapshot for $table"))
    // ONE multi-path scan, not a unionByName tower (one DataFrame per
    // partition makes a 10⁴-partition snapshot a 10⁴-node plan — driver
    // plan explosion at scale). partitionBy strips the partition column
    // from the data files, so commit() writes a shadow copy of the value
    // INTO the files and read restores it by rename — exact value AND
    // type round-trip with no file-path parsing (path extraction has two
    // failure modes: an unanchored `col=` match elsewhere in the path,
    // and partitionBy's %XX dir-name escaping diverging from the URI
    // form input_file_name reports).
    //
    // mergeSchema: a snapshot can MIX pre-shadow partitions (kept from an
    // old parent via keepFromParent) with shadow-carrying ones; without it
    // Spark may pick the schema from a shadow-bearing file and read the
    // legacy files' shadow as null, which the rename would propagate into
    // partCol. With it, legacy rows surface as null shadow and are
    // backfilled from the file path below (raw dir-name form, cast back
    // to the shadow column's type — same best-effort as the pure-legacy
    // fallback, exact for every post-shadow row).
    val df = spark.read.option("mergeSchema", "true").parquet(m.partitions.map(_.path): _*)
    val sc = shadowCol(m.partCol)
    lazy val pathVal = regexp_extract(input_file_name(),
      "/" + java.util.regex.Pattern.quote(m.partCol) + "=([^/]+)/[^/]*$", 1)
    if (df.columns.contains(sc))
      df.withColumn(sc, coalesce(col(sc), pathVal.cast(df.schema(sc).dataType)))
        .withColumnRenamed(sc, m.partCol)
    else
      // legacy fallback (pre-shadow snapshots): anchored extraction of the
      // FINAL `partCol=` path segment (the data file's immediate parent).
      // Raw dir-name form — no %XX unescape (best-effort for old data;
      // every new commit carries the exact shadow column)
      df.withColumn(m.partCol, pathVal)
  }

  /** Keyed MERGE (upsert + delete) producing a new snapshot — the diff
    * replication semantics (add/mod are upserts, del removes; applied in
    * sequence order, seq recorded in the manifest like `int/seq/<name>`).
    * Only partitions containing changed keys are rewritten; untouched
    * partitions are referenced from the parent.
    */
  def merge(spark: SparkSession, base: String, table: String, partCol: String,
            keyCol: String, upserts: DataFrame, deleteKeys: DataFrame, seq: Long): Manifest = {
    val current = read(spark, base, table)
    // affected = target partitions of upserts + current partitions of
    // deleted keys + current partitions of upserted keys (a key moving
    // across partitions must rewrite its *old* partition too)
    val affected = upserts.select(partCol)
      .union(current.join(deleteKeys, Seq(keyCol), "left_semi").select(partCol))
      .union(current.join(upserts.select(keyCol), Seq(keyCol), "left_semi").select(partCol))
      .distinct().collect().map(_.get(0).toString).toSet

    val untouchedKeys = latest(base, table).get.partitions.map(_.key).toSet -- affected
    val merged = current
      .join(deleteKeys, Seq(keyCol), "left_anti")
      .join(upserts.select(keyCol), Seq(keyCol), "left_anti")
      .unionByName(upserts)
    commit(merged, base, table, partCol, inputs = Seq(s"changeset-seq-$seq"),
      keepFromParent = untouchedKeys, seq = seq)
  }
}
