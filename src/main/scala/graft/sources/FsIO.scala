package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FileSystem, Path}

/** Range-read primitives over the Hadoop FileSystem API, shared by the
  * binary format readers (Shapefile, OsmPbf). Positioned `readFully` is
  * part of the FSDataInputStream contract on every implementation, so
  * one code path serves file:, hdfs: and s3a: — a local RandomAccessFile
  * would silently limit the readers to single-machine runs, which is the
  * opposite of the 100 TB story.
  */
private[sources] object FsIO {
  // one Configuration per JVM — construction parses XML resources, and
  // the readers need nothing site-specific from it
  private lazy val conf = new Configuration()

  def open(path: String): (FileSystem, Path) = {
    // plain filesystem paths go through File.toURI so URI-special
    // characters (#, %, a colon inside a segment) survive — Hadoop's
    // Path(String) constructor would parse "#..." as a fragment and
    // open the wrong file; real URIs (scheme://) pass through untouched
    // scheme:/... (Hadoop Path.toString renders file URIs with a single
    // slash) and scheme://... both count as URIs; "batch:1/f" does not
    val p =
      if (path.matches("[a-zA-Z][a-zA-Z0-9+.-]*:/.*")) new Path(path)
      else new Path(new java.io.File(path).toURI)
    val fs = p.getFileSystem(conf) match {
      // local files: bypass the ChecksumFileSystem wrapper — we write no
      // .crc sidecars, and its buffered positioned reads cost ~2× on the
      // range-read pattern (measured in tools.PbfThroughput); hdfs:/s3a:
      // paths keep their native FileSystem untouched
      case l: org.apache.hadoop.fs.LocalFileSystem => l.getRaw
      case f => f
    }
    (fs, p)
  }

  def openStream(path: String): FSDataInputStream = {
    val (fs, p) = open(path)
    fs.open(p)
  }

  def length(path: String): Long = status(path).getLen

  def status(path: String): org.apache.hadoop.fs.FileStatus = {
    val (fs, p) = open(path)
    fs.getFileStatus(p)
  }

  def readFullyAt(path: String, offset: Long, len: Int): Array[Byte] = {
    val in = openStream(path)
    try { val buf = new Array[Byte](len); in.readFully(offset, buf, 0, len); buf }
    finally in.close()
  }

  /** The task-side stream lifecycle both format readers need, in ONE
    * place: a single lazily-opened FSDataInputStream per task, closed
    * BOTH when the output iterator is drained and at task completion —
    * the listener covers early abandonment (limit/take) and exceptions
    * mid-partition, where a drain-time close alone would leak a
    * descriptor per task attempt.
    */
  def perTaskStream[A, T](path: String, it: Iterator[A])(
      f: (FSDataInputStream, A) => IterableOnce[T]): Iterator[T] = {
    var in: FSDataInputStream = null
    def stream(): FSDataInputStream = {
      if (in == null) in = openStream(path)
      in
    }
    def closeNow(): Unit = if (in != null) { in.close(); in = null }
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => closeNow()))
    val out = it.flatMap(a => f(stream(), a))
    new Iterator[T] {
      def hasNext: Boolean = {
        val h = out.hasNext
        if (!h) closeNow()
        h
      }
      def next(): T = out.next()
    }
  }
}
