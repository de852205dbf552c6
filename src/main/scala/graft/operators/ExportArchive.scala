package graft.operators

import java.io.{BufferedOutputStream, OutputStream}
import java.nio.charset.StandardCharsets.US_ASCII
import java.nio.file.{Files, Path}
import java.util.zip.GZIPOutputStream

import scala.jdk.CollectionConverters._

/** S11: tar.gz export-all — the reference streams every exported slice
  * file into one `export.tar.gz` (/root/reference/osmtopo/env.go:575-655).
  * Pure driver-side packaging over files `Export.writeSlices` already
  * wrote (the reference does the same: it tars its output directory, it
  * does not re-derive data), so it sits outside the distributed engine —
  * a minimal POSIX ustar writer + GZIP, no external tooling.
  *
  * Deterministic by construction: entries are added in sorted relative
  * -path order with fixed mode/uid/gid/mtime, so the same input directory
  * always produces byte-identical archive *contents* (the gzip header's
  * mtime field is zeroed by GZIPOutputStream).
  */
object ExportArchive {

  /** Package every regular file under `dir` (recursively) into a POSIX
    * ustar tar.gz at `out`, entry names relative to `dir`. Returns the
    * entry names in archive order.
    */
  def tarGz(dir: Path, out: Path): Seq[String] = {
    val outReal = out.toAbsolutePath.normalize
    val walk = Files.walk(dir)
    val files =
      try walk.iterator().asScala.filter(Files.isRegularFile(_))
        // never swallow the archive itself — the reference writes
        // export.tar.gz INSIDE the directory it tars, and a second run
        // would otherwise pack run 1's archive (breaking determinism)
        .filter(p => p.toAbsolutePath.normalize != outReal)
        .toSeq
      finally walk.close() // Files.walk holds directory handles until closed
    val sorted = files.sortBy(p => dir.relativize(p).toString)
    val os = new GZIPOutputStream(new BufferedOutputStream(Files.newOutputStream(out)))
    try {
      sorted.foreach { f =>
        val name = dir.relativize(f).toString
        val data = Files.readAllBytes(f)
        writeEntry(os, name, data)
      }
      os.write(new Array[Byte](1024)) // end-of-archive: two zero blocks
    } finally os.close()
    sorted.map(p => dir.relativize(p).toString)
  }

  /** One ustar header block + padded file data. */
  private def writeEntry(os: OutputStream, name: String, data: Array[Byte]): Unit = {
    require(name.getBytes(US_ASCII).length <= 100,
      s"entry name exceeds the 100-byte ustar name field: $name")
    val h = new Array[Byte](512)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes(US_ASCII)
      System.arraycopy(b, 0, h, off, b.length)
    }
    def putOctal(off: Int, len: Int, v: Long): Unit =
      // len-1 digits + NUL terminator, zero-padded (the common ustar form)
      put(off, ("%0" + (len - 1) + "o").format(v))

    put(0, name)                   // name[100]
    putOctal(100, 8, 420)          // mode[8] = 0644
    putOctal(108, 8, 0)            // uid[8]
    putOctal(116, 8, 0)            // gid[8]
    putOctal(124, 12, data.length) // size[12]
    putOctal(136, 12, 0)           // mtime[12] — fixed for determinism
    put(148, "        ")           // chksum[8]: spaces while summing
    h(156) = '0'                   // typeflag: regular file
    put(257, "ustar")              // magic[6] (NUL-terminated by zeros)
    put(263, "00")                 // version[2]
    val sum = h.foldLeft(0L)((a, b) => a + (b & 0xff))
    put(148, "%06o".format(sum))   // chksum: 6 octal digits + NUL + space
    h(154) = 0                     // POSIX mandates NUL here, then space
    h(155) = ' '
    os.write(h)
    os.write(data)
    val pad = (512 - data.length % 512) % 512
    if (pad > 0) os.write(new Array[Byte](pad))
  }
}
