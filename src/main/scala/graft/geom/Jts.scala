package graft.geom

import org.locationtech.jts.geom._
import org.locationtech.jts.geom.prep.PreparedGeometryFactory
import org.locationtech.jts.io.{WKBReader, WKBWriter}

/** JTS plumbing: thread-confined factories and WKB codecs. Geometry
  * travels between Spark operators as WKB `BinaryType` columns (our
  * analogue of the reference's cached GeoJSON bytes,
  * /root/reference/osmtopo/model/storage.proto:44-47).
  */
object Jts {
  // GeometryFactory is thread-safe; readers/writers are not.
  val factory = new GeometryFactory(new PrecisionModel(), 4326)

  private val readerTl = ThreadLocal.withInitial[WKBReader](() => new WKBReader(factory))
  private val writerTl = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter(2))

  def fromWkb(bytes: Array[Byte]): Geometry = readerTl.get().read(bytes)
  def toWkb(g: Geometry): Array[Byte] = writerTl.get().write(g)

  def coord(x: Double, y: Double) = new Coordinate(x, y)

  def point(lon: Double, lat: Double): Point = factory.createPoint(coord(lon, lat))

  def ring(pts: IndexedSeq[(Double, Double)]): LinearRing = {
    // loud precondition (the else branch below would otherwise throw an
    // opaque `head of empty` from pts.head on an empty sequence)
    require(pts.nonEmpty, "ring requires at least one point")
    val closed = if (pts.head == pts.last) pts else pts :+ pts.head
    factory.createLinearRing(closed.map { case (x, y) => coord(x, y) }.toArray)
  }

  def polygon(shell: IndexedSeq[(Double, Double)], holes: Seq[IndexedSeq[(Double, Double)]] = Nil): Polygon =
    factory.createPolygon(ring(shell), holes.map(ring).toArray)

  def prepare(g: Geometry) = PreparedGeometryFactory.prepare(g)
}
