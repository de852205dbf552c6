package graft.geom

import org.locationtech.jts.geom.{Geometry, Polygon}
import scala.collection.mutable.ArrayBuffer

/** Polygon + hole assembly with the reference's exact semantics
  * (/root/reference/osmtopo/polygon.go:7-79):
  *
  *  - shells are processed in input order;
  *  - for each shell, the *remaining* inner rings contained in it
  *    (prepared `contains` on the inner polygon) become its holes and are
  *    consumed (an inner can only be claimed once, first shell wins);
  *  - assembled polygons with planar area < 1e-5 (degrees²) are dropped;
  *  - a single surviving polygon is returned as Polygon, otherwise a
  *    MultiPolygon (possibly empty).
  */
object PolygonAssembly {

  val MinArea = 1e-5

  /** outers/inners: closed rings as (lon,lat) sequences. Returns None when
    * any ring fails to build (reference errors out of ToGeometry →
    * relation skipped, geometries.go:136-140).
    */
  def makePolygons(
      outers: Seq[IndexedSeq[(Double, Double)]],
      inners: Seq[IndexedSeq[(Double, Double)]]): Option[Geometry] = {
    try {
      // GEOS NewPolygon requires explicitly closed rings; an unmerged chain
      // aborts the relation in the reference — mirror that, don't auto-close.
      (outers ++ inners).foreach { r =>
        if (r.length < 4 || r.head != r.last)
          throw new IllegalArgumentException("ring not closed")
      }
      val innerPolys = ArrayBuffer.from(inners.map(r => Jts.polygon(r)))
      val polygons = ArrayBuffer[Polygon]()
      for (shellRing <- outers) {
        val shell = Jts.polygon(shellRing)
        val holes = ArrayBuffer[IndexedSeq[(Double, Double)]]()
        if (innerPolys.nonEmpty) {
          val pshell = Jts.prepare(shell)
          var i = 0
          while (i < innerPolys.length) {
            if (pshell.contains(innerPolys(i))) {
              val cs = innerPolys(i).getExteriorRing.getCoordinates
              holes += cs.map(c => (c.x, c.y)).toIndexedSeq
              innerPolys.remove(i)
              // do not advance: mirrors the i-- in polygon.go:35
            } else i += 1
          }
        }
        val polygon = Jts.polygon(shellRing, holes.toSeq)
        if (polygon.getArea >= MinArea) polygons += polygon
      }
      if (polygons.length == 1) Some(polygons.head)
      else Some(Jts.factory.createMultiPolygon(polygons.toArray))
    } catch {
      case _: Exception => None
    }
  }

  /** Full relation assembly: merged outer/inner node-ref chains expanded to
    * coordinates, then polygon assembly and buffer(0) self-intersection
    * repair (storage.go:128-172, 101-105). Node lookup failure aborts the
    * relation (storage.go:194-196).
    */
  def assembleRelation(
      outerChains: Seq[Seq[Long]],
      innerChains: Seq[Seq[Long]],
      nodeCoord: Long => Option[(Double, Double)]): Option[Geometry] = {
    def expand(chains: Seq[Seq[Long]]): Option[Seq[IndexedSeq[(Double, Double)]]] = {
      val out = ArrayBuffer[IndexedSeq[(Double, Double)]]()
      for (chain <- chains) {
        val pts = ArrayBuffer[(Double, Double)]()
        for (id <- chain) nodeCoord(id) match {
          case Some(p) => pts += p
          case None    => return None
        }
        out += pts.toIndexedSeq
      }
      Some(out.toSeq)
    }
    for {
      outs <- expand(outerChains)
      ins <- expand(innerChains)
      geom <- makePolygons(outs, ins)
      repaired <- try Some(geom.buffer(0)) catch { case _: Exception => None }
    } yield repaired
  }
}
