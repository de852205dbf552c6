package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

import graft.cells.Cell
import graft.geom.Jts

/** Broadcast PIP index: the reference's whole lookup path — segment-tree
  * stab + exact GEOS refine (lookup.go:156-174 + env.go:657-715) — as ONE
  * vectorized expression over a broadcast index. The Catalyst-only
  * formulation (ancestor explode ⋈ broadcast covers) is semantically
  * identical but materializes ~11 rows per page through the join; this
  * probe emits only the true matches, cutting the dominant memory traffic
  * of the 10^12-row scan. Both paths are kept and tested equal.
  *
  * The index is cell → candidate polygon ordinals; refine uses
  * thread-local IndexedPointInAreaLocators built lazily per ordinal.
  */
case class PipIndex(polys: Array[PipIndex.Poly],
                    cellToOrdinals: java.util.HashMap[java.lang.Long, Array[Int]],
                    minLevel: Int, maxLevel: Int) extends Serializable

object PipIndex {
  case class Poly(relId: Long, layer: String, wkb: Array[Byte]) extends Serializable

  /** Build from collected covers (relId, layer, cellId) + polygons
    * (relId, wkb). Driver-side; the dimension side is small by design.
    */
  def build(covers: Array[(Long, String, Long)], polygons: Map[Long, Array[Byte]]): PipIndex = {
    val polyList = covers.map { case (relId, layer, _) => (relId, layer) }.distinct.sorted
    val ordinal = polyList.zipWithIndex.toMap
    val polys = polyList.map { case (relId, layer) => Poly(relId, layer, polygons(relId)) }
    val byCell = new java.util.HashMap[java.lang.Long, Array[Int]]()
    covers.groupBy(_._3).foreach { case (cellId, cs) =>
      byCell.put(cellId, cs.map(c => ordinal((c._1, c._2))).distinct.sorted)
    }
    val levels = covers.map(c => Cell.level(c._3))
    PipIndex(polys, byCell,
      if (levels.isEmpty) 0 else levels.min,
      if (levels.isEmpty) 0 else levels.max)
  }
}

/** st_pip_probe(lon, lat) → array<int> of matched polygon ordinals. */
case class PipProbe(left: Expression, right: Expression, bc: Broadcast[PipIndex])
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = left.nullable || right.nullable

  @transient private lazy val locators =
    ThreadLocal.withInitial[Array[org.locationtech.jts.algorithm.locate.IndexedPointInAreaLocator]](
      () => new Array(bc.value.polys.length))

  override def eval(input: InternalRow): Any = {
    val lonV = left.eval(input)
    val latV = right.eval(input)
    if (lonV == null || latV == null) return null
    val lon = lonV.asInstanceOf[Double]
    val lat = latV.asInstanceOf[Double]
    val idx = bc.value
    val leaf = Cell.leaf(lon, lat)
    var out: scala.collection.mutable.ArrayBuffer[Int] = null
    val locs = locators.get()
    var l = idx.minLevel
    val coord = new org.locationtech.jts.geom.Coordinate(lon, lat)
    while (l <= idx.maxLevel) {
      val cands = idx.cellToOrdinals.get(Cell.parent(leaf, l))
      if (cands != null) {
        var i = 0
        while (i < cands.length) {
          val o = cands(i)
          var loc = locs(o)
          if (loc == null) {
            loc = new org.locationtech.jts.algorithm.locate.IndexedPointInAreaLocator(
              Jts.fromWkb(idx.polys(o).wkb))
            locs(o) = loc
          }
          if (loc.locate(coord) == org.locationtech.jts.geom.Location.INTERIOR) {
            if (out == null) out = new scala.collection.mutable.ArrayBuffer[Int](4)
            out += o
          }
          i += 1
        }
      }
      l += 1
    }
    if (out == null) UnsafeArrayData.fromPrimitiveArray(Array.emptyIntArray)
    else UnsafeArrayData.fromPrimitiveArray(out.toArray)
  }

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(cs(0), cs(1), bc)
  override def prettyName: String = "st_pip_probe"
}
