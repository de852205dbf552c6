package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded exact top-k by (dist, url) — a native
  * [[TypedImperativeAggregate]] so the per-round best-k reduction in
  * batch kNN participates in PARTIAL aggregation (each map task ships at
  * most k rows per group into the shuffle) without the row-level encoder
  * round-trip a Dataset `Aggregator` pays: update/merge work directly on
  * InternalRow inputs and a primitive-array buffer.
  *
  * Tie order is (dist ascending, url ascending by UTF8String binary
  * comparison) — identical to `row_number() over (order by dist, url)`,
  * so the aggregation form and the rank-window form of the per-round
  * best-k produce row-identical results (KnnBatchSpec pins it).
  */
final class TopKBuf(val k: Int) {
  var n = 0
  val dists = new Array[Double](k)
  val urls = new Array[UTF8String](k)

  @inline private def less(d: Double, u: UTF8String, i: Int): Boolean = {
    val di = dists(i)
    d < di || (d == di && u.compareTo(urls(i)) < 0)
  }

  /** Insert keeping ascending (dist, url) order, bounded at k. `u` may
    * alias shared task memory (an unsafe-row slice): it is compared
    * as-is and CLONED only on acceptance, so the dominant rejected-row
    * path allocates nothing. */
  def insert(d: Double, u: UTF8String): Unit = {
    if (n == k && !less(d, u, n - 1)) return
    var idx = n
    var i = 0
    var found = false
    while (i < n && !found) {
      if (less(d, u, i)) { idx = i; found = true }
      i += 1
    }
    val last = math.min(n, k - 1)
    var j = last
    while (j > idx) {
      dists(j) = dists(j - 1); urls(j) = urls(j - 1); j -= 1
    }
    if (idx < k) { dists(idx) = d; urls(idx) = u.clone(); if (n < k) n += 1 }
  }
}

case class TopKByDist(dist: Expression, url: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuf] with BinaryLike[Expression] {
  require(k > 0, s"k must be positive, got $k")

  override def left: Expression = dist
  override def right: Expression = url
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): TopKByDist =
    copy(dist = newLeft, url = newRight)

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val d = dist.eval(input)
    val u = url.eval(input)
    if (d != null && u != null) {
      buf.insert(d.asInstanceOf[Double], u.asInstanceOf[UTF8String])
    }
    buf
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    // both sides sorted; bounded merge to k
    val out = new TopKBuf(k)
    var i = 0; var j = 0
    while (out.n < k && (i < a.n || j < b.n)) {
      val takeA = j >= b.n || (i < a.n && {
        val cmp = java.lang.Double.compare(a.dists(i), b.dists(j))
        cmp < 0 || (cmp == 0 && a.urls(i).compareTo(b.urls(j)) <= 0)
      })
      if (takeA) { out.dists(out.n) = a.dists(i); out.urls(out.n) = a.urls(i); i += 1 }
      else { out.dists(out.n) = b.dists(j); out.urls(out.n) = b.urls(j); j += 1 }
      out.n += 1
    }
    out
  }

  override def eval(buf: TopKBuf): Any = {
    val rows = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      rows(i) = new GenericInternalRow(Array[Any](buf.dists(i), buf.urls(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.n)
    var i = 0
    while (i < buf.n) {
      out.writeDouble(buf.dists(i))
      val bytes = buf.urls(i).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuf(k)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      buf.dists(i) = in.readDouble()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.urls(i) = UTF8String.fromBytes(b)
      i += 1
    }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByDist =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByDist =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = false
  override def dataType: DataType = TopKByDist.OutType
  override def prettyName: String = "topk_by_dist"
}

object TopKByDist {
  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("dist", DoubleType, nullable = false),
    StructField("url", StringType, nullable = false))), containsNull = false)

  def topk_by_dist(dist: Column, url: Column, k: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      TopKByDist(
        org.apache.spark.sql.graft.Bridge.expression(dist),
        org.apache.spark.sql.graft.Bridge.expression(url),
        k).toAggregateExpression())
}
