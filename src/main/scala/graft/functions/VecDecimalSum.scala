package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Elementwise sum of `array<decimal(38,20)>` columns as ONE
  * partial-aggregable native aggregate — the IVF Lloyd mean
  * recomputation previously posexploded every assigned vector into
  * (centroid_id, dim, x) rows and paid TWO shuffles per iteration (the
  * per-(centroid, dim) sum, then the collect_list regroup into arrays).
  * This aggregate keeps vectors whole: map-side partials hold one
  * dim-length decimal array per centroid, the shuffle carries k × tasks
  * partial states, and the regroup shuffle disappears (guide §2.3/§2.4 —
  * aggregate before you shuffle; remove shuffles outright).
  *
  * Exactness: decimal addition at scale 20 is EXACT and associative, so
  * any partial/merge order produces the bit-identical sum the
  * posexplode + `sum(decimal)` form produced — the property the whole
  * DECIMAL-mean design rests on (q_ann_ivf's DuckDB oracle replays it).
  * Magnitude contract (same as the SQL form): |sum| must stay within
  * DECIMAL(38,20) — unit-scale embedding components over 10^12 rows do.
  * All input arrays of a group must share one length; a mismatch fails
  * loudly instead of silently truncating.
  */
final class VecDecSumBuf {
  var sums: Array[java.math.BigDecimal] = null

  def add(arr: ArrayData): Unit = {
    val n = arr.numElements()
    if (sums == null) sums = Array.fill(n)(java.math.BigDecimal.ZERO)
    require(sums.length == n,
      s"vec_decimal_sum: vector length $n != ${sums.length} in the same group")
    var i = 0
    while (i < n) {
      val d = arr.getDecimal(i, 38, 20)
      if (d != null) sums(i) = sums(i).add(d.toJavaBigDecimal)
      i += 1
    }
  }
}

case class VecDecimalSum(vec: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecDecSumBuf] with UnaryLike[Expression] {

  override def child: Expression = vec
  override protected def withNewChildInternal(newChild: Expression): VecDecimalSum =
    copy(vec = newChild)

  override def createAggregationBuffer(): VecDecSumBuf = new VecDecSumBuf

  override def update(buf: VecDecSumBuf, input: InternalRow): VecDecSumBuf = {
    val v = vec.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(a: VecDecSumBuf, b: VecDecSumBuf): VecDecSumBuf = {
    if (b.sums != null) {
      if (a.sums == null) a.sums = b.sums
      else {
        require(a.sums.length == b.sums.length,
          s"vec_decimal_sum: merge of lengths ${a.sums.length} != ${b.sums.length}")
        var i = 0
        while (i < a.sums.length) { a.sums(i) = a.sums(i).add(b.sums(i)); i += 1 }
      }
    }
    a
  }

  override def eval(buf: VecDecSumBuf): Any = {
    if (buf.sums == null) null
    else {
      val out = new Array[Any](buf.sums.length)
      var i = 0
      while (i < buf.sums.length) {
        // scale-20 additions keep scale 20; changedPrecision guards the
        // (unreachable at contract magnitudes) overflow loudly
        val d = org.apache.spark.sql.types.Decimal(buf.sums(i))
        require(d.changePrecision(38, 20), s"vec_decimal_sum overflow: ${buf.sums(i)}")
        out(i) = d
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override def serialize(buf: VecDecSumBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    if (buf.sums == null) out.writeInt(-1)
    else {
      out.writeInt(buf.sums.length)
      var i = 0
      while (i < buf.sums.length) {
        val unscaled = buf.sums(i).unscaledValue().toByteArray
        out.writeInt(buf.sums(i).scale())
        out.writeInt(unscaled.length)
        out.write(unscaled)
        i += 1
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecDecSumBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new VecDecSumBuf
    val n = in.readInt()
    if (n >= 0) {
      buf.sums = new Array[java.math.BigDecimal](n)
      var i = 0
      while (i < n) {
        val scale = in.readInt()
        val len = in.readInt()
        val b = new Array[Byte](len)
        in.readFully(b)
        buf.sums(i) = new java.math.BigDecimal(new java.math.BigInteger(b), scale)
        i += 1
      }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecDecimalSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecDecimalSum =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DecimalType(38, 20), containsNull = false)
  override def prettyName: String = "vec_decimal_sum"
}

object VecDecimalSum {
  def vec_decimal_sum(vec: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      VecDecimalSum(org.apache.spark.sql.graft.Bridge.expression(vec)).toAggregateExpression())
}
