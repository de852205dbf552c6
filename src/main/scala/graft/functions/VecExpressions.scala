package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Static entry point referenced by generated code (whole-stage codegen
  * emits a plain static call; the loop inside is primitive-array math).
  */
object VecCodegen {
  /** Sequential array-order dot product — the SAME IEEE summation order
    * as `aggregate(zip_with(a, b, _*_), 0.0, _+_)` (a left fold in index
    * order), so swapping one for the other is bit-identical. Mirrors that
    * composition's null semantics too: length mismatch (zip_with pads
    * nulls) or any null element poisons the result to null.
    */
  def dotOrNull(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

/** vec_dot(a, b) — dot product of two array<double> columns as ONE
  * codegen'd primitive loop. The `aggregate(zip_with(...))` composition it
  * replaces evaluates a lambda expression tree per element with boxed
  * accumulators — fine semantically, but ~an order of magnitude more work
  * per pair on the all-pairs similarity paths where the dot product IS the
  * job.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  // nullSafeEval may itself return null (length mismatch / null element)
  override def nullSafeEval(a: Any, b: Any): Any =
    VecCodegen.dotOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val a = left.genCode(ctx)
    val b = right.genCode(ctx)
    val r = ctx.freshName("dot")
    ev.copy(code =
      code"""
        ${a.code}
        ${b.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${a.isNull} && !${b.isNull}) {
          java.lang.Double $r = graft.functions.VecCodegen.dotOrNull(${a.value}, ${b.value});
          if ($r != null) { ${ev.isNull} = false; ${ev.value} = $r.doubleValue(); }
        }""")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  override def prettyName: String = "vec_dot"
}

/** Column-API surface for the vector expression layer. */
object VecExpressions {
  private def col(e: Expression): Column = org.apache.spark.sql.graft.Bridge.column(e)
  private def expr(c: Column): Expression = org.apache.spark.sql.graft.Bridge.expression(c)

  def vec_dot(a: Column, b: Column): Column = col(VecDot(expr(a), expr(b)))
}
