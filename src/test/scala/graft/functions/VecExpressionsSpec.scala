package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** VecDot: bit-identical to the aggregate(zip_with) composition it
  * replaced, null-faithful, and genuinely codegen'd (fallback disabled —
  * a doGenCode bug would throw instead of silently interpreting).
  */
class VecExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  private def refDot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
    aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)

  test("vec_dot is bit-identical to aggregate(zip_with) on random vectors") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      (i.toLong, Seq.fill(64)(rnd.nextDouble() * 2 - 1), Seq.fill(64)(rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
      .select(col("id"),
        VecExpressions.vec_dot(col("a"), col("b")).as("fast"),
        refDot(col("a"), col("b")).as("ref"))
    // exact bit equality, not tolerance: same IEEE summation order
    assert(df.filter(col("fast") =!= col("ref")).count() == 0)
    assert(df.filter(col("fast").isNull).count() == 0)
  }

  test("vec_dot null semantics match the composition: mismatch/null element -> null") {
    val df = Seq(
      (1L, Seq(1.0, 2.0), Seq(3.0, 4.0)),      // ok: 11.0
      (2L, Seq(1.0, 2.0), Seq(3.0)),            // length mismatch -> null
      (3L, Seq(1.0), Seq[Double]())             // mismatch -> null
    ).toDF("id", "a", "b")
      .select(col("id"), VecExpressions.vec_dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(df(1L) == Some(11.0) && df(2L).isEmpty && df(3L).isEmpty)

    // null ELEMENT -> null (matches zip_with/aggregate poisoning)
    val withNullElem = spark.sql(
      "SELECT id, a, b FROM VALUES (4L, array(1.0, cast(null as double)), array(1.0, 2.0)) t(id, a, b)")
      .select(VecExpressions.vec_dot(col("a"), col("b")).as("d"),
        refDot(col("a"), col("b")).as("ref"))
      .head()
    assert(withNullElem.isNullAt(0) && withNullElem.isNullAt(1))
  }

  test("vec_dot stays codegen'd (no silent fallback)") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val n = Seq((1L, Seq(1.0, 2.0, 3.0)), (2L, Seq(4.0, 5.0, 6.0))).toDF("id", "v")
        .select(VecExpressions.vec_dot(col("v"), col("v")).as("d"))
        .filter(col("d") > 0).count()
      assert(n == 2)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }
}
