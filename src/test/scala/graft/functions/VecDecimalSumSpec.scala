package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** VecDecimalSum must be bit-identical to the posexplode +
  * sum(decimal(38,20)) formulation it replaced in the IVF Lloyd mean
  * (any grouping of exact decimal additions is the same sum), including
  * across partitions (partial + merge + serialize round trip).
  */
class VecDecimalSumSpec extends SparkTestBase {

  test("elementwise decimal sum matches the exploded sum(decimal) form, multi-partition") {
    import spark.implicits._
    val rows = (0 until 500).map { i =>
      (i % 7, Seq.tabulate(16)(d => math.sin(i * 16 + d) * (if (d % 3 == 0) -1 else 1)))
    }
    val df = rows.toDF("g", "vec").repartition(8).cache()

    val viaAgg = df
      .select(col("g"), expr("transform(vec, x -> CAST(x AS DECIMAL(38,20)))").as("dvec"))
      .groupBy("g")
      .agg(VecDecimalSum.vec_decimal_sum(col("dvec")).as("sums"), count(lit(1)).as("nrows"))
      .select(col("g"), expr("transform(sums, s -> CAST(s / nrows AS DOUBLE))").as("m"))
      .as[(Int, Seq[Double])].collect().toMap

    val viaExplode = df
      .select(col("g"), posexplode(col("vec")).as(Seq("dim", "x")))
      .groupBy("g", "dim")
      .agg((sum(col("x").cast("decimal(38,20)")) / count(lit(1))).cast("double").as("m"))
      .groupBy("g")
      .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
      .select(col("g"), expr("transform(dm, p -> p.m)").as("m"))
      .as[(Int, Seq[Double])].collect().toMap

    df.unpersist()
    assert(viaAgg.keySet == viaExplode.keySet)
    viaAgg.foreach { case (g, m) =>
      assert(m.length == 16)
      // bit-identical, not approximate: compare raw long bits
      assert(m.map(java.lang.Double.doubleToLongBits) ==
        viaExplode(g).map(java.lang.Double.doubleToLongBits), s"group $g diverged")
    }
  }

  test("length mismatch inside a group fails loudly") {
    import spark.implicits._
    val df = Seq((0, Seq(1.0, 2.0)), (0, Seq(1.0))).toDF("g", "vec")
    val ex = intercept[Exception] {
      df.select(col("g"), expr("transform(vec, x -> CAST(x AS DECIMAL(38,20)))").as("dvec"))
        .groupBy("g").agg(VecDecimalSum.vec_decimal_sum(col("dvec")).as("s"))
        .collect()
    }
    assert(ex.getMessage != null)
  }
}
