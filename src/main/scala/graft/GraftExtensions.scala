package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.GeomExpressions
import graft.plans.PipJoinRewrite

/** Session-extension entry point: makes the engine's SQL surface available
  * without touching application code —
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * registers every ST function (st_contains_point, st_cell_at, …) in the
  * session's function registry and injects [[graft.plans.PipJoinRewrite]]
  * into the optimizer, so a plain
  * `SELECT ... FROM pages p JOIN polys g ON st_contains_point(g.wkb, p.lon, p.lat)`
  * plans as the cover equi-join + exact residual instead of a
  * broadcast-nested-loop join.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GeomExpressions.registrations.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
    // injected into the operator-optimization fixed-point batch, so column
    // pruning / predicate pushdown re-run over the rewritten plan
    ext.injectOptimizerRule(_ => PipJoinRewrite)
  }
}

/** Imperative installer for sessions created without `spark.sql.extensions`
  * (tests, notebooks): same functions as temp registrations plus the
  * rewrite via `experimental.extraOptimizations`.
  */
object Graft {
  def install(spark: SparkSession): Unit = {
    GeomExpressions.register(spark)
    if (!spark.experimental.extraOptimizations.contains(PipJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PipJoinRewrite
  }
}
