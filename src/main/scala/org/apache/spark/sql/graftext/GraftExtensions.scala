package org.apache.spark.sql.graftext

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in optimizer rule: rewrite exact COUNT(DISTINCT x) to the
  * HyperLogLog++ sketch aggregate (SURVEY §7.4 "auto approx-distinct
  * rewrite"). At 100 TB an exact distinct forces an expand + two-phase
  * shuffle per distinct column; the sketch is a mergeable single-pass
  * aggregate. Guarded by `spark.graft.approxDistinct` (default off —
  * correctness gates run exact) with `spark.graft.approxDistinct.rsd`
  * controlling the error bound.
  */
object RewriteExactDistinct extends Rule[LogicalPlan] {
  val ConfKey = "spark.graft.approxDistinct"
  val RsdKey  = "spark.graft.approxDistinct.rsd"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "false").toBoolean) plan
    else {
      val rsd = conf.getConfString(RsdKey, "0.05").toDouble
      plan.transformAllExpressions {
        case ae @ AggregateExpression(c: Count, _, true, _, _) if c.children.size == 1 =>
          ae.copy(
            aggregateFunction = HyperLogLogPlusPlus(c.children.head, rsd),
            isDistinct = false)
      }
    }
}

/** Engine extensions: `SparkSession.builder.withExtensions(new
  * GraftExtensions)` or `spark.sql.extensions=org.apache.spark.sql.graftext.GraftExtensions`.
  * Registers the approx-distinct rewrite and the native `cosine_sim`
  * SQL function. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteExactDistinct)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("approx_top_k_ss"),
      new ExpressionInfo(classOf[ApproxTopK].getName, "approx_top_k_ss"),
      (exprs: Seq[Expression]) => ApproxTopK(exprs(0),
        k = exprs(1).eval().asInstanceOf[Int],
        capacity = exprs(2).eval().asInstanceOf[Int]).toAggregateExpression()))
  }
}
