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
  * Registers the approx-distinct rewrite, the as-of join strategy, and
  * EVERY graft native expression as a SQL function — the reference's
  * users are SQL-first (dbt models), so an expression that exists only
  * behind the Scala Column API is an incomplete operator: `cosine_sim`,
  * `jaro_winkler`, `ngram_stats`, the MP3/MP4 container-metadata
  * probes, the SpaceSaving top-k, and the mergeable KLL / Theta sketch
  * families (aggregate + merge + scalar query forms, so sketch
  * partials persist and roll up from pure SQL exactly like the Column
  * API paths the oracle gates pin). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Second/third argument as a required foldable Int (k, lgK, ...). */
  private def litInt(e: Expression, what: String): Int = e.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteExactDistinct)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    def fn(name: String, clazz: Class[_])(build: Seq[Expression] => Expression): Unit =
      e.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        build))
    fn("cosine_sim", classOf[CosineSimilarity])(x => CosineSimilarity(x(0), x(1)))
    fn("approx_top_k_ss", classOf[ApproxTopK])(x => ApproxTopK(x(0),
      k = litInt(x(1), "k"),
      capacity = litInt(x(2), "capacity")).toAggregateExpression())
    fn("jaro_winkler", classOf[JaroWinkler])(x => JaroWinkler(x(0), x(1)))
    fn("ngram_stats", classOf[NgramStats])(x =>
      NgramStats(x(0), maxN = litInt(x(1), "maxN")))
    fn("mp3_meta", classOf[ContainerMeta.Mp3Meta])(x => ContainerMeta.Mp3Meta(x(0)))
    fn("mp4_meta", classOf[ContainerMeta.Mp4Meta])(x => ContainerMeta.Mp4Meta(x(0)))
    fn("ebml_meta", classOf[ContainerMeta.EbmlMeta])(x => ContainerMeta.EbmlMeta(x(0)))
    fn("flac_meta", classOf[ContainerMeta.FlacMeta])(x => ContainerMeta.FlacMeta(x(0)))
    fn("ogg_meta", classOf[ContainerMeta.OggMeta])(x => ContainerMeta.OggMeta(x(0)))
    fn("kll_sketch_agg", classOf[KllDoublesAgg])(x =>
      KllDoublesAgg(x(0), k = litInt(x(1), "k")).toAggregateExpression())
    fn("kll_merge_agg", classOf[KllMergeAgg])(x =>
      KllMergeAgg(x(0), k = litInt(x(1), "k")).toAggregateExpression())
    fn("kll_quantile", classOf[KllQuantile])(x => KllQuantile(x(0), x(1)))
    fn("kll_ks_delta", classOf[KllKsDelta])(x => KllKsDelta(x(0), x(1)))
    fn("theta_sketch_agg", classOf[ThetaSketchAgg])(x =>
      ThetaSketchAgg(x(0), lgK = litInt(x(1), "lgK")).toAggregateExpression())
    fn("theta_union_agg", classOf[ThetaUnionAgg])(x =>
      ThetaUnionAgg(x(0), lgK = litInt(x(1), "lgK")).toAggregateExpression())
    fn("theta_intersect", classOf[ThetaIntersect])(x => ThetaIntersect(x(0), x(1)))
    fn("theta_a_not_b", classOf[ThetaANotB])(x => ThetaANotB(x(0), x(1)))
    fn("theta_union_pair", classOf[ThetaUnionPair])(x =>
      ThetaUnionPair(x(0), x(1), lgK = litInt(x(2), "lgK")))
    fn("theta_estimate", classOf[ThetaEstimate])(x => ThetaEstimate(x(0)))
  }
}
