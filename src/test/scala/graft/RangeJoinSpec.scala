package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.RangeJoin
import graft.sources.Tables

class RangeJoinSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private lazy val tiers = Seq(
    ("A", 0.0, 100.0), ("B", 100.0, 250.0), ("C", 250.0, 1000.0))
    .toDF("tier", "lo", "hi")

  test("bucketed range join equals the naive theta formulation") {
    val facts = Tables.events(spark, sf).select(col("event_id"), col("value"))
    val naive = RangeJoin.naive(facts, tiers, col("value"), col("lo"), col("hi"))
      .select("event_id", "tier")
    val bucketed = RangeJoin.bucketed(facts, tiers, "value", "lo", "hi", bucketWidth = 50.0)
      .select("event_id", "tier")
    assert(naive.count() === bucketed.count())
    assert(naive.except(bucketed).count() === 0)
    assert(bucketed.except(naive).count() === 0)
  }

  test("boundary semantics: lo inclusive, hi exclusive, cell-aligned his don't leak") {
    val pts = Seq(0.0, 99.999, 100.0, 249.99, 250.0, 999.99, 1000.0)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("event_id", "value")
    val got = RangeJoin.bucketed(pts, tiers, "value", "lo", "hi", bucketWidth = 50.0)
      .select("event_id", "tier").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(0L -> "A", 1L -> "A", 2L -> "B", 3L -> "B", 4L -> "C", 5L -> "C"))
    // 1000.0 (== hi of C, exclusive) matches nothing
    assert(!got.contains(6L))
  }

  test("bucketed plan is an equi join, not nested loop") {
    val facts = Tables.events(spark, sf).select(col("event_id"), col("value"))
    val plan = RangeJoin.bucketed(facts, tiers, "value", "lo", "hi", 50.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
