package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.marts.TpchQueries
import graft.sources.Tables

class TpchQueriesSpec extends AnyFunSuite {
  import TestSession._

  test("revenue_by_nation: every nation keyed once, revenue positive") {
    val df = TpchQueries.revenueByNation(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.select("n_name").distinct().count() === df.count())
    assert(df.filter(col("revenue") <= 0).count() === 0)
  }

  test("top_parts: exactly k rows in descending revenue order") {
    val rows = TpchQueries.topParts(spark, sf).collect()
    assert(rows.length === 5)
    val revs = rows.map(_.getAs[Double]("part_revenue"))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("percentile sketch gate: zero violations at default accuracy; coarse sketch is caught") {
    import graft.marts.TpchHeavyQueries
    val gate = TpchHeavyQueries.orderValuePercentilesApproxGate(spark, sf).cache()
    assert(gate.count() > 0)
    assert(gate.filter(col("n_out_of_bound") =!= 0).count() === 0,
      "default-accuracy percentile sketch left its rank window")
    // negative control: a deliberately coarse sketch gated against a
    // tight rank window must trip — proves the gate can actually fire
    val coarse = TpchHeavyQueries.orderValuePercentilesApproxGate(
      spark, sf, accuracy = 4, gateAccuracy = 100000)
    assert(coarse.agg(sum("n_out_of_bound")).first().getLong(0) > 0,
      "gate failed to flag an accuracy=4 sketch at a 1e-5 rank window")
  }

  test("gapfill: complete spine, revenue conserved, LOCF non-null after first observation") {
    import graft.marts.TpchMoreQueries
    val df = TpchMoreQueries.gapfillNationRevenue(spark, sf).cache()
    val nations = Tables.nation(spark, sf).count()
    val days = df.select("day").distinct().count()
    // dense panel: every (nation, day) cell exists exactly once
    assert(df.count() === nations * days)
    assert(df.groupBy("n_name", "day").count().filter(col("count") > 1).count() === 0)
    // zero-fill is additive-safe: panel total == raw total revenue
    val panelTotal = df.agg(sum(col("day_revenue").cast("decimal(18,2)")))
      .first().getDecimal(0)
    val rawTotal = Tables.orders(spark, sf)
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))).first().getDecimal(0)
    assert(panelTotal.compareTo(rawTotal) === 0)
    // LOCF: null only before a nation's first order, never after one
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("n_name").orderBy("day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val seen = df.withColumn("had_rev",
      max(when(col("day_revenue") > 0, 1).otherwise(0)).over(w))
    assert(seen.filter(col("had_rev") === 1 && col("last_known_avg").isNull).count() === 0)
    assert(seen.filter(col("had_rev") === 0 && col("last_known_avg").isNotNull).count() === 0)
  }

  test("union_counts: one row per table, counts positive") {
    val df = TpchQueries.unionCounts(spark, sf)
    assert(df.count() === 10)
    assert(df.filter(col("row_count") <= 0).count() === 0)
  }

  test("anti join: excluded customers really have no big orders") {
    val kept = TpchQueries.customersWithoutBigOrders(spark, sf)
    val bigCusts = Tables.orders(spark, sf).filter(col("o_totalprice") > 400000)
      .select(col("o_custkey").as("c_custkey")).distinct()
    assert(kept.join(bigCusts, Seq("c_custkey"), "inner").count() === 0)
  }

  test("order_priority_share sums to ~100") {
    val total = TpchQueries.orderPriorityShare(spark, sf)
      .agg(sum("pct_of_total")).first().getDouble(0)
    assert(math.abs(total - 100.0) < 0.5)
  }

  test("sessionize: no session spans a >30min internal gap; events conserved") {
    val sess = TpchQueries.sessionize(spark, sf).cache()
    val nEvents = Tables.events(spark, sf).count()
    assert(sess.agg(sum("session_events")).first().getLong(0) === nEvents)
    // each (user, session) duration is consistent with event count
    assert(sess.filter(col("duration_seconds") < 0).count() === 0)
    assert(sess.filter(col("session_events") === 1 && col("duration_seconds") =!= 0).count() === 0)
  }

  test("recent_shipments watermark keeps only trailing window") {
    val df = TpchQueries.recentShipments(spark, sf)
    val totalLines = Tables.lineitem(spark, sf).count()
    val recent = df.agg(sum("recent_lines")).first().getLong(0)
    assert(recent > 0 && recent < totalLines)
  }
}
