package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gold-mart invariants — encodes the reference's dbt tests and the
  * FIXTURES §3 key invariants (unique keys, bounded rates, funnel
  * monotonicity, segment domains). */
class MartsSpec extends AnyFunSuite {
  import TestSession._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("ewma: first day passes through, smoothed value inside running [min,max], responds to alpha") {
    val df = q("q_ewma_daily_revenue").orderBy("event_date").cache()
    val rows = df.collect()
    assert(rows.length > 1)
    // EWMA_1 = x_1 (the fold's seed)
    assert(math.abs(rows.head.getAs[Double]("ewma_revenue") -
      rows.head.getAs[Double]("revenue")) < 1e-9)
    // a convex recurrence stays inside the running envelope
    var lo = Double.MaxValue; var hi = Double.MinValue
    rows.foreach { r =>
      val x = r.getAs[Double]("revenue"); lo = math.min(lo, x); hi = math.max(hi, x)
      val e = r.getAs[Double]("ewma_revenue")
      // tolerance covers the roundPortable(…, 4) quantum (5e-5): a
      // value within half an ulp-of-round of the running min/max may
      // round just outside the envelope
      assert(e >= lo - 1e-4 && e <= hi + 1e-4, s"EWMA $e outside [$lo,$hi]")
    }
    // alpha=1 degenerates to the raw series
    val silver = SparkEntry.queries("silver_events")(spark, sf)
    val raw = graft.marts.DailySales.ewmaDailyRevenue(silver, alpha = 1.0)
    assert(raw.filter(abs(col("ewma_revenue") - col("revenue")) > 1e-6).count() === 0)
  }

  test("ewma: 10-year daily spine runs within the calendar-bounded contract, exact vs driver fold") {
    // the operator's documented grain bound: the running collect_list
    // window is O(|days|^2) values through one task, safe BECAUSE the
    // input is the post-aggregation daily series. 3 653 days (10 years)
    // is the upper end of any daily panel — prove it completes and
    // matches the sequential recurrence bit-for-bit after the same
    // DECIMAL(28,10)->round(4) portable-rounding path.
    import spark.implicits._
    val days = 3653
    val syn = spark.range(days)
      .select(date_add(lit(java.sql.Date.valueOf("2015-01-01")), col("id").cast("int")).as("event_date"),
        lit("purchase").as("event_type"),
        (pmod(col("id") * 37 + 11, lit(997)) / 10.0 + 1.0).as("price"))
      .select(col("event_date"), col("event_type"), col("price").cast("decimal(18,2)").cast("double").as("price"))
    val out = graft.marts.DailySales.ewmaDailyRevenue(syn).orderBy("event_date").collect()
    assert(out.length === days)
    var acc = 0.0
    val alpha = 0.3
    out.zipWithIndex.foreach { case (r, i) =>
      val x = r.getAs[Double]("revenue")
      // same Scala expressions the operator builds its literals from
      acc = if (i == 0) x else alpha * x + (1 - alpha) * acc
      val expected = new java.math.BigDecimal(java.math.BigDecimal.valueOf(acc)
          .setScale(10, java.math.RoundingMode.HALF_UP).toString)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
      assert(r.getAs[Double]("ewma_revenue") === expected,
        s"day $i: fold ${r.getAs[Double]("ewma_revenue")} != recurrence $expected")
    }
  }

  test("hourly_traffic: key unique, events_per_user >= 1") {
    val df = q("gold_hourly_traffic").cache()
    assert(df.count() > 0)
    assert(df.select("event_date", "event_hour").distinct().count() === df.count())
    assert(df.filter(col("events_per_user") < 1).count() === 0)
  }

  test("item_performance: item_key unique, rates in [0,100] when bounded") {
    val df = q("gold_item_performance").cache()
    assert(df.select("item_key").distinct().count() === df.count())
    assert(df.filter(col("total_revenue") < 0).count() === 0)
    assert(df.filter(col("first_purchase_date") > col("last_purchase_date")).count() === 0)
  }

  test("user_journey: user_id unique, funnel stage domain, flag consistency") {
    val df = q("gold_user_journey_funnel").cache()
    assert(df.select("user_id").distinct().count() === df.count())
    val stages = df.select("current_funnel_stage").distinct().collect().map(_.getString(0)).toSet
    assert(stages.subsetOf(Set("PURCHASED", "CLICKED", "VIEWED", "SIGNED_UP", "OTHER")))
    // has_purchased=1 => total_purchases>0
    assert(df.filter(col("has_purchased") === 1 && col("total_purchases") === 0).count() === 0)
  }

  test("conversion_funnel: stage counts positive-guarded, rates bounded") {
    val df = q("gold_conversion_funnel_daily").cache()
    assert(df.filter(col("stage_1_view_users") <= 0).count() === 0)
    assert(df.filter(col("view_to_click_rate") < 0).count() === 0)
  }

  test("category_performance: NULL level-2 rows never match top-item join") {
    val df = q("gold_category_performance").cache()
    assert(df.count() > 0)
    // SQL equality on NULL keys: rows with NULL category_level_2 must have NULL top_item_key
    assert(df.filter(col("category_level_2").isNull && col("top_item_key").isNotNull).count() === 0)
    // non-null groups with purchases must have found a top item
    assert(df.filter(col("category_level_2").isNotNull &&
      col("purchase_count") > 0 && col("top_item_key").isNull).count() === 0)
  }

  test("rfm: user unique, scores in 1..5, quintiles balanced, segment domain") {
    val df = q("gold_user_rfm_segments").cache()
    val n = df.count()
    assert(df.select("user_id").distinct().count() === n)
    for (c <- Seq("r_score", "f_score", "m_score")) {
      assert(df.filter(col(c) < 1 || col(c) > 5).count() === 0, s"$c out of range")
      // ntile balance: bucket sizes differ by at most 1
      val sizes = df.groupBy(col(c)).count().collect().map(_.getLong(1))
      assert(sizes.max - sizes.min <= 1, s"$c unbalanced: ${sizes.toSeq}")
    }
    val segs = df.select("rfm_segment").distinct().collect().map(_.getString(0)).toSet
    assert(segs.subsetOf(Set("CHAMPION", "LOYAL", "NEW_CUSTOMER", "AT_RISK", "HIBERNATING", "REGULAR")))
    assert(df.filter(col("clv_estimate") < col("monetary")).count() === 0)
  }

  test("event patterns: constructed journeys match the expected regexes") {
    import spark.implicits._
    // user 1: view -> click -> purchase; user 2: signup -> view -> error -> purchase
    val silverish = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (1L, "2024-01-01 10:01:00", 2L, "click"),
      (1L, "2024-01-01 10:02:00", 3L, "purchase"),
      (2L, "2024-01-01 11:00:00", 4L, "signup"),
      (2L, "2024-01-01 11:01:00", 5L, "view"),
      (2L, "2024-01-01 11:02:00", 6L, "error"),
      (2L, "2024-01-01 11:03:00", 7L, "purchase"))
      .toDF("user_id", "event_time_str", "event_id", "event_type")
    val got = graft.marts.CoverageQueries.eventPatternsOver(silverish)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got === Map(
      "browse_then_buy" -> 2L, "click_then_buy" -> 1L,
      "buyer_without_errors" -> 1L, "signup_first" -> 1L))
  }

  test("event patterns: one bot user's journey is capped and the limit is map-side") {
    import spark.implicits._
    import graft.marts.CoverageQueries
    // One bot user with 100k events (a stand-in for the millions-of-events
    // skew case) plus one normal user. The journey must be bounded at
    // JourneyCap — and bounded BEFORE the shuffle: the rn<=cap filter must
    // compile to WindowGroupLimit so each mapper emits at most cap rows for
    // the bot, not all 100k.
    val bot = spark.range(100000).select(
      lit(9L).as("user_id"),
      concat(lit("2024-01-01 "), lpad((col("id") % 86400).cast("string"), 5, "0")).as("event_time_str"),
      col("id").as("event_id"),
      lit("error").as("event_type"))
    val normal = Seq((1L, "2024-01-01 10:00:00", 200001L, "view"),
      (1L, "2024-01-01 10:01:00", 200002L, "purchase"))
      .toDF("user_id", "event_time_str", "event_id", "event_type")
    val silverish = bot.unionByName(normal).repartition(8)
    val out = CoverageQueries.eventPatternsOver(silverish)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
    // Recompute the capped journeys directly to check the bound holds.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("event_time_str"), col("event_id"))
    val maxLen = silverish
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= CoverageQueries.JourneyCap)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).collect()(0).getLong(0)
    assert(maxLen === CoverageQueries.JourneyCap.toLong)
    val got = out.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got("browse_then_buy") === 1L)      // only the normal user
    assert(got("buyer_without_errors") === 1L) // bot is all-errors, excluded
  }

  test("char entropy: constant text has zero entropy, uniform pairs ln 2") {
    import spark.implicits._
    import graft.text.QualityFilters
    val docs = Seq((1L, "aaaa"), (2L, "abab")).toDF("doc_id", "text")
    val got = QualityFilters.charEntropy(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got(1L) === ((4L, 1L, 0.0)))
    assert(got(2L)._1 === 4L && got(2L)._2 === 2L)
    assert(math.abs(got(2L)._3 - math.log(2)) < 0.0001)
  }
}
