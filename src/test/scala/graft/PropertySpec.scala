package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5 test plan): bucket totality,
  * dedup idempotence, decimal-sum partitioning invariance — ScalaCheck
  * generators drive random fixtures through the real column
  * expressions (deterministic seeds, no scalatestplus bridge needed). */
class PropertySpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("price bucketing is total: every double lands in exactly one bucket") {
    val cases = samples(Gen.listOfN(50, Gen.chooseNum(-1000.0, 10000.0)), 10)
    val domain = Set("UNKNOWN", "0-50", "50-100", "100-200", "200-500", "500+")
    cases.foreach { xs =>
      val df = xs.toDF("price")
        .withColumn("b", graft.ops.Bucketize.priceBucket(col("price")))
      assert(df.filter(col("b").isNull).count() === 0)
      assert(df.select("b").distinct().collect().map(_.getString(0)).toSet.subsetOf(domain))
    }
  }

  test("time-of-day bucketing is total over all 24 hours") {
    val df = (0 to 23).toDF("h").withColumn("tod", graft.ops.Bucketize.timeOfDay(col("h")))
    assert(df.filter(col("tod").isNull).count() === 0)
    assert(df.select("tod").distinct().count() === 4)
  }

  test("dedup idempotence and survivor-determinism on random keyed data") {
    val cases = samples(
      Gen.listOfN(60, Gen.zip(Gen.chooseNum(0L, 9L), Gen.chooseNum(0L, 100L))), 5)
    cases.foreach { rows =>
      val df = rows.toDF("k", "v")
      val once = graft.ops.Dedup.latestPerKey(df, Seq("k"), Seq(col("v").desc))
      val twice = graft.ops.Dedup.latestPerKey(once, Seq("k"), Seq(col("v").desc))
      assert(once.count() === df.select("k").distinct().count())
      assert(once.except(twice).count() === 0 && twice.except(once).count() === 0)
      // survivor is the max v per key (deterministic rule)
      val expect = df.groupBy("k").agg(max("v").as("v"))
      assert(once.except(expect).count() === 0)
    }
  }

  test("moneySum is partitioning-invariant (decimal determinism)") {
    val xs = Seq.tabulate(500)(i => (i % 7, (i * 17 % 1000) / 100.0 + 0.01))
    def total(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(graft.ops.ConditionalAgg.moneySum(col("x")).as("s"))
    val a = total(xs.toDF("k", "x").repartition(1))
    val b = total(xs.toDF("k", "x").repartition(32))
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
  }

  test("rate guards: rates non-negative, denominators guarded (no inf/NaN)") {
    // NOTE: rates CAN exceed 100 here — event types are independent in
    // this dataset, so a segment can have more distinct purchasers than
    // viewers; the reference formula has the same property and only
    // guards the zero denominator (gold_conversion_funnel_daily.sql:91).
    val c = SparkEntry.queries("gold_conversion_funnel_daily")(spark, sf)
    assert(c.filter(col("overall_conversion_rate") < 0 ||
      isnan(col("overall_conversion_rate"))).count() === 0)
    val f = SparkEntry.queries("gold_user_journey_funnel")(spark, sf)
    assert(f.filter(col("total_purchases") > col("total_events")).count() === 0)
  }
}
