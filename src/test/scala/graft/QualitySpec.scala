package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.quality.DataChecks

/** Data-test combinator suites (the dbt-tests analog). */
class QualitySpec extends AnyFunSuite {
  import TestSession._

  test("silver suite: all checks pass on clean silver") {
    val rep = SparkEntry.queries("quality_silver_report")(spark, sf).collect()
    assert(rep.length === 7)
    assert(rep.forall(_.getBoolean(2)), rep.mkString("; "))
  }

  test("gold suite: all checks pass on the gold marts") {
    val rep = SparkEntry.queries("quality_gold_report")(spark, sf).collect()
    assert(rep.length === 10)
    assert(rep.forall(_.getBoolean(2)), rep.mkString("; "))
  }

  test("benford screen: conforming data passes, uniform digits fail") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // log-uniform magnitudes follow Benford closely
    val conforming = (1 to 4000)
      .map(_ => math.pow(10, rnd.nextDouble() * 6)).toDF("x")
    assert(DataChecks.benford(conforming, "x").violations.count() === 0)
    // uniform [1000, 2000): first digit always 1 -> hard fail
    val uniform = (1 to 4000).map(i => 1000.0 + (i % 1000)).toDF("x")
    assert(DataChecks.benford(uniform, "x").violations.count() === 1)
  }

  test("outlier screen flags planted extremes only") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val base = (1 to 5000).map(_ => rnd.nextGaussian()).toDF("x")
    assert(DataChecks.outliers(base, "x", maxSigma = 8).violations.count() === 0)
    val planted = base.union(Seq(1e6).toDF("x"))
    val v = DataChecks.outliers(planted, "x", maxSigma = 8).violations
    assert(v.count() === 1)
  }

  test("checks actually detect violations") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1, "a"), (1, "b"), (2, null)).toDF("k", "v")
    assert(DataChecks.unique(df, Seq("k")).violations.count() === 1)
    assert(DataChecks.notNull(df, "v").violations.count() === 1)
    assert(DataChecks.acceptedValues(df, "v", Seq("a")).violations.count() === 1)
    // both k=1 rows have x=10 < 15
    assert(DataChecks.acceptedRange(df.withColumn("x", col("k") * 10),
      "x", min = Some(15.0), max = None).violations.count() === 2)
  }
}
