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
