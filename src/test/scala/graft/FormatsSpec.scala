package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Formats, Tables}

class FormatsSpec extends AnyFunSuite {
  import TestSession._

  test("lineitem round-trips through every shipped format") {
    val tmp = Files.createTempDirectory("graft_fmt_").toString
    val src = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag").cache()
    for (fmt <- Formats.roundTrippable) {
      Formats.write(src, s"$tmp/$fmt", fmt)
      val back = Formats.read(spark, s"$tmp/$fmt", fmt, Some(src.schema))
      assert(back.count() === src.count(), s"$fmt row count")
      assert(back.except(src).count() === 0, s"$fmt contents")
    }
  }

  test("columnar formats push filters to the scan") {
    val tmp = Files.createTempDirectory("graft_fmt_push_").toString
    val src = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    for (fmt <- Seq("parquet", "orc")) {
      Formats.write(src, s"$tmp/$fmt", fmt)
      val plan = Formats.read(spark, s"$tmp/$fmt", fmt)
        .filter(col("l_orderkey") === 42).queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,42)"),
        s"$fmt plan missing pushdown:\n$plan")
    }
  }

  test("approx daily sales tracks exact within rsd bounds") {
    val silver = SparkEntry.queries("silver_events")(spark, sf)
    val exact = graft.marts.DailySales.build(silver)
      .select(col("event_date"), col("unique_users").as("eu"), col("unique_buyers").as("eb"))
    val approx = graft.marts.DailySales.buildApprox(silver)
      .select(col("event_date"), col("unique_users").as("au"), col("unique_buyers").as("ab"))
    val j = exact.join(approx, "event_date")
    // 2% rsd → allow 10% absolute slack on small daily cardinalities
    assert(j.filter(abs(col("au") - col("eu")) > col("eu") * 0.1 + 2).count() === 0)
    assert(j.filter(abs(col("ab") - col("eb")) > col("eb") * 0.1 + 2).count() === 0)
  }
}
