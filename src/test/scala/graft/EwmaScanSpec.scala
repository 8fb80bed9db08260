package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.EwmaScan

/** The distributed (calendar-chunked affine-scan) EWMA: the recurrence
  * must survive chunk boundaries exactly (up to float reassociation),
  * per entity, for any contiguous chunking. */
class EwmaScanSpec extends AnyFunSuite {
  import TestSession._

  private def relErr(a: Double, b: Double): Double =
    math.abs(a - b) / math.max(math.abs(b), 1.0)

  test("chunked EWMA matches the driver recurrence across year boundaries, per entity") {
    import spark.implicits._
    // two entities, 40 days spanning a year boundary (two chunks each),
    // distinct value patterns so cross-entity leakage would show
    val rows = for {
      e <- Seq("a", "b")
      i <- 0 until 40
    } yield (e, java.sql.Date.valueOf(java.time.LocalDate.of(2023, 12, 11).plusDays(i)),
      if (e == "a") 10.0 + i else 1000.0 - 3.0 * i)
    val df = rows.toDF("entity", "day", "x")
    val got = EwmaScan.ewma(df, Seq("entity"), "day", "x")
      .select("entity", "day", "ewma").collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getDouble(2)).toMap
    assert(got.size === 80)
    val alpha = 0.3
    for (e <- Seq("a", "b")) {
      var acc = 0.0
      for (i <- 0 until 40) {
        val day = java.time.LocalDate.of(2023, 12, 11).plusDays(i).toString
        val x = if (e == "a") 10.0 + i else 1000.0 - 3.0 * i
        acc = if (i == 0) x else alpha * x + (1 - alpha) * acc
        val g = got((e, day))
        assert(relErr(g, acc) < 1e-12, s"$e $day: $g vs $acc")
      }
    }
  }

  test("single-day chunks (degenerate chunking) still reproduce the recurrence") {
    import spark.implicits._
    // chunk == order key: every chunk holds one row, so the whole
    // series flows through the affine carry composition alone
    val df = (0 until 25)
      .map(i => (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)), 5.0 + 7.0 * (i % 4)))
      .toDF("day", "x")
    val byDay = EwmaScan.ewma(df, Seq.empty, "day", "x",
        chunkExpr = c => unix_date(c))
      .select(col("day"), col("ewma").as("e1"))
    val byYear = EwmaScan.ewma(df, Seq.empty, "day", "x")
      .select(col("day"), col("ewma").as("e2"))
    val joined = byDay.join(byYear, "day")
      .agg(max(abs(col("e1") - col("e2")) / greatest(abs(col("e2")), lit(1.0))))
      .collect()(0).getDouble(0)
    assert(joined < 1e-12, s"chunking-invariance violated: $joined")
  }

  test("agreement gate report passes at spec scale") {
    val rep = EwmaScan.ewmaScanReport(spark, sf)
    assert(rep.count() === 3)
    assert(rep.filter(!col("pass")).count() === 0)
  }
}
