package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private val quotes = Seq(
    (1L, "2024-01-01 10:00:00", 100.0),
    (1L, "2024-01-01 10:05:00", 101.0),
    (1L, "2024-01-01 10:10:00", 99.0),
    (2L, "2024-01-01 10:02:00", 50.0))
    .toDF("key", "qt", "quote")

  private val trades = Seq(
    (1L, "2024-01-01 10:03:00"),  // → 100.0 (10:00 quote)
    (1L, "2024-01-01 10:05:00"),  // → 101.0 (same-instant quote applies)
    (1L, "2024-01-01 10:30:00"),  // → 99.0  (latest)
    (2L, "2024-01-01 10:01:00"),  // → null  (no quote yet)
    (3L, "2024-01-01 10:00:00"))  // → null  (no quotes for key)
    .toDF("key", "tt")

  test("backward as-of join picks latest right at-or-before each left") {
    val got = AsOfJoin.backwardFlat(trades, quotes, "key", "tt", "qt", Seq("quote"))
      .orderBy(col("key"), col("tt"))
      .select(col("key"), col("tt"), col("asof_quote"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(got.toSeq === Seq(
      (1L, "2024-01-01 10:03:00", Some(100.0)),
      (1L, "2024-01-01 10:05:00", Some(101.0)),
      (1L, "2024-01-01 10:30:00", Some(99.0)),
      (2L, "2024-01-01 10:01:00", None),
      (3L, "2024-01-01 10:00:00", None)))
  }

  test("left row count preserved; multiple rights per (key,time) resolve by rightOrder") {
    val dupQuotes = quotes.union(Seq((1L, "2024-01-01 10:05:00", 500.0)).toDF("key", "qt", "quote"))
    val joined = AsOfJoin.backward(trades, dupQuotes, "key", "tt", "qt",
      Seq("quote"), rightOrder = Some(col("quote")))
    assert(joined.count() === trades.count())
    // highest __ro (quote=500.0) is the last-written state at 10:05
    val at1005 = joined.filter(col("tt") === "2024-01-01 10:05:00")
      .select(col("asof.quote")).first().getDouble(0)
    assert(at1005 === 500.0)
  }
}
