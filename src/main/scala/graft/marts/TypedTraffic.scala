package graft.marts

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import graft.sources.Tables

/** The typed `Dataset[T]` surface (SURVEY §0: "Dataset[T] with
  * case-class Encoders where type safety helps"): the silver schema as
  * a case class, and the hourly-traffic mart re-expressed with
  * `groupByKey` + custom typed `Aggregator`s — compile-time checked
  * field access end to end, verified byte-identical to the relational
  * [[HourlyTraffic]] (same DuckDB oracle).
  *
  * Shape: distinct-users is computed scalably as TWO typed
  * aggregations — first over (hour-key, user) partials, then over the
  * hour key — never a per-group `Set[Long]` buffer (which would be the
  * classic typed-API memory trap at 100 TB). Money stays exact: cents
  * as Long in the partials, one division at the end; the ratio
  * replicates `ConditionalAgg.roundPortable`'s shortest-string decimal
  * path so hashes match the relational mart bit-for-bit.
  *
  * The relational mart remains the default (whole-stage codegen, no
  * object serialization); this module is the typed-API contract and
  * its parity proof.
  */
object TypedTraffic {

  /** Silver event row (matches [[SilverEvents.build]] output exactly). */
  final case class SilverEvent(
      event_unique_id: String,
      event_id: Long,
      event_time_str: String,
      event_date: java.sql.Date,
      event_hour: Int,
      day_of_week_num: Int,
      is_weekend: Boolean,
      time_of_day: String,
      event_type: String,
      user_id: Long,
      item_key: Option[Int],
      price: Option[Double],
      price_bucket: String)

  /** Per-(hour, user) partial: the first-stage reduction. */
  final case class UserPartial(
      event_date: java.sql.Date,
      event_hour: Int,
      time_of_day: String,
      is_weekend: Boolean,
      user_id: Long,
      events: Long,
      purchases: Long,
      revenue_cents: Long)

  final case class TrafficRow(
      event_date: java.sql.Date,
      event_hour: Int,
      time_of_day: String,
      is_weekend: Boolean,
      total_events: Long,
      unique_users: Long,
      purchase_count: Long,
      hourly_revenue: Double,
      events_per_user: Double)

  /** Minimal typed sum aggregator (the removed `typed.sum` shape). */
  private final class LongSum[I](f: I => Long) extends Aggregator[I, Long, Long] {
    def zero: Long = 0L
    def reduce(b: Long, i: I): Long = b + f(i)
    def merge(a: Long, b: Long): Long = a + b
    def finish(b: Long): Long = b
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** 2-dp-double money → exact cents (price is already rounded to 2dp). */
  private def cents(p: Double): Long = math.round(p * 100.0)

  /** The portable-rounding twin of `ConditionalAgg.roundPortable`. */
  private def roundPortable(x: Double, scale: Int): Double =
    JBigDecimal.valueOf(x).setScale(10, RoundingMode.HALF_UP)
      .setScale(scale, RoundingMode.HALF_UP).doubleValue()

  def asSilver(silver: DataFrame): Dataset[SilverEvent] = {
    import silver.sparkSession.implicits._
    silver.as[SilverEvent]
  }

  def build(silver: Dataset[SilverEvent]): DataFrame = {
    val spark = silver.sparkSession
    import spark.implicits._

    val partials: Dataset[UserPartial] = silver
      .groupByKey(e => (e.event_date, e.event_hour, e.time_of_day, e.is_weekend, e.user_id))
      .agg(
        new LongSum[SilverEvent](_ => 1L).toColumn.name("events"),
        new LongSum[SilverEvent](e => if (e.event_type == "purchase") 1L else 0L)
          .toColumn.name("purchases"),
        new LongSum[SilverEvent](e =>
          if (e.event_type == "purchase") cents(e.price.getOrElse(0.0)) else 0L)
          .toColumn.name("revenue_cents"))
      .map { case ((d, h, tod, we, u), ev, pur, cts) =>
        UserPartial(d, h, tod, we, u, ev, pur, cts)
      }

    partials
      .groupByKey(p => (p.event_date, p.event_hour, p.time_of_day, p.is_weekend))
      .agg(
        new LongSum[UserPartial](_.events).toColumn.name("total_events"),
        new LongSum[UserPartial](_ => 1L).toColumn.name("unique_users"),
        new LongSum[UserPartial](_.purchases).toColumn.name("purchase_count"),
        new LongSum[UserPartial](_.revenue_cents).toColumn.name("cents"))
      .map { case ((d, h, tod, we), ev, users, pur, cts) =>
        TrafficRow(d, h, tod, we, ev, users, pur,
          hourly_revenue = cts / 100.0,
          events_per_user = roundPortable(ev.toDouble / users.toDouble, 2))
      }
      .toDF()
      .orderBy("event_date", "event_hour")
  }

  def trafficQuery(s: SparkSession, dir: String): DataFrame =
    build(asSilver(SilverEvents.build(Tables.events(s, dir))))
}
