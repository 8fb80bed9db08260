package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.graftext.{AsOfJoinExec, AsOfJoinNative}
import graft.ops.AsOfJoin
import graft.sources.Tables

/** The native whole-operator as-of join (logical plan + strategy +
  * physical merge exec) against the composed union-window version. */
class NativeAsOfJoinSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("native as-of join matches the composed implementation on events") {
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("signup_time"))
    val native = AsOfJoinNative.backwardFlat(
      purchases, signups, "user_id", "ts", "ts", Seq("signup_time"))
    val composed = AsOfJoin.backwardFlat(
      purchases, signups, "user_id", "ts", "ts", Seq("signup_time"))
    assert(native.count() === purchases.count())
    assert(native.except(composed).count() === 0)
    assert(composed.except(native).count() === 0)
  }

  test("native as-of join edge semantics: no-prior-right, null keys, equal times") {
    val left = Seq(
      (1L, 10L, "2024-01-01 10:00:00"),   // before any right -> null
      (2L, 10L, "2024-01-01 12:00:00"),   // after r1 -> A
      (3L, 10L, "2024-01-01 13:00:00"),   // equal time of r2 -> B (<= matches)
      (4L, 20L, "2024-01-01 12:00:00"),   // other key, no rights -> null
      (5L, -1L, "2024-01-01 12:00:00"))
      .toDF("id", "k", "t_str")
      .withColumn("t", col("t_str").cast("timestamp"))
      .withColumn("k", when(col("k") < 0, lit(null)).otherwise(col("k")))
    val right = Seq(
      (10L, "2024-01-01 11:00:00", "A"),
      (10L, "2024-01-01 13:00:00", "B"),
      (30L, "2024-01-01 09:00:00", "C"))
      .toDF("k", "t_str", "v")
      .withColumn("t", col("t_str").cast("timestamp"))
    val out = AsOfJoinNative
      .backwardFlat(left, right, "k", "t", "t", Seq("v"))
      .select("id", "asof_v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> null, 2L -> "A", 3L -> "B", 4L -> null, 5L -> null))
  }

  test("forward as-of join: earliest right at-or-after, shared across lefts") {
    val left = Seq(
      (1L, 10L, "2024-01-01 10:00:00"),  // before r1 -> A (next state)
      (2L, 10L, "2024-01-01 11:00:00"),  // equal to r1 -> A
      (3L, 10L, "2024-01-01 12:30:00"),  // between r1,r2 -> B
      (4L, 10L, "2024-01-01 14:00:00"),  // after all -> null
      (5L, 20L, "2024-01-01 10:00:00"))  // keyless rights -> null
      .toDF("id", "k", "t_str")
      .withColumn("t", col("t_str").cast("timestamp"))
    val right = Seq(
      (10L, "2024-01-01 11:00:00", "A"),
      (10L, "2024-01-01 13:00:00", "B"),
      (30L, "2024-01-01 09:00:00", "C"))
      .toDF("k", "t_str", "v")
      .withColumn("t", col("t_str").cast("timestamp"))
    val out = AsOfJoinNative
      .forwardFlat(left, right, "k", "t", "t", Seq("v"))
      .select("id", "asof_v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "A", 2L -> "A", 3L -> "B", 4L -> null, 5L -> null))
    // cross-check on real data against a join+min_by formulation
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("u2"), col("ts").as("err_ts"),
        col("event_id").as("err_id"))
    val native = AsOfJoinNative.forwardFlat(purchases,
        errors.select(col("u2").as("user_id"), col("err_ts").as("ts"), col("err_id")),
        "user_id", "ts", "ts", Seq("err_id"))
      .select(col("event_id"), col("asof_err_id"))
    val expected = purchases.join(errors,
        col("user_id") === col("u2") && col("err_ts") >= col("ts"), "left")
      .groupBy(col("event_id"))
      .agg(min_by(col("err_id"), struct(col("err_ts"), col("err_id"))).as("asof_err_id"))
    assert(native.except(expected).count() === 0)
    assert(expected.except(native).count() === 0)
  }

  test("nearest as-of picks the closer side, backward on ties") {
    val left = Seq(
      (1L, 10L, "2024-01-01 10:10:00"),  // back A@10:00 (10m) vs fwd B@11:00 (50m) -> A
      (2L, 10L, "2024-01-01 10:50:00"),  // back A (50m) vs fwd B (10m) -> B
      (3L, 10L, "2024-01-01 10:30:00"),  // exact tie 30m/30m -> backward A
      (4L, 10L, "2024-01-01 09:00:00"),  // nothing before -> forward A
      (5L, 10L, "2024-01-01 12:00:00"))  // nothing after -> backward B
      .toDF("id", "k", "t_str")
      .withColumn("t", col("t_str").cast("timestamp"))
    val right = Seq(
      (10L, "2024-01-01 10:00:00", "A"),
      (10L, "2024-01-01 11:00:00", "B"))
      .toDF("k", "t_str", "v")
      .withColumn("t", col("t_str").cast("timestamp"))
    val out = AsOfJoinNative.nearestFlat(left, right, "k", "t", "t", Seq("v"))
      .select("id", "asof_v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "A", 2L -> "B", 3L -> "A", 4L -> "A", 5L -> "B"))
  }

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // a fresh session catalog can leave orphan locations behind
    val loc = new java.io.File(s"spark-warehouse/$name")
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
  }

  test("bucketed inputs let the native as-of join skip both exchanges") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import graft.sink.BucketedTables
    dropTable("asof_purchases_b"); dropTable("asof_signups_b")
    val ev = Tables.events(spark, sf)
    BucketedTables.writeBucketed(
      ev.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts"),
      "asof_purchases_b", Seq("user_id"), buckets = 4)
    BucketedTables.writeBucketed(
      ev.filter(col("event_type") === "signup").select("user_id", "ts")
        .withColumn("st", date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")),
      "asof_signups_b", Seq("user_id"), buckets = 4)
    val joined = AsOfJoinNative.backwardFlat(
      spark.table("asof_purchases_b"), spark.table("asof_signups_b"),
      "user_id", "ts", "ts", Seq("st"))
    val shuffles = joined.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty,
      "bucketed co-clustered inputs must satisfy the as-of distribution without exchanges")
    // and it still computes the right thing
    val unbucketed = AsOfJoinNative.backwardFlat(
      ev.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts"),
      ev.filter(col("event_type") === "signup").select("user_id", "ts")
        .withColumn("st", date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")),
      "user_id", "ts", "ts", Seq("st"))
    assert(joined.except(unbucketed).count() === 0)
  }

  test("native exec plans as a co-partitioned merge (no window, no union)") {
    val ev = Tables.events(spark, sf)
    val l = ev.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts")
    val r = ev.filter(col("event_type") === "signup").select("user_id", "ts")
      .withColumn("st", date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
    val df = AsOfJoinNative.backwardFlat(l, r, "user_id", "ts", "ts", Seq("st"))
    // sparkPlan: the AQE wrapper hides its input plan from traversal
    val plan = df.queryExecution.sparkPlan
    assert(plan.exists(_.isInstanceOf[AsOfJoinExec]))
    val s = plan.toString
    assert(!s.contains("WindowExec") && !s.contains("Union"))
  }
}
