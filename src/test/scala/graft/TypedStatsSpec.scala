package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.marts.{HourlyTraffic, SilverEvents, StatsMoments, TypedTraffic}
import graft.sources.Tables

class TypedStatsSpec extends AnyFunSuite {
  import TestSession._

  test("typed Dataset mart reproduces the relational mart byte-for-byte") {
    // SparkEntry's shared silver is this same plan, already cached
    val silver = SparkEntry.queries("silver_events")(spark, sf)
    val rel = HourlyTraffic.build(silver)
    val typed = TypedTraffic.build(TypedTraffic.asSilver(silver))
    assert(typed.schema.fields.map(f => f.name -> f.dataType).toMap ===
      rel.schema.fields.map(f => f.name -> f.dataType).toMap)
    val cols = rel.columns.sorted.map(col)
    assert(rel.select(cols: _*).exceptAll(typed.select(cols: _*)).count() === 0)
    assert(typed.select(cols: _*).exceptAll(rel.select(cols: _*)).count() === 0)
  }

  test("decimal-factored moments agree with Spark's streaming corr/stddev") {
    val li = Tables.lineitem(spark, sf)
    val ours = StatsMoments.moments(li).cache()
    val ref = li.groupBy("l_returnflag").agg(
      corr(col("l_quantity"), col("l_extendedprice")).as("c"),
      stddev_pop(col("l_quantity")).as("s"),
      covar_pop(col("l_quantity"), col("l_extendedprice")).as("cv"))
    val j = ours.join(ref, "l_returnflag").cache()
    assert(j.count() === 3)
    assert(j.filter(abs(col("corr_qty_price") - col("c")) > 1e-6).count() === 0)
    assert(j.filter(abs(col("stddev_pop_qty") - col("s")) > 1e-4).count() === 0)
    // covar magnitudes are large — compare relatively (the 4-dp output
    // rounding alone contributes up to 5e-5 absolute)
    assert(j.filter(abs(col("covar_pop_qty_price") - col("cv")) / abs(col("cv")) > 1e-6)
      .count() === 0)
    assert(ours.filter(abs(col("corr_qty_price")) > 1.0).count() === 0)
  }
}
