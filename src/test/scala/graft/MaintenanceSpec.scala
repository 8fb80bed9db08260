package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sink.Compaction
import graft.marts.ArrayFunQueries
import graft.sources.Tables

class MaintenanceSpec extends AnyFunSuite {
  import TestSession._

  test("compaction reduces per-partition file counts and preserves content exactly") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact_spec_").toString
    val silver = graft.marts.SilverEvents.build(Tables.events(spark, sf))
    silver.repartition(8, col("event_date"), col("event_unique_id"))
      .write.mode("overwrite").partitionBy("event_date").parquet(s"$base/frag")

    val before = Compaction.fileStats(spark, s"$base/frag", "event_date").collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    Compaction.compact(spark, s"$base/frag", s"$base/out", "event_date", Seq("event_time_str"))
    val after = Compaction.fileStats(spark, s"$base/out", "event_date").collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap

    assert(before.keySet === after.keySet)
    assert(before.values.forall(_ > 1), "fixture should be fragmented")
    assert(after.values.forall(_ === 1L), "every partition should compact to one file")

    // content identical (same multiset of silver rows)
    val a = spark.read.parquet(s"$base/frag").select("event_unique_id")
    val b = spark.read.parquet(s"$base/out").select("event_unique_id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("array query folds agree with a row-wise recomputation") {
    val out = ArrayFunQueries.orderLineArrays(spark, sf)
    val byHand = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity").cast("int").as("qty"))
      .groupBy("l_orderkey")
      .agg(count(lit(1)).cast("int").as("n_lines"),
        min("qty").as("min_qty"), max("qty").as("max_qty"),
        sum((col("qty") * col("qty")).cast("long")).as("sum_sq"),
        sum(when(col("qty") > 30, 1).otherwise(0)).cast("int").as("big_lines"))
    val joined = out.alias("o").join(byHand.alias("h"), Seq("l_orderkey"))
    assert(joined.filter(
      col("o.n_lines") =!= col("h.n_lines") ||
      col("o.min_qty") =!= col("h.min_qty") ||
      col("o.max_qty") =!= col("h.max_qty") ||
      col("o.sum_sq") =!= col("h.sum_sq") ||
      col("o.big_lines") =!= col("h.big_lines")).isEmpty)
    // weighted sum of the sorted vector is bounded by n*max*n
    assert(out.filter(col("weighted_sum") >
      col("n_lines").cast("long") * col("n_lines") * col("max_qty")).isEmpty)
  }

  test("map functions: linenumber->qty map round-trips positional lookups") {
    // line numbers repeat in the fixture — pre-aggregate so map keys are unique
    val perLine = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(min(col("l_quantity").cast("int")).as("qty"))
    val m = perLine
      .groupBy(col("l_orderkey"))
      .agg(map_from_entries(array_sort(collect_list(
        struct(col("l_linenumber"), col("qty"))))).as("qmap"))
      .select(col("l_orderkey"),
        element_at(col("qmap"), lit(1)).as("first_qty"),
        size(map_keys(col("qmap"))).as("n_keys"))
    val direct = perLine.filter(col("l_linenumber") === 1)
      .select(col("l_orderkey"), col("qty").as("first_qty_direct"))
    val j = m.join(direct, Seq("l_orderkey"))
    assert(j.filter(col("first_qty") =!= col("first_qty_direct")).isEmpty)
    assert(m.filter(col("n_keys") <= 0).isEmpty)
  }
}
