package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Salted
import graft.sink.BucketedTables
import graft.sources.Tables

/** Scale-architecture operators: bucketed co-located joins (no
  * exchange), salted aggregation (skew path ≡ direct path). */
class ScaleOpsSpec extends AnyFunSuite {
  import TestSession._

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // a fresh session catalog can leave orphan locations behind
    val loc = new java.io.File(s"spark-warehouse/$name")
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
  }

  test("bucketed tables join without any shuffle exchange") {
    dropTable("b_lineitem"); dropTable("b_orders")
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    BucketedTables.writeBucketed(li, "b_lineitem", Seq("l_orderkey"), 8)
    BucketedTables.writeBucketed(o, "b_orders", Seq("l_orderkey"), 8)

    // disable broadcast so the planner must consider the shuffle it
    // would otherwise need — bucketing should elide it entirely
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedTables.colocatedJoin(spark, "b_lineitem", "b_orders", Seq("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"expected no shuffle, got:\n$plan")
      // correctness: same result as the plain join
      val expected = li.join(o, "l_orderkey")
      assert(joined.count() === expected.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted aggregation equals direct aggregation") {
    val ev = Tables.events(spark, sf)
    val salted = Salted.countSum(ev, Seq("event_type"), col("event_id"), col("value"))
    val direct = ev.groupBy("event_type")
      .agg(count(lit(1)).as("row_count"), sum(col("value")).as("value_sum"))
    // counts identical; sums compared rounded (double add order differs
    // by design — that is what the salting changes)
    val j = salted.join(direct.withColumnRenamed("row_count", "rc2")
        .withColumnRenamed("value_sum", "vs2"), "event_type")
    assert(j.filter(col("row_count") =!= col("rc2")).count() === 0)
    assert(j.filter(abs(col("value_sum") - col("vs2")) > 1e-6).count() === 0)
  }
}
