package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.BloomJoin
import graft.sources.Tables

/** Bloom-filter semi-join pruning: exactness under false positives,
  * zero false negatives, and the pruning effect itself. */
class BloomJoinSpec extends AnyFunSuite {
  import TestSession._

  private def hotOrders = Tables.orders(spark, sf)
    .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 150000)
    .select(col("o_orderkey"))

  test("bloom-pruned join is exactly the plain join (fpp removed by the exact join)") {
    val pruned = SparkEntry.queries("q_bloom_prune_revenue")(spark, sf)
    val plain = Tables.lineitem(spark, sf)
      .join(hotOrders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
      .agg(sum(col("l_extendedprice")).as("chk"), count(lit(1)).as("line_count"))
    assert(pruned.count() === plain.count())
    val a = pruned.select("ship_month", "line_count")
    val b = plain.select("ship_month", "line_count")
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("prune keeps every matching row (no false negatives) and actually prunes") {
    val li = Tables.lineitem(spark, sf)
    val total = li.count()
    val matching = li.join(hotOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
    val nMatch = matching.count()
    val pruned = BloomJoin.prune(li, col("l_orderkey"), hotOrders, col("o_orderkey"))
    val nPruned = pruned.count()
    // no false negatives: every truly-matching row survives the probe
    assert(matching.exceptAll(pruned).count() === 0,
      "bloom pre-filter dropped a matching row")
    // real pruning: survivors are matches + fpp leakage, far below total
    assert(nPruned >= nMatch && nPruned < total)
    val leakage = (nPruned - nMatch).toDouble / math.max(total - nMatch, 1L)
    assert(leakage <= 0.05, f"fp leakage $leakage%.4f exceeds 5x the 1%% fpp")
  }
}
