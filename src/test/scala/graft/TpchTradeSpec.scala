package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.marts.TpchTradeQueries
import graft.sources.Tables

/** Invariants for the Q7/Q8/Q14/Q19-shaped trade queries (the DuckDB
  * hash oracle is the exact check; these pin the semantic shape). */
class TpchTradeSpec extends AnyFunSuite {
  import TestSession._

  test("volume shipping only reports the two requested nations, never same-nation pairs") {
    val rows = TpchTradeQueries.volumeShipping(spark, sf).collect()
    val pair = Set("NATION_1", "NATION_2")
    assert(rows.forall(r => pair(r.getString(0)) && pair(r.getString(1))))
    assert(rows.forall(r => r.getString(0) != r.getString(1)))
    // revenue strictly positive and years inside the data range
    assert(rows.forall(r => r.getDouble(3) > 0))
    assert(rows.forall(r => (1995 to 2001).contains(r.getInt(2))))
  }

  test("market share is a fraction of its own total and NATION share sums to <= total") {
    val rows = TpchTradeQueries.marketShare(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val total = r.getAs[Double]("total_revenue")
      val nat = r.getAs[Double]("nation_revenue")
      val share = r.getAs[Double]("mkt_share")
      assert(nat >= 0 && nat <= total + 0.01)
      assert(share >= 0.0 && share <= 1.0)
      assert(math.abs(share - nat / total) < 1e-4)
    }
  }

  test("promo share: every month's promo revenue is bounded by total; pct consistent") {
    val rows = TpchTradeQueries.promoRevenue(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val total = r.getAs[Double]("total_revenue")
      val promo = r.getAs[Double]("promo_revenue")
      assert(promo >= 0 && promo <= total + 0.01)
      assert(math.abs(r.getAs[Double]("promo_pct") - 100.0 * promo / total) < 1e-3)
    }
    // months contiguous coverage: every lineitem ship month appears
    val distinctMonths = Tables.lineitem(spark, sf)
      .select(date_format(col("l_shipdate"), "yyyy-MM")).distinct().count()
    assert(rows.length === distinctMonths)
  }

  test("disjunctive basket equals the union of its three single-basket runs") {
    import org.apache.spark.sql.DataFrame
    def basket(brand: String, sizeHi: Int, qLo: Int, qHi: Int): DataFrame =
      Tables.lineitem(spark, sf)
        .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
        .filter(col("p_brand") === brand && col("p_size").between(1, sizeHi) &&
          col("l_quantity").between(qLo, qHi))
    val expected = basket("Brand#12", 5, 1, 11)
      .unionByName(basket("Brand#23", 10, 10, 20))
      .unionByName(basket("Brand#34", 15, 20, 30)).count()
    val got = TpchTradeQueries.disjunctiveRevenue(spark, sf).collect()(0)
    assert(got.getAs[Long]("line_count") === expected)
  }
}
