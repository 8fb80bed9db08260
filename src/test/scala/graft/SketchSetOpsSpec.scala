package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.graftext.{KllQuantiles, ThetaSketch}
import graft.ops.SketchRollup
import graft.sources.Tables

/** Theta set-algebra + KLL quantile partials: the sketch-table
  * contracts — deterministic canonical bytes (theta), set-algebra
  * consistency in exact mode, and rank-error bounds that survive
  * partial merge (KLL). */
class SketchSetOpsSpec extends AnyFunSuite {
  import TestSession._

  test("theta: split-merge is byte-identical to the direct sketch") {
    val base = Tables.events(spark, sf).filter(col("user_id").isNotNull)
    val whole = base
      .agg(ThetaSketch.thetaSketchAgg(col("user_id").cast("string")).as("sk"))
      .head().getAs[Array[Byte]](0)
    // partial merge over an arbitrary split must reproduce the exact
    // same canonical ordered-compact serialization — theta state is a
    // pure function of the input SET (k smallest hashes, min theta)
    val halves = base
      .withColumn("half", pmod(col("event_id"), lit(2)))
      .groupBy(col("half"))
      .agg(ThetaSketch.thetaSketchAgg(col("user_id").cast("string")).as("sk"))
      .agg(ThetaSketch.thetaUnionAgg(col("sk")).as("sk"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(whole, halves),
      "theta split-merge must be byte-stable under partitioning")
  }

  test("theta: exact-mode estimates and set algebra match exact distincts") {
    val base = Tables.events(spark, sf).filter(col("user_id").isNotNull)
    val overlap = SketchRollup.audienceOverlap(Tables.events(spark, sf))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val pairs = base.select(col("event_type").as("ta"), col("user_id"))
      .distinct().as("a")
      .join(base.select(col("event_type").as("tb"), col("user_id")).distinct().as("b"),
        Seq("user_id"))
      .filter(col("ta") < col("tb"))
      .groupBy(col("ta"), col("tb"))
      .agg(count(lit(1)).as("n_both"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val sizes = base.select(col("event_type"), col("user_id")).distinct()
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(overlap.nonEmpty)
    overlap.foreach { case ((ta, tb), (both, either, onlyA)) =>
      val exBoth = pairs.getOrElse((ta, tb), 0L)
      val exEither = sizes(ta) + sizes(tb) - exBoth
      // sf0.001 cardinalities sit far below nominal k=4096: sketches
      // are in exact mode, so the algebra must be EXACT, not close
      assert(both === exBoth, s"($ta,$tb) both")
      assert(either === exEither, s"($ta,$tb) either")
      assert(onlyA === sizes(ta) - exBoth, s"($ta,$tb) only_a")
    }
  }

  test("theta: estimation mode — estimates merge-order-invariant within RSE, bytes not pinned") {
    import spark.implicits._
    // push the sketch past nominal k=4096 into estimation mode: here
    // the union's theta / retained set CAN depend on merge order, so
    // the byte-stability contract is scoped to exact mode (see
    // ThetaSketch scaladoc); what must survive any grouping is the
    // ESTIMATE, within the RSE budget (1/sqrt(4096) ~ 1.6 %)
    val n = 20000
    val ids = (1 to n).map(i => s"user_$i").toDF("id")
    def mergedVia(splitK: Int): Array[Byte] = ids
      .withColumn("g", pmod(xxhash64(col("id")), lit(splitK)))
      .groupBy(col("g"))
      .agg(ThetaSketch.thetaSketchAgg(col("id")).as("sk"))
      .agg(ThetaSketch.thetaUnionAgg(col("sk")).as("sk"))
      .head().getAs[Array[Byte]](0)
    val whole = ids
      .agg(ThetaSketch.thetaSketchAgg(col("id")).as("sk"))
      .head().getAs[Array[Byte]](0)
    def est(sk: Array[Byte]): Double = ids.limit(1)
      .select(ThetaSketch.thetaEstimate(lit(sk)).as("e")).head().getDouble(0)
    val ests = Seq(whole, mergedVia(2), mergedVia(7)).map(est)
    ests.foreach(e =>
      assert(math.abs(e - n) / n <= 0.05, s"estimate $e outside RSE budget of $n"))
    // document the actual behavior: estimates from different merge
    // orders agree with each other within twice the single-sketch RSE
    assert(math.abs(ests(1) - ests(2)) / n <= 0.05,
      s"merge-order estimates diverged: ${ests(1)} vs ${ests(2)}")
  }

  test("kll: merged rolling quantiles stay within the rank-error bound") {
    val orders = Tables.orders(spark, sf)
    val got = SketchRollup.rollingOrderValueQuantiles(orders).cache()
    val days = orders.select(col("o_orderdate")).distinct().count()
    assert(got.count() === days)
    // exact normalized rank of each estimate within its trailing
    // window; the KLL k=200 bound (1.65 %) + discreteness slack
    val vals = orders.select(col("o_orderdate").as("d"),
      col("o_totalprice").cast("double").as("v"))
    val win = got.select(col("order_date"), col("p50"), col("p90"), col("p99"))
      .join(vals, datediff(col("order_date"), col("d")).between(0, 6))
      .groupBy(col("order_date"), col("p50"), col("p90"), col("p99"))
      .agg(
        (sum(when(col("v") <= col("p50"), 1).otherwise(0)) / count(lit(1))).as("r50"),
        (sum(when(col("v") < col("p50"), 1).otherwise(0)) / count(lit(1))).as("s50"),
        (sum(when(col("v") <= col("p90"), 1).otherwise(0)) / count(lit(1))).as("r90"),
        (sum(when(col("v") < col("p90"), 1).otherwise(0)) / count(lit(1))).as("s90"),
        (sum(when(col("v") <= col("p99"), 1).otherwise(0)) / count(lit(1))).as("r99"),
        max(when(col("v") === col("p50"), 1).otherwise(0)).as("m50"),
        max(when(col("v") === col("p90"), 1).otherwise(0)).as("m90"),
        max(when(col("v") === col("p99"), 1).otherwise(0)).as("m99"))
    // same two-sided strict/inclusive rank envelope + value-membership
    // gate the DuckDB oracle applies (see rollingOrderValueQuantilesSql)
    val bad = win.filter(
      col("m50") === 0 or col("m90") === 0 or col("m99") === 0 or
      col("r50") < 0.45 or col("s50") > 0.55 or
      col("r90") < 0.85 or col("s90") > 0.95 or
      col("r99") < 0.94)
    assert(bad.count() === 0, "rolling quantile outside rank-error bound")
    // monotonicity of the quantile triple
    assert(got.filter(col("p50") > col("p90") or col("p90") > col("p99")).count() === 0)
  }

  test("kll: KS delta separates disjoint distributions, vanishes on identical ones") {
    import spark.implicits._
    // two halves of the SAME distribution → KS ≈ 0 (within rank error);
    // disjoint supports → KS = 1 exactly
    val vals = (1 to 4000).map(_.toDouble).toDF("v")
    val sketches = vals
      .withColumn("grp", pmod(col("v").cast("long"), lit(2)))
      .groupBy(col("grp"))
      .agg(KllQuantiles.kllDoublesAgg(col("v")).as("sk"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val same = vals.limit(1).select(
      KllQuantiles.kllKsDelta(
        lit(sketches(0L)), lit(sketches(1L))).as("ks")).head().getDouble(0)
    assert(same <= 0.05, s"identical distributions drifted: $same")
    val shifted = (1 to 4000).map(_ + 1e6).toDF("v")
      .agg(KllQuantiles.kllDoublesAgg(col("v")).as("sk"))
      .head().getAs[Array[Byte]](0)
    val far = vals.limit(1).select(
      KllQuantiles.kllKsDelta(lit(sketches(0L)), lit(shifted)).as("ks"))
      .head().getDouble(0)
    // inclusive-CDF split-point evaluation leaves a 1/n sliver at the
    // boundary, so disjoint supports read 1 − 1/n rather than exactly 1
    assert(far >= 0.99, s"disjoint supports must give KS ≈ 1, got $far")
    // the drift query surface: C(|sources|, 2) rows, deltas in [0, 1]
    val drift = SketchRollup.sourceLengthDrift(
      Tables.documents(spark, sf)).cache()
    val nSrc = Tables.documents(spark, sf).select("source").distinct().count()
    assert(drift.count() === nSrc * (nSrc - 1) / 2)
    assert(drift.filter(col("ks_delta") < 0 or col("ks_delta") > 1).count() === 0)
  }

  test("kll: split-merge estimate stays within bound of the exact quantile") {
    val orders = Tables.orders(spark, sf)
    val n = orders.count()
    val est = orders
      .withColumn("half", pmod(col("o_orderkey"), lit(2)))
      .groupBy(col("half"))
      .agg(KllQuantiles.kllDoublesAgg(col("o_totalprice").cast("double")).as("sk"))
      .agg(KllQuantiles.kllQuantile(
        KllQuantiles.kllMergeAgg(col("sk")), lit(0.5)).as("p50"))
      .head().getDouble(0)
    val rank = orders.filter(col("o_totalprice").cast("double") <= est).count().toDouble / n
    assert(math.abs(rank - 0.5) <= 0.05, s"split-merge p50 rank drifted: $rank")
  }
}
