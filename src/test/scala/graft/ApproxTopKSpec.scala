package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.ApproxTopK.approxTopK
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables
import graft.text.TextAnalysis

class ApproxTopKSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("exact regime: capacity >= distinct => identical to exact top-k") {
    val toks = Tables.documents(spark, sf)
      .select(explode(TextAnalysis.tokensCol(col("text"))).as("token"))
    val sketch = toks.agg(approxTopK(col("token"), 10, 1000).as("top")).select(explode(col("top")).as("e"))
      .select(col("e.item"), col("e.count_est"), col("e.count_err")).collect()
    val exact = toks.groupBy("token").count()
      .orderBy(col("count").desc, col("token").asc).limit(10).collect()
    assert(sketch.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      exact.map(r => (r.getString(0), r.getLong(1))).toSeq)
    assert(sketch.forall(_.getLong(2) === 0L))  // no error in exact regime
  }

  test("approx regime: tight capacity still surfaces the true heavy hitter") {
    // skewed stream: 'hot' dominates, many cold singletons force evictions
    val rows = (Seq.fill(500)("hot") ++ (1 to 400).map(i => s"cold_$i")).toDF("v")
    val top = rows.repartition(8)
      .agg(approxTopK(col("v"), 1, 16).as("t"))
      .select(explode(col("t")).as("e")).select("e.item", "e.count_est").first()
    assert(top.getString(0) === "hot")
    assert(top.getLong(1) >= 500)  // SpaceSaving never underestimates
  }

  test("partials: persisted split partials merge to the direct top-k (exact regime)") {
    import org.apache.spark.sql.graftext.ApproxTopK.{approxTopKMerge, approxTopKPartial}
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(TextAnalysis.tokensCol(col("text"))).as("token"))
    // partial per arbitrary segment (doc_id % 5) — the persisted
    // sketch-table shape — then merged at query time
    val partials = toks
      .groupBy(pmod(col("doc_id"), lit(5)).as("seg"))
      .agg(approxTopKPartial(col("token"), 1000).as("sk"))
    val viaPartials = partials
      .agg(approxTopKMerge(col("sk"), 10, 1000).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.item"), col("e.count_est"), col("e.count_err")).collect()
    val direct = toks.agg(approxTopK(col("token"), 10, 1000).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.item"), col("e.count_est"), col("e.count_err")).collect()
    assert(viaPartials.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      direct.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
    assert(viaPartials.forall(_.getLong(2) === 0L))
  }

  test("rolling top products: exact-mode parity with the true windowed top-k") {
    val got = graft.ops.SketchRollup.rollingTopProducts(
      Tables.events(spark, sf)).cache()
    val items = Tables.events(spark, sf).select(
      to_date(col("ts")).as("d"),
      get_json_object(col("props"), "$.k").as("item"))
      .filter(col("item").isNotNull)
    val days = items.select(col("d").as("event_date")).distinct()
    val win = days.join(items,
        datediff(col("event_date"), col("d")).between(0, 6))
      .groupBy(col("event_date"), col("item")).agg(count(lit(1)).as("n"))
    val exact = graft.ops.TopK.perGroup(win, groupKeys = Seq("event_date"),
        order = Seq(col("n").desc, col("item").asc), k = 5)
      .select(col("event_date"), col("rank"), col("item"), col("n"))
    val j = got.join(exact, Seq("event_date", "rank"))
    assert(got.count() === exact.count())
    assert(j.filter(got("item") =!= exact("item") or
      col("count_est") =!= col("n")).count() === 0)
    assert(got.filter(col("count_err") =!= 0).count() === 0)
  }

  test("per-group sketches merge across partitions deterministically") {
    val docs = Tables.documents(spark, sf)
    val toks = docs.select(col("lang"), explode(TextAnalysis.tokensCol(col("text"))).as("token"))
    def run(parts: Int) = toks.repartition(parts)
      .groupBy("lang").agg(approxTopK(col("token"), 5, 500).as("top"))
      .select(col("lang"), to_json(col("top")).as("j"))
    assert(run(2).except(run(13)).count() === 0)
  }
}
