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

  test("per-group sketches merge across partitions deterministically") {
    val docs = Tables.documents(spark, sf)
    val toks = docs.select(col("lang"), explode(TextAnalysis.tokensCol(col("text"))).as("token"))
    def run(parts: Int) = toks.repartition(parts)
      .groupBy("lang").agg(approxTopK(col("token"), 5, 500).as("top"))
      .select(col("lang"), to_json(col("top")).as("j"))
    assert(run(2).except(run(13)).count() === 0)
  }
}
