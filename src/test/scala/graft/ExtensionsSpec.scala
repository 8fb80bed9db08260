package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.{CosineSimilarity, GraftExtensions}
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.EmbeddingSim
import graft.sources.Tables

/** Native expression + SparkSessionExtensions coverage. */
class ExtensionsSpec extends AnyFunSuite {
  import TestSession._

  test("native cosine_sim matches the higher-order-function cosine bitwise") {
    val e = Tables.embeddings(spark, sf).limit(50)
    val pairs = e.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("b_id"), col("embedding").as("b")))
      .filter(col("a_id") < col("b_id")).limit(200)
    val cmp = pairs.select(
      CosineSimilarity.cosineSim(col("a"), col("b")).as("native"),
      EmbeddingSim.cosine(col("a"), col("b")).as("hof"))
    assert(cmp.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("native cosine_sim: self-similarity 1.0, zero-vector guard") {
    import spark.implicits._
    val v = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
                (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 2.0f, 3.0f)))
      .toDF("a", "b")
      .select(round(CosineSimilarity.cosineSim(col("a"), col("b")), 9).as("c"))
      .collect().map(_.getDouble(0))
    assert(v(0) === 1.0)
    assert(v(1) === 0.0)
  }

  test("extensions: cosine_sim callable from SQL; approx-distinct rewrite fires") {
    // force the shared test session to exist, then step aside so
    // getOrCreate actually builds a NEW session with the extensions
    // (it silently reuses an active/default session otherwise)
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import s2.implicits._
      // SQL function registration
      val r = s2.sql("SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").first().getDouble(0)
      assert(math.abs(r - 1.0) < 1e-12)

      // rewrite off (default): exact distinct
      val df = Seq.tabulate(1000)(i => i % 37).toDF("x")
      assert(df.agg(count_distinct(col("x"))).first().getLong(0) === 37L)

      // rewrite on: plan rewrites COUNT(DISTINCT) → approx sketch
      s2.conf.set("spark.graft.approxDistinct", "true")
      val agg = df.agg(count_distinct(col("x")).as("d"))
      val optimized = agg.queryExecution.optimizedPlan.toString
      assert(optimized.contains("approx_count_distinct"), optimized)
      val approx = agg.first().getLong(0)
      assert(approx > 30 && approx < 45)  // 5% rsd around 37
      s2.conf.set("spark.graft.approxDistinct", "false")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
