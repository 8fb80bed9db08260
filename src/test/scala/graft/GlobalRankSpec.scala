package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.marts.RfmSegments
import graft.ops.GlobalRank

/** Distributed exact ranking (GlobalRank) and its RFM consumers. */
class GlobalRankSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def randomFrame(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    // deliberately tie-heavy values to exercise boundary splitting
    (1 to n).map(i => (i.toLong, rnd.nextInt(7), rnd.nextInt(40) / 10.0))
      .toDF("id", "v", "w").repartition(5)
  }

  test("withGlobalRowNumber matches window row_number on a total order") {
    for ((n, seed) <- Seq((1, 1), (4, 2), (97, 3), (1000, 4))) {
      val df = randomFrame(n, seed)
      val order = Seq(col("v").asc, col("w").desc, col("id").asc)
      val got = GlobalRank.withGlobalRowNumber(df, order, "rn", "n_total")
      val exp = df.withColumn("rn_w", row_number().over(
        Window.orderBy(order: _*)))
      assert(got.filter(col("n_total") =!= n).count() === 0)
      val joined = got.join(exp, Seq("id", "v", "w"))
      assert(joined.filter(col("rn") =!= col("rn_w")).count() === 0, s"n=$n")
    }
  }

  test("withNtile matches window ntile incl. n<k and tie groups") {
    for ((n, k) <- Seq((3, 5), (5, 5), (23, 5), (1000, 5), (41, 7))) {
      val df = randomFrame(n, n + k)
      val order = Seq(col("v").asc, col("id").asc)
      val got = GlobalRank.withNtile(df, order, k, "b")
      val exp = df.withColumn("b_w", ntile(k).over(Window.orderBy(order: _*)))
      val joined = got.join(exp, Seq("id", "v", "w"))
      assert(joined.filter(col("b") =!= col("b_w")).count() === 0, s"n=$n k=$k")
    }
  }

  test("RFM plan is free of single-partition windows") {
    import org.apache.spark.sql.execution.window.WindowExec
    val silver = SparkEntry.queries("silver_events")(spark, sf)
    val plan = RfmSegments.build(silver).queryExecution.sparkPlan
    // silver's dedup window is partitioned (fine at scale); what must
    // never appear is a window with an EMPTY partition spec
    val unpartitioned = plan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.isEmpty, "RFM must not plan an unpartitioned window")
  }

  test("both RFM paths tolerate an empty silver frame") {
    val empty = SparkEntry.queries("silver_events")(spark, sf).filter(lit(false))
    assert(RfmSegments.build(empty).count() === 0)
    assert(RfmSegments.buildAtScale(empty).count() === 0)
  }

  test("buildAtScale agrees with exact ntile scoring away from boundaries") {
    val silver = SparkEntry.queries("silver_events")(spark, sf)
    val exact = RfmSegments.build(silver).cache()
    val approx = RfmSegments.buildAtScale(silver).cache()
    assert(exact.count() === approx.count())
    val j = exact.as("e").join(approx.as("a"), Seq("user_id")).cache()
    // Cutoff scoring differs from ntile only inside metric tie groups
    // straddling quintile boundaries (ntile splits ties by user_id; the
    // cutoff keeps tied values together). So per dimension: drift is
    // bounded by the widest tie-group's ntile span (+1 for the rank
    // convention at cut points), and scores stay monotone in the metric.
    for ((s, m, asc) <- Seq(("r_score", "recency_days", false),
                            ("f_score", "frequency", true),
                            ("m_score", "monetary", true))) {
      val span = exact.groupBy(col(m))
        .agg((max(col(s)) - min(col(s))).as("span"))
        .agg(max(col("span"))).head().getInt(0)
      val maxDrift = j.select(max(abs(col(s"e.$s") - col(s"a.$s")))).head().getInt(0)
      assert(maxDrift <= span + 1, s"$s drift $maxDrift exceeds tie span $span + 1")
      // monotone: a better metric can never get a lower score
      val pairs = approx.as("x").join(approx.as("y"),
        if (asc) col(s"x.$m") < col(s"y.$m") else col(s"x.$m") > col(s"y.$m"))
      assert(pairs.filter(col(s"x.$s") > col(s"y.$s")).count() === 0,
        s"$s not monotone in $m")
    }
  }
}
