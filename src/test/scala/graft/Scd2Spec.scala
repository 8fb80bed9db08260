package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.marts.Scd2

/** SCD2 invariants: intervals per user are contiguous, non-overlapping,
  * versions dense from 1, exactly one open (is_current) row per user,
  * and adjacent versions always change the tracked attribute. */
class Scd2Spec extends AnyFunSuite {
  import TestSession._

  lazy val hist = Scd2.userStageHistory(spark, sf).cache()

  test("exactly one current row per user; versions dense from 1") {
    val perUser = hist.groupBy("user_id").agg(
      sum(when(col("is_current"), 1).otherwise(0)).as("open_rows"),
      min("version").as("v_min"), max("version").as("v_max"),
      count(lit(1)).as("n"))
    assert(perUser.filter(col("open_rows") =!= 1).isEmpty)
    assert(perUser.filter(col("v_min") =!= 1 || col("v_max") =!= col("n")).isEmpty)
  }

  test("intervals chain: valid_to of version v equals valid_from of v+1") {
    val a = hist.select(col("user_id"), col("version"), col("valid_to"))
    val b = hist.select(col("user_id"), (col("version") - 1).as("version"),
      col("valid_from").as("next_from"))
    val joined = a.join(b, Seq("user_id", "version"))
    assert(joined.filter(col("valid_to") =!= col("next_from")).isEmpty)
    // only the last version is open-ended
    assert(hist.filter(col("valid_to").isNull && !col("is_current")).isEmpty)
  }

  test("adjacent versions always change the stage") {
    val a = hist.select(col("user_id"), col("version"), col("stage"))
    val b = hist.select(col("user_id"), (col("version") - 1).as("version"),
      col("stage").as("next_stage"))
    assert(a.join(b, Seq("user_id", "version"))
      .filter(col("stage") === col("next_stage")).isEmpty)
  }
}
