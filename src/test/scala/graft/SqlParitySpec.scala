package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.marts.{RfmSegments, SilverEvents, SqlParity}

/** E2 parity: the reference dbt model TEXT must reproduce the
  * DataFrame mart bit-for-bit (the oracle harness pins both against
  * the same DuckDB result; this spec pins them against each other
  * without DuckDB, inside `sbt test`). The RFM model is the one that
  * was excluded until r10 — its literal NTILE-over-everything is the
  * single-partition wart, demonstrated here and answered by the
  * GlobalRank engine path. */
class SqlParitySpec extends AnyFunSuite {
  import TestSession._

  test("RFM model text reproduces the GlobalRank mart row-for-row") {
    val silver = SilverEvents.build(graft.sources.Tables.events(spark, sf))
      .localCheckpoint()
    val sqlRows = SqlParity.sqlGoldUserRfmSegments(spark, silver)
      .collect().map(_.toString).sorted
    val martRows = RfmSegments.build(silver)
      .collect().map(_.toString).sorted
    assert(sqlRows.length === martRows.length)
    assert(sqlRows.sameElements(martRows),
      sqlRows.zip(martRows).find { case (a, b) => a != b }.toString)
  }

  test("the literal RFM text carries the single-partition wart; the mart does not") {
    val silver = SilverEvents.build(graft.sources.Tables.events(spark, sf))
      .localCheckpoint()
    val sqlPlan = SqlParity.sqlGoldUserRfmSegments(spark, silver)
      .queryExecution.executedPlan.toString
    assert(sqlPlan.contains("SinglePartition"),
      "the parity exhibit should demonstrate the reference's wart")
    assert(!RfmSegments.build(silver)
      .queryExecution.executedPlan.toString.contains("SinglePartition"),
      "the engine path must stay distributed-exact")
  }
}
