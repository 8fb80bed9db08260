package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan contract for the EWMA gate report (kept next to the probe
  * history: r9 shipped an eager-checkpoint shape that cost 2.5× more
  * than the duplicate scans it removed; the r10 arbitration landed on
  * aggregate-once → local-relation re-plant). */
class EwmaAuditPlanSpec extends AnyFunSuite {
  import TestSession._

  test("ewma audit frame never rescans the raw table: one scan, then LocalTableScan") {
    val df = graft.ops.EwmaScan.auditMaxima(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(p).isEmpty,
      "audit branches re-scan the raw orders table; the daily panel re-plant is broken")
    assert(p.contains("LocalTableScan"),
      "expected the calendar-bounded daily panel as a local relation")
  }
}
