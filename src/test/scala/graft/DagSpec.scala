package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dag
import graft.ops.Dag.Task

/** The orchestration semantics the reference delegates to Airflow
  * (retries, timeout, downstream skip), pinned in-process. */
class DagSpec extends AnyFunSuite {
  import TestSession._

  private def statuses(report: org.apache.spark.sql.DataFrame): Map[String, (String, Int)] =
    report.collect().map(r => r.getString(0) -> ((r.getString(1), r.getInt(2)))).toMap

  test("flaky task retries to success; downstream runs") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val ran = new java.util.concurrent.atomic.AtomicBoolean(false)
    val report = Dag.run(spark, Seq(
      Task("flaky", retries = 2, retryDelayMs = 10L)(() =>
        if (calls.incrementAndGet() < 3) sys.error("transient")),
      Task("downstream", deps = Seq("flaky"))(() => ran.set(true))))
    val s = statuses(report)
    assert(s("flaky") === (("success", 3)))
    assert(s("downstream") === (("success", 1)))
    assert(ran.get())
  }

  test("exhausted retries fail the task; downstream is upstream_failed, siblings run") {
    val sibling = new java.util.concurrent.atomic.AtomicBoolean(false)
    val skipped = new java.util.concurrent.atomic.AtomicBoolean(false)
    val report = Dag.run(spark, Seq(
      Task("doomed", retries = 1, retryDelayMs = 1L)(() => sys.error("always")),
      Task("child", deps = Seq("doomed"))(() => skipped.set(true)),
      Task("sibling")(() => sibling.set(true))))
    val s = statuses(report)
    assert(s("doomed")._1 === "failed")
    assert(s("doomed")._2 === 2) // 1 try + 1 retry
    assert(s("child") === (("upstream_failed", 0)))
    assert(!skipped.get())       // never executed
    assert(s("sibling")._1 === "success") // independent branch unaffected
  }

  test("timeout fails an attempt; grandchild of failure also skips") {
    val report = Dag.run(spark, Seq(
      Task("slow", retries = 0, timeoutMs = 200L)(() => Thread.sleep(10000)),
      Task("c1", deps = Seq("slow"))(() => ()),
      Task("c2", deps = Seq("c1"))(() => ())))
    val s = statuses(report)
    assert(s("slow")._1 === "failed")
    assert(s("c1")._1 === "upstream_failed")
    assert(s("c2")._1 === "upstream_failed")
  }

  test("cycles and unknown deps fail fast with names") {
    val e = intercept[IllegalArgumentException] {
      Dag.run(spark, Seq(
        Task("a", deps = Seq("b"))(() => ()),
        Task("b", deps = Seq("a"))(() => ())))
    }
    assert(e.getMessage.contains("cycle"))
    intercept[IllegalArgumentException] {
      Dag.run(spark, Seq(Task("a", deps = Seq("ghost"))(() => ())))
    }
  }

  test("pipelineDag refuses an uncached silver frame — the cache gate must be real") {
    // NOT the real silver plan: storageLevel resolves through the
    // CacheManager by plan equality, so an "uncached" rebuild of
    // silver reads as cached whenever any other suite has the
    // equivalent plan pinned in the shared session — a frame no suite
    // caches makes the fixture order-independent
    import spark.implicits._
    val uncached = Seq(("dag_gate_fixture", 1)).toDF("event_unique_id", "v")
    val e = intercept[IllegalArgumentException] {
      Dag.pipelineDag(spark, uncached, "/tmp/graft_dag_never_used")
    }
    assert(e.getMessage.contains("cache"))
  }

  test("pipelineDag runs the reference chain end-to-end with a serving layout") {
    val out = java.nio.file.Files.createTempDirectory("graft_dag_").toString
    val silver = graft.marts.SilverEvents.build(
      graft.sources.Tables.events(spark, sf)).cache()
    try {
      val report = Dag.run(spark, Dag.pipelineDag(spark, silver, out))
      val s = statuses(report)
      assert(s.values.forall(_._1 == "success"), s.toString)
      assert(s.contains("silver_events") && s.contains("daily_sales")
        && s.contains("maintenance_report"))
      assert(spark.read.parquet(s"$out/daily_sales").count() > 0)
    } finally silver.unpersist()
  }
}
