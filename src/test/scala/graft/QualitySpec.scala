package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.quality.DataChecks

/** Data-test combinator suites (the dbt-tests analog). */
class QualitySpec extends AnyFunSuite {
  import TestSession._

  test("silver suite: all checks pass on clean silver") {
    val rep = SparkEntry.queries("quality_silver_report")(spark, sf).collect()
    assert(rep.length === 7)
    assert(rep.forall(_.getBoolean(2)), rep.mkString("; "))
  }

  test("gold suite: all checks pass on the gold marts") {
    val rep = SparkEntry.queries("quality_gold_report")(spark, sf).collect()
    assert(rep.length === 10)
    assert(rep.forall(_.getBoolean(2)), rep.mkString("; "))
  }

  test("benford screen: conforming data passes, uniform digits fail") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // log-uniform magnitudes follow Benford closely
    val conforming = (1 to 4000)
      .map(_ => math.pow(10, rnd.nextDouble() * 6)).toDF("x")
    assert(DataChecks.benford(conforming, "x").violations.count() === 0)
    // uniform [1000, 2000): first digit always 1 -> hard fail
    val uniform = (1 to 4000).map(i => 1000.0 + (i % 1000)).toDF("x")
    assert(DataChecks.benford(uniform, "x").violations.count() === 1)
  }

  test("outlier screen flags planted extremes only") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val base = (1 to 5000).map(_ => rnd.nextGaussian()).toDF("x")
    assert(DataChecks.outliers(base, "x", maxSigma = 8).violations.count() === 0)
    val planted = base.union(Seq(1e6).toDF("x"))
    val v = DataChecks.outliers(planted, "x", maxSigma = 8).violations
    assert(v.count() === 1)
  }

  test("checks actually detect violations") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1, "a"), (1, "b"), (2, null)).toDF("k", "v")
    assert(DataChecks.unique(df, Seq("k")).violations.count() === 1)
    assert(DataChecks.notNull(df, "v").violations.count() === 1)
    assert(DataChecks.acceptedValues(df, "v", Seq("a")).violations.count() === 1)
    // both k=1 rows have x=10 < 15
    assert(DataChecks.acceptedRange(df.withColumn("x", col("k") * 10),
      "x", min = Some(15.0), max = None).violations.count() === 2)
  }

  test("column stats: nulls, exact ndv, and portable min/max rendering") {
    import spark.implicits._
    import graft.quality.ColumnStats
    val df = Seq(
      (Option(1.0), Option("a")), (None: Option[Double], Option("b")),
      (Option(2.5), None: Option[String]), (Option(2.5), Option("a")))
      .toDF("x", "s")
    val st = ColumnStats.columnStats(df, Seq("x", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    // doubles render through DECIMAL(18,2): "1.00"/"2.50", not Java repr
    assert(st("x") === ((4L, 1L, 2L, "1.00", "2.50")))
    assert(st("s") === ((4L, 1L, 2L, "a", "b")))
  }

  test("expireSnapshots: old versions deleted, survivors intact, report exact") {
    import spark.implicits._
    import graft.sources.Snapshots
    val table = java.nio.file.Files.createTempDirectory("graft_vacspec_")
      .toString + "/t"
    Snapshots.writeSnapshot(Seq(1, 2).toDF("v"), table)
    Snapshots.writeSnapshot(Seq(1, 2, 3).toDF("v"), table)
    Snapshots.writeSnapshot(Seq(1, 2, 3, 4).toDF("v"), table)
    val rep = Snapshots.expireSnapshots(spark, table, keepLast = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(rep === Map(1L -> ((2L, "expired")), 2L -> ((3L, "kept")), 3L -> ((4L, "kept"))))
    assert(Snapshots.versions(table) === Seq(2L, 3L))
    assert(Snapshots.readLatest(spark, table).count() === 4)
    assert(Snapshots.readAsOf(spark, table, 2L).count() === 3)
    intercept[IllegalArgumentException] {
      Snapshots.readAsOf(spark, table, 1L)
    }
  }

  test("rollback: restores an earlier version's state as a new append-only commit") {
    import spark.implicits._
    import graft.sources.Snapshots
    val table = java.nio.file.Files.createTempDirectory("graft_rbspec_")
      .toString + "/t"
    Snapshots.writeSnapshot(Seq(1, 2).toDF("v"), table)
    Snapshots.writeSnapshot(Seq(1, 2, 99).toDF("v"), table) // the bad write
    val nv = Snapshots.rollback(spark, table, 1L)
    assert(nv === 3L)
    // current state == v1; history keeps all three versions (the bad
    // interval stays auditable)
    assert(Snapshots.readLatest(spark, table).as[Int].collect().sorted === Array(1, 2))
    assert(Snapshots.versions(table) === Seq(1L, 2L, 3L))
    assert(Snapshots.readAsOf(spark, table, 2L).count() === 3)
    val hist = Snapshots.snapshots(spark, table)
      .select("version", "operation").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hist(3L) === "rollback_to_1")
    intercept[IllegalArgumentException] { Snapshots.rollback(spark, table, 7L) }
  }

  test("gatedWrite: failing checks abort the write and name themselves; clean suite commits") {
    import spark.implicits._
    import graft.quality.DataChecks
    val out = java.nio.file.Files.createTempDirectory("graft_gwspec_").toString
    val df = Seq(("a", 1), ("a", 2), (null, 3)).toDF("k", "v")
    // failing suite: a not-null violation and a uniqueness violation
    val bad = intercept[IllegalStateException] {
      DataChecks.gatedWrite(df, d => Seq(
        DataChecks.notNull(d, "k"), DataChecks.unique(d, Seq("k"))))(
        _.write.mode("overwrite").parquet(s"$out/t"))
    }
    assert(bad.getMessage.contains("not_null(k)") && bad.getMessage.contains("unique(k)"))
    assert(!new java.io.File(s"$out/t").exists(), "aborted write must not commit")
    // clean suite: write commits, report returned all-passed — and the
    // frame handed to the write is the STAGED materialization the
    // checks audited (r9 advice: a recomputation is not WAP), and the
    // staging is released once the gate returns
    var audited: org.apache.spark.sql.DataFrame = null
    val rep = DataChecks.gatedWrite(df, d => { audited = d; Seq(DataChecks.notNull(d, "v")) })(
      w => {
        assert(w eq audited, "write must receive the exact frame the checks audited")
        assert(w.queryExecution.analyzed.collectLeaves()
          .forall(_.getClass.getSimpleName == "LogicalRDD"),
          "the audited frame must be a lineage-truncated materialization " +
            "(localCheckpoint) — a persisted plan would silently recompute " +
            "on block loss")
        w.write.mode("overwrite").parquet(s"$out/t")
      })
    assert(new java.io.File(s"$out/t").exists())
    assert(rep.filter(!org.apache.spark.sql.functions.col("passed")).count() === 0)
    // the local report survives unpersist without recomputing checks
    assert(rep.count() === 1)
  }

  test("timestamp time travel: TIMESTAMP AS OF resolves the newest eligible commit") {
    import spark.implicits._
    import graft.sources.Snapshots
    val table = java.nio.file.Files.createTempDirectory("graft_ttspec_")
      .toString + "/t"
    Snapshots.writeSnapshot(Seq(1).toDF("v"), table, commitTsMs = Some(1000L))
    Snapshots.writeSnapshot(Seq(1, 2).toDF("v"), table, commitTsMs = Some(2000L))
    Snapshots.writeSnapshot(Seq(1, 2, 3).toDF("v"), table, commitTsMs = Some(3000L))
    // between commits → the newest at-or-before wins
    assert(Snapshots.readAsOfTimestamp(spark, table, 2500L).count() === 2)
    // exactly at a commit → that commit
    assert(Snapshots.readAsOfTimestamp(spark, table, 2000L).count() === 2)
    // after everything → latest
    assert(Snapshots.readAsOfTimestamp(spark, table, 9999L).count() === 3)
    // before history began → error, like the engines this emulates
    intercept[IllegalArgumentException] {
      Snapshots.readAsOfTimestamp(spark, table, 999L)
    }
    // the .history frame carries injected commit times and a current flag
    val h = Snapshots.history(spark, table)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(h === Array((1000L, 1L, false), (2000L, 2L, false), (3000L, 3L, true)))
  }
}
