package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{GraftCatalog, Snapshots}

/** The `days(col)` partition transform through the DSv2 catalog — the
  * reference's bronze DDL shape
  * (`spark/jobs/bronze_ingestion.py:113` `PARTITIONED BY
  * (days(_processing_date))`) running verbatim: per-day file layout,
  * structural date pruning, storage-partitioned joins resolved through
  * the catalog's `days` function, and layout-preserving compaction. */
class DaysLayoutSpec extends AnyFunSuite {
  import TestSession.spark

  private lazy val wh = Files.createTempDirectory("graft_days_spec_").toString
  private lazy val cat: String = {
    spark.conf.set("spark.sql.catalog.gdl", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdl.warehouse", wh)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    "gdl"
  }

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.datasources.FilePartition
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    df.collect()
    def leaves(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p.collectLeaves().flatMap {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => leaves(q.plan)
        case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
        case l => Seq(l)
      }
    leaves(df.queryExecution.executedPlan).flatMap {
      case b: BatchScanExec => b.inputPartitions.flatMap {
        case fp: FilePartition => fp.files.map(_.filePath.toString).toSeq
        case p: graft.sources.GraftBucketed.BucketPartition =>
          p.inner.files.map(_.filePath.toString).toSeq
        case _ => Seq.empty
      }
      case _ => Seq.empty
    }.distinct
  }

  private def smjShuffles(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    import org.apache.spark.sql.execution.SparkPlan
    df.collect()
    def expand(p: SparkPlan): Seq[SparkPlan] = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => expand(q.plan)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        expand(a.executedPlan)
      case other => Seq(other)
    }
    def shufflesIn(p: SparkPlan): Long =
      expand(p).map { n =>
        (n match {
          case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => 1L
          case _ => 0L
        }) + n.children.map(shufflesIn).sum
      }.sum
    def smjs(p: SparkPlan): Seq[SparkPlan] =
      expand(p).flatMap {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => Seq(j)
        case n => n.children.flatMap(smjs)
      }
    val joins = smjs(df.queryExecution.executedPlan)
    (joins.size.toLong, joins.map(j => j.children.map(shufflesIn).sum).sum)
  }

  test("the reference bronze DDL runs verbatim: days layout on disk, hidden from schema, per-row exact") {
    spark.sql(s"CREATE NAMESPACE $cat.bronze")
    // bronze_ingestion.py:113 shape, including USING iceberg
    spark.sql(s"""CREATE TABLE $cat.bronze.t (event_date DATE, n BIGINT)
      USING iceberg PARTITIONED BY (days(event_date))""")
    spark.range(0, 40).selectExpr(
      "DATE_ADD(DATE '2024-01-01', CAST(id % 8 AS INT)) AS event_date", "id AS n")
      .createOrReplaceTempView("__days_src")
    spark.sql(s"INSERT INTO $cat.bronze.t SELECT * FROM __days_src")
    // per-day directories exist; the derived column stays out of the schema
    val names = scala.util.Using.resource(Files.list(Paths.get(s"$wh/bronze/t/v=1"))) { ls =>
      val b = Vector.newBuilder[String]
      ls.iterator().forEachRemaining(p => b += p.getFileName.toString)
      b.result()
    }
    assert(names.count(_.startsWith("__graft_days=")) == 8, names.mkString(","))
    assert(spark.table(s"$cat.bronze.t").columns.toSeq == Seq("event_date", "n"))
    assert(spark.sql(s"SELECT sum(n) FROM $cat.bronze.t").head().getLong(0) == (0L until 40L).sum)
    // structural date pruning: a 2-day probe scans exactly 2 of 8 files
    // (manifest bounds over the day-aligned layout); sum forces a real scan
    val probe = spark.sql(s"SELECT count(*) AS c, sum(n) AS s FROM $cat.bronze.t " +
      "WHERE event_date BETWEEN DATE '2024-01-02' AND DATE '2024-01-03'")
    assert(scannedFiles(probe).size == 2, s"got ${scannedFiles(probe)}")
    val impossible = spark.sql(s"SELECT count(*) AS c, sum(n) AS s FROM $cat.bronze.t " +
      "WHERE event_date > DATE '2030-01-01'")
    assert(scannedFiles(impossible).isEmpty)
  }

  test("storage-partitioned join over two days-laid-out tables plans zero shuffles") {
    spark.sql(s"CREATE NAMESPACE $cat.spj")
    spark.range(0, 64).selectExpr(
      "DATE_ADD(DATE '2024-02-01', CAST(id % 8 AS INT)) AS d", "id AS a")
      .createOrReplaceTempView("__days_spj_l")
    spark.range(0, 32).selectExpr(
      "DATE_ADD(DATE '2024-02-01', CAST(id % 8 AS INT)) AS d", "id * 2 AS b")
      .createOrReplaceTempView("__days_spj_r")
    spark.sql(s"CREATE TABLE $cat.spj.l PARTITIONED BY (days(d)) AS SELECT * FROM __days_spj_l")
    spark.sql(s"CREATE TABLE $cat.spj.r PARTITIONED BY (days(d)) AS SELECT * FROM __days_spj_r")
    val q = spark.sql(s"""
      SELECT /*+ MERGE(r) */ count(*) AS c, sum(l.a) AS sa, sum(r.b) AS sb
      FROM $cat.spj.l l JOIN $cat.spj.r r ON l.d = r.d""")
    val (smj, below) = smjShuffles(q)
    assert(smj == 1 && below == 0,
      s"days-aligned join must elide both exchanges, got smj=$smj shuffles_below=$below")
    // row-exactness of the exchange-free plan: 8 days × (8 l-rows × 4 r-rows)
    val row = q.collect()(0)
    assert(row.getLong(0) == 8L * 8L * 4L)
  }

  test("timestamp columns take the days transform; compaction preserves the layout") {
    spark.sql(s"CREATE NAMESPACE $cat.ts")
    spark.range(0, 30).selectExpr(
      "TIMESTAMP '2024-03-01 06:00:00' + make_interval(0,0,0,CAST(id % 5 AS INT),0,0,0) AS ts",
      "id AS n")
      .createOrReplaceTempView("__days_ts_src")
    spark.sql(s"CREATE TABLE $cat.ts.t PARTITIONED BY (days(ts)) AS SELECT * FROM __days_ts_src")
    spark.sql(s"INSERT INTO $cat.ts.t SELECT * FROM __days_ts_src WHERE n < 10")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ts.t").head().getLong(0) == 40)
    val tp = s"$wh/ts/t"
    val (cv, _, after) = Snapshots.compact(spark, tp)
    assert(after == 5, s"compaction must keep one file per day, got $after")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ts.t").head().getLong(0) == 40)
    // layout survives: a 1-day probe over the compacted state scans 1 file
    val probe = spark.sql(s"SELECT count(*) AS c, sum(n) AS s FROM $cat.ts.t " +
      "WHERE ts >= TIMESTAMP '2024-03-02 00:00:00' AND ts < TIMESTAMP '2024-03-03 00:00:00'")
    assert(scannedFiles(probe).size == 1, s"got ${scannedFiles(probe)}")
    assert(cv == 3)
  }

  test("NULL dates land in the null partition and stay readable; grouping degrades, never drops") {
    spark.sql(s"CREATE NAMESPACE $cat.nulls")
    spark.range(0, 20).selectExpr(
      "CASE WHEN id % 5 = 0 THEN NULL ELSE DATE_ADD(DATE '2024-04-01', CAST(id % 4 AS INT)) END AS d",
      "id AS n")
      .createOrReplaceTempView("__days_null_src")
    spark.sql(s"CREATE TABLE $cat.nulls.t PARTITIONED BY (days(d)) AS SELECT * FROM __days_null_src")
    // every row survives, including the 4 NULL-date rows
    assert(spark.sql(s"SELECT count(*) FROM $cat.nulls.t").head().getLong(0) == 20)
    assert(spark.sql(s"SELECT count(*) FROM $cat.nulls.t WHERE d IS NULL").head().getLong(0) == 4)
    assert(spark.sql(s"SELECT sum(n) FROM $cat.nulls.t").head().getLong(0) == (0L until 20L).sum)
    // a join over the null-bearing layout is row-correct (the null
    // partition defeats key grouping — degradation, never loss)
    spark.sql(s"CREATE TABLE $cat.nulls.r PARTITIONED BY (days(d)) AS SELECT d, n AS m FROM __days_null_src WHERE d IS NOT NULL")
    assert(spark.sql(s"SELECT count(*) FROM $cat.nulls.t a JOIN $cat.nulls.r b ON a.d = b.d")
      .head().getLong(0) == 16L * 4L)
  }

  test("INSERT OVERWRITE preserves the days layout") {
    spark.sql(s"CREATE NAMESPACE $cat.ow")
    spark.range(0, 24).selectExpr(
      "DATE_ADD(DATE '2024-05-01', CAST(id % 6 AS INT)) AS d", "id AS n")
      .createOrReplaceTempView("__days_ow_src")
    spark.sql(s"CREATE TABLE $cat.ow.t PARTITIONED BY (days(d)) AS SELECT * FROM __days_ow_src")
    spark.sql(s"INSERT OVERWRITE $cat.ow.t SELECT d, n * 10 AS n FROM __days_ow_src WHERE n < 12")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ow.t").head().getLong(0) == 12)
    // overwrite re-laid the files per day: a 1-day probe scans 1 file
    val probe = spark.sql(s"SELECT count(*) AS c, sum(n) AS s FROM $cat.ow.t WHERE d = DATE '2024-05-02'")
    assert(scannedFiles(probe).size == 1, s"got ${scannedFiles(probe)}")
    assert(spark.sql(s"SELECT sum(n) FROM $cat.ow.t").head().getLong(0) == (0L until 12L).map(_ * 10).sum)
  }

  test("timestamp day keys are UTC in non-UTC sessions: layout dirs and planner function agree per row") {
    // the single-definition invariant under a non-UTC session: the
    // write-side layout expression and the catalog's days() function
    // must produce the SAME day for every timestamp, or SPJ would
    // shuffle one side onto day keys the files don't use. LA-local
    // evening timestamps cross UTC midnight — exactly where a
    // CAST-to-DATE (session tz) derivation diverges from the UTC
    // epoch-micros floor the function computes.
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try {
      spark.sql(s"CREATE NAMESPACE $cat.tz")
      spark.sql(s"CREATE TABLE $cat.tz.t (ts TIMESTAMP, n BIGINT) PARTITIONED BY (days(ts))")
      spark.sql(s"INSERT INTO $cat.tz.t VALUES " +
        "(TIMESTAMP '2024-03-01 04:00:00', 1)," + // 2024-03-01T12:00Z → UTC day 19783
        "(TIMESTAMP '2024-03-01 20:00:00', 2)," + // 2024-03-02T04:00Z → UTC day 19784
        "(TIMESTAMP '2024-03-01 23:30:00', 3)")   // 2024-03-02T07:30Z → UTC day 19784
      val dirs = scala.util.Using.resource(Files.list(Paths.get(s"$wh/tz/t/v=1"))) { ls =>
        val b = Vector.newBuilder[String]
        ls.iterator().forEachRemaining(p => b += p.getFileName.toString)
        b.result()
      }.filter(_.startsWith("__graft_days=")).map(_.stripPrefix("__graft_days=").toInt)
      assert(dirs.toSet == Set(19783, 19784),
        s"UTC day keys expected (session-tz CAST would put all three on 19783): $dirs")
      // per-row: each row's file directory key IS the function's day
      val rows = spark.sql(
        s"SELECT $cat.system.days(ts) AS fd, _graft_file AS f FROM $cat.tz.t").collect()
      assert(rows.length == 3)
      rows.foreach { r =>
        val key = "__graft_days=(-?\\d+)".r.findFirstMatchIn(r.getString(1)).get.group(1).toInt
        assert(r.getInt(0) == key,
          s"function day ${r.getInt(0)} != layout directory $key for ${r.getString(1)}")
      }
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("DDL validation: non-temporal days column and reserved layout names are loud") {
    spark.sql(s"CREATE NAMESPACE $cat.val")
    val wrongType = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.val.w (k BIGINT) PARTITIONED BY (days(k))")
    }
    assert(wrongType.getMessage.contains("DATE or TIMESTAMP"), wrongType.getMessage)
    val reserved = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.val.r (__graft_days INT, d DATE)")
    }
    assert(reserved.getMessage.contains("reserved"), reserved.getMessage)
    val unsupported = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.val.m (d DATE) PARTITIONED BY (months(d))")
    }
    assert(unsupported.getMessage.contains("days(col)"), unsupported.getMessage)
    // the SQL-callable days function agrees with the write-side layout
    // expression (one definition; users can pre-compute a row's day)
    val viaFn = spark.sql(s"SELECT $cat.system.days(DATE '2024-04-03') AS d").head().getInt(0)
    val viaExpr = spark.sql(
      "SELECT datediff(DATE '2024-04-03', DATE '1970-01-01')").head().getInt(0)
    assert(viaFn == viaExpr && viaFn == 19816,
      s"SQL-callable days ($viaFn) must agree with the layout expression ($viaExpr)")
    // timestamp binding floors to the date's day
    assert(spark.sql(s"SELECT $cat.system.days(TIMESTAMP '2024-04-03 23:59:59')")
      .head().getInt(0) == 19816)
  }
}
