package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{GraftCatalog, Snapshots}

/** Clustered (z-order) compaction through the versioned store —
  * Iceberg `rewrite_data_files(strategy => 'sort', sort_order =>
  * 'zorder(a, b)')`: the rewrite tightens every file's manifest
  * envelope on BOTH clustered columns at once, so the catalog's
  * stats-based file skipping prunes a two-sided box probe that a
  * single-column sort can only serve on its leading column. Content
  * preservation of the z-rewrite itself is oracle-pinned by
  * `maintenance_zorder`; this spec pins the CATALOG composition. */
class ClusteredCompactionSpec extends AnyFunSuite {
  import TestSession.spark

  private lazy val wh = Files.createTempDirectory("graft_zcomp_spec_").toString
  private lazy val cat: String = {
    spark.conf.set("spark.sql.catalog.gzc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gzc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gzc.m")
    "gzc"
  }

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
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
        case _ => Seq.empty
      }
      case _ => Seq.empty
    }.distinct.size.toLong
  }

  test("box probes prune after z-clustering; rows and sums are untouched; history seals") {
    val t = s"$cat.m.grid"
    val path = s"$wh/m/grid"
    // a 200x200 grid arriving row-major (so arrival order clusters x
    // only) in 16 arrival files — the worst case for a y-probe
    spark.sql(s"""CREATE TABLE $t AS
      SELECT /*+ REPARTITION(16) */
        CAST(id % 200 AS BIGINT) AS x, CAST(id DIV 200 AS BIGINT) AS y, id AS payload
      FROM range(0, 40000)""")
    val before = spark.sql(s"SELECT count(*) AS c, sum(payload) AS s FROM $t").collect()(0)

    val (v, filesBefore, filesAfter) =
      Snapshots.compactZOrdered(spark, path, Seq("x", "y"), targetFiles = 16)
    assert(filesBefore == 16 && filesAfter >= 8, s"$filesBefore -> $filesAfter")

    // content untouched
    val after = spark.sql(s"SELECT count(*) AS c, sum(payload) AS s FROM $t").collect()(0)
    assert(before == after)

    // a 2-sided box covering ~1/16 of each axis: under z-clustering the
    // manifest envelopes exclude most files on ONE of the dimensions —
    // the full scan reads all files, the box probe must not
    def box = spark.sql(s"""SELECT count(*) AS c, sum(payload) AS s FROM $t
      WHERE x BETWEEN 10 AND 20 AND y BETWEEN 10 AND 20""")
    val boxFiles = scannedFiles(box)
    val fullFiles = scannedFiles(spark.sql(s"SELECT count(*) AS c, sum(payload) AS s FROM $t WHERE x >= 0"))
    assert(fullFiles == filesAfter.toLong)
    assert(boxFiles < fullFiles / 2, s"box=$boxFiles full=$fullFiles")
    // the probe is row-exact
    val b = box.collect()(0)
    val exp = (0L until 40000L).filter(i => {
      val x = i % 200; val y = i / 200
      x >= 10 && x <= 20 && y >= 10 && y <= 20
    })
    assert(b.getLong(0) == exp.size && b.getLong(1) == exp.sum)

    // the rewrite is a sealing full-state snapshot: time travel to the
    // pre-rewrite version still works, retention can reap it after
    assert(Snapshots.versions(path).last == v)
    assert(spark.sql(s"SELECT count(*) FROM $t VERSION AS OF 1").collect()(0).getLong(0) == 40000L)
  }

  test("refusals: laid-out tables and single-column clustering stay loud") {
    val t = s"$cat.m.laid"
    val path = s"$wh/m/laid"
    spark.sql(s"CREATE TABLE $t (d DATE, k BIGINT) PARTITIONED BY (bucket(2, k))")
    spark.sql(s"INSERT INTO $t VALUES (DATE '2024-01-01', 1)")
    assert(intercept[Exception](
      Snapshots.compactZOrdered(spark, path, Seq("d", "k")))
      .getMessage.contains("layout owns the clustering"))
    assert(intercept[Exception](
      Snapshots.compactZOrdered(spark, path, Seq("k")))
      .getMessage.contains("at least 2 columns"))
  }
}
