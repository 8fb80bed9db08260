package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{GraftCatalog, Snapshots}

/** Metadata-only `ALTER TABLE … RENAME COLUMN` — the era-split design
  * ([[graft.sources.RenameEras]]): pre-rename files keep their old
  * physical names, the schema marker carries a per-field name history,
  * and every scan groups the read set by era and maps. Pins: the
  * metadata-only contract (no new data version), era-spanning reads
  * and filters, translated manifest pruning, CoW DML keyed on the
  * renamed column across the boundary, per-snapshot names under time
  * travel, the library API, rename chains, every refusal guard, and
  * compaction deactivating the eras. */
class RenameColumnSpec extends AnyFunSuite {
  import TestSession.spark

  private lazy val wh = Files.createTempDirectory("graft_ren_spec_").toString
  private lazy val cat: String = {
    spark.conf.set("spark.sql.catalog.grn", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grn.warehouse", wh)
    "grn"
  }

  /** 2 single-file bands on (k, v): CTAS [0,10), append [10,20). */
  private def banded(ns: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.$ns")
    spark.range(0, 20).selectExpr("id AS k", "id * 10 AS v")
      .createOrReplaceTempView(s"__ren_${ns}_src")
    spark.sql(s"CREATE TABLE $cat.$ns.t AS SELECT /*+ COALESCE(1) */ * FROM __ren_${ns}_src WHERE k < 10")
    spark.sql(s"INSERT INTO $cat.$ns.t SELECT /*+ COALESCE(1) */ * FROM __ren_${ns}_src WHERE k >= 10")
    s"$wh/$ns/t"
  }

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.datasources.FilePartition
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    df.collect()
    def leaves(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p.collectLeaves().flatMap {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => leaves(q.plan)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          leaves(a.executedPlan)
        case l => Seq(l)
      }
    def unwrap(p: org.apache.spark.sql.connector.read.InputPartition): Seq[String] = p match {
      case fp: FilePartition => fp.files.map(_.filePath.toString).toSeq
      case ep: graft.sources.GraftEraScan.EraPart => unwrap(ep.inner)
      case tp: graft.sources.GraftFileTag.TaggedPartition =>
        tp.inner.files.map(_.filePath.toString).toSeq
      case sp: graft.sources.GraftFileTag.SkipTagPartition =>
        sp.inner.files.map(_.filePath.toString).toSeq
      case _ => Seq.empty
    }
    leaves(df.queryExecution.executedPlan).flatMap {
      case b: BatchScanExec => b.inputPartitions.flatMap(unwrap)
      case _ => Seq.empty
    }.distinct
  }

  test("RENAME is metadata-only: no new data version, new name reads old files exactly") {
    val tp = banded("basic")
    spark.sql(s"ALTER TABLE $cat.basic.t RENAME COLUMN v TO amount")
    // no data version was written
    assert(Snapshots.versions(tp) == Seq(1L, 2L))
    assert(spark.table(s"$cat.basic.t").columns.toSeq == Seq("k", "amount"))
    // values intact under the new name, both bands
    assert(spark.sql(s"SELECT sum(amount) FROM $cat.basic.t").head().getLong(0)
      == (0L until 20L).map(_ * 10).sum)
    // filters on the renamed column translate into the old era
    assert(spark.sql(s"SELECT k FROM $cat.basic.t WHERE amount = 50").head().getLong(0) == 5)
    // old name is gone, loudly
    val gone = intercept[Exception](
      spark.sql(s"SELECT v FROM $cat.basic.t").collect())
    assert(gone.getMessage.contains("v"), gone.getMessage)
  }

  test("era-spanning state: post-rename appends mix with pre-rename files; pruning stays exact") {
    val tp = banded("span")
    spark.sql(s"ALTER TABLE $cat.span.t RENAME COLUMN v TO amount")
    spark.range(20, 30).selectExpr("id AS k", "id * 10 AS amount")
      .createOrReplaceTempView("__ren_span_new")
    spark.sql(s"INSERT INTO $cat.span.t SELECT /*+ COALESCE(1) */ * FROM __ren_span_new")
    assert(Snapshots.versions(tp) == Seq(1L, 2L, 3L))
    // reads union old-era and new-era files
    assert(spark.sql(s"SELECT sum(amount) FROM $cat.span.t").head().getLong(0)
      == (0L until 30L).map(_ * 10).sum)
    assert(spark.sql(s"SELECT count(*) FROM $cat.span.t WHERE amount >= 150").head().getLong(0) == 15)
    // manifest pruning translates per era: a band probe on the RENAMED
    // column scans exactly the matching old-era file...
    val oldBand = spark.sql(s"SELECT sum(k) AS s FROM $cat.span.t WHERE amount BETWEEN 100 AND 190")
    assert(scannedFiles(oldBand).size == 1, s"got ${scannedFiles(oldBand)}")
    assert(oldBand.head().getLong(0) == (10L until 20L).sum)
    // ...and exactly the matching new-era file
    val newBand = spark.sql(s"SELECT sum(k) AS s FROM $cat.span.t WHERE amount >= 200")
    assert(scannedFiles(newBand).size == 1, s"got ${scannedFiles(newBand)}")
    assert(newBand.head().getLong(0) == (20L until 30L).sum)
  }

  test("CoW DML keyed on the renamed column crosses the boundary; translated bounds keep pruning") {
    val tp = banded("dml")
    spark.sql(s"ALTER TABLE $cat.dml.t RENAME COLUMN v TO amount")
    // UPDATE keyed on the RENAMED column hits an old-era file: the
    // rewrite reads era-mapped and writes CURRENT names
    spark.sql(s"UPDATE $cat.dml.t SET amount = amount + 1 WHERE amount IN (30, 70)")
    val (own3, carried3) = {
      val m = new String(Files.readAllBytes(
        java.nio.file.Paths.get(s"$tp/_meta/3.json")), java.nio.charset.StandardCharsets.UTF_8)
      (graft.sources.FileStats.fromManifest(m).getOrElse(Seq.empty),
        graft.sources.FileStats.carriedFromManifest(m))
    }
    // group pruning via TRANSLATED bounds: only band 1 rewrote
    assert(own3.map(_.rows).sum == 10 && carried3.size == 1,
      s"own_rows=${own3.map(_.rows).sum} carried=${carried3.size}")
    assert(spark.sql(s"SELECT sum(amount) FROM $cat.dml.t").head().getLong(0)
      == (0L until 20L).map(_ * 10).sum + 2)
    // metadata-only DELETE on the renamed column: the impossible band
    // proves bounds translation (untranslated bounds would rewrite)
    spark.sql(s"DELETE FROM $cat.dml.t WHERE amount < 0")
    val m4 = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$tp/_meta/4.json")), java.nio.charset.StandardCharsets.UTF_8)
    assert(graft.sources.FileStats.fromManifest(m4).getOrElse(Seq.empty).isEmpty,
      "impossible-band DELETE on a renamed column must be metadata-only")
    assert(spark.sql(s"SELECT count(*) FROM $cat.dml.t").head().getLong(0) == 20)
    // NULL semantics survive the translation: rows where the renamed
    // predicate is NULL must NOT delete (the r13 CoW bug class)
    spark.sql(s"CREATE TABLE $cat.dml.n AS SELECT /*+ COALESCE(1) */ " +
      "CASE WHEN id = 2 THEN NULL ELSE id END AS a, id AS b FROM range(5)")
    spark.sql(s"ALTER TABLE $cat.dml.n RENAME COLUMN a TO c")
    spark.sql(s"DELETE FROM $cat.dml.n WHERE c < 3")
    assert(spark.sql(s"SELECT count(*) FROM $cat.dml.n").head().getLong(0) == 3,
      "NULL-predicate row must survive a DELETE keyed on the renamed column")
  }

  test("time travel shows per-snapshot names; current reads show current names") {
    val tp = banded("tt")
    spark.sql(s"ALTER TABLE $cat.tt.t RENAME COLUMN v TO amount")
    spark.range(20, 25).selectExpr("id AS k", "id * 10 AS amount")
      .createOrReplaceTempView("__ren_tt_new")
    spark.sql(s"INSERT INTO $cat.tt.t SELECT /*+ COALESCE(1) */ * FROM __ren_tt_new")
    // pinned pre-rename: the snapshot's OWN (old) name
    val v2 = spark.sql(s"SELECT * FROM $cat.tt.t VERSION AS OF 2")
    assert(v2.columns.toSeq == Seq("k", "v"), v2.columns.mkString(","))
    assert(v2.count() == 20)
    // pinned post-rename (era-spanning read set): new names, exact rows
    val v3 = spark.sql(s"SELECT * FROM $cat.tt.t VERSION AS OF 3")
    assert(v3.columns.toSeq == Seq("k", "amount"), v3.columns.mkString(","))
    assert(spark.sql(s"SELECT sum(amount) FROM $cat.tt.t VERSION AS OF 3").head().getLong(0)
      == (0L until 25L).map(_ * 10).sum)
    // library API: per-snapshot names too
    assert(Snapshots.readAsOf(spark, tp, 2).columns.toSeq == Seq("k", "v"))
    assert(Snapshots.readLatest(spark, tp).columns.toSeq == Seq("k", "amount"))
    assert(Snapshots.readLatest(spark, tp).count() == 25)
  }

  test("rename chains resolve per era: a → b → c across three file generations") {
    val tp = banded("chain")
    spark.sql(s"ALTER TABLE $cat.chain.t RENAME COLUMN v TO mid")
    spark.range(20, 25).selectExpr("id AS k", "id * 10 AS mid")
      .createOrReplaceTempView("__ren_chain_m")
    spark.sql(s"INSERT INTO $cat.chain.t SELECT /*+ COALESCE(1) */ * FROM __ren_chain_m")
    spark.sql(s"ALTER TABLE $cat.chain.t RENAME COLUMN mid TO fin")
    spark.range(25, 30).selectExpr("id AS k", "id * 10 AS fin")
      .createOrReplaceTempView("__ren_chain_f")
    spark.sql(s"INSERT INTO $cat.chain.t SELECT /*+ COALESCE(1) */ * FROM __ren_chain_f")
    // three eras (v, mid, fin) union under the current name
    assert(spark.sql(s"SELECT sum(fin) FROM $cat.chain.t").head().getLong(0)
      == (0L until 30L).map(_ * 10).sum)
    assert(spark.sql(s"SELECT count(*) FROM $cat.chain.t WHERE fin % 100 = 0").head().getLong(0) == 3)
    // per-snapshot names at each stage
    assert(spark.sql(s"SELECT * FROM $cat.chain.t VERSION AS OF 2").columns.toSeq == Seq("k", "v"))
    assert(spark.sql(s"SELECT * FROM $cat.chain.t VERSION AS OF 3").columns.toSeq == Seq("k", "mid"))
    assert(spark.table(s"$cat.chain.t").columns.toSeq == Seq("k", "fin"))
  }

  test("compaction rewrites under current names and deactivates the eras") {
    val tp = banded("cmp")
    spark.sql(s"ALTER TABLE $cat.cmp.t RENAME COLUMN v TO amount")
    val (_, before, after) = Snapshots.compact(spark, tp, targetFileBytes = 1L << 40)
    assert(before == 2 && after == 1)
    assert(spark.sql(s"SELECT sum(amount) FROM $cat.cmp.t").head().getLong(0)
      == (0L until 20L).map(_ * 10).sum)
    // post-compact current reads take the PLAIN scan path again (all
    // planner surfaces restored): streaming works
    val out = Files.createTempDirectory("graft_ren_cmp_out_").toString
    val q = spark.readStream.table(s"$cat.cmp.t").writeStream
      .format("parquet").option("path", out + "/data")
      .option("checkpointLocation", out + "/chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.read.parquet(out + "/data").count() == 20)
    // history before the compaction still resolves the old era
    assert(Snapshots.readAsOf(spark, tp, 2).columns.toSeq == Seq("k", "v"))
  }

  test("rename on a days-layout table: non-layout column renames, date pruning stays exact, compact restores SPJ") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.dl")
    spark.range(0, 40).selectExpr(
      "DATE_ADD(DATE '2024-06-01', CAST(id % 4 AS INT)) AS d", "id AS v")
      .createOrReplaceTempView("__ren_dl_src")
    spark.sql(s"CREATE TABLE $cat.dl.t PARTITIONED BY (days(d)) AS SELECT * FROM __ren_dl_src")
    val tp = s"$wh/dl/t"
    spark.sql(s"ALTER TABLE $cat.dl.t RENAME COLUMN v TO amount")
    assert(Snapshots.versions(tp) == Seq(1L), "rename must be metadata-only")
    // era-union reads stay value-exact over the laid-out files
    assert(spark.sql(s"SELECT sum(amount) FROM $cat.dl.t").head().getLong(0)
      == (0L until 40L).sum)
    // structural date pruning survives the rename (the layout column
    // is untouched; the 1-day probe scans exactly 1 of 4 day files)
    val probe = spark.sql(
      s"SELECT sum(amount) AS s FROM $cat.dl.t WHERE d = DATE '2024-06-02'")
    assert(scannedFiles(probe).size == 1, s"got ${scannedFiles(probe)}")
    assert(probe.head().getLong(0) == (0L until 40L).filter(_ % 4 == 1).sum)
    // the era union degrades SPJ grouping; compaction rewrites under
    // current names AND restores the key-grouped zero-shuffle join
    spark.sql(s"CREATE TABLE $cat.dl.r PARTITIONED BY (days(d)) AS SELECT d, v AS m FROM __ren_dl_src")
    Snapshots.compact(spark, tp)
    val q = spark.sql(s"""
      SELECT /*+ MERGE(r) */ count(*) AS c
      FROM $cat.dl.t t JOIN $cat.dl.r r ON t.d = r.d""")
    import org.apache.spark.sql.execution.SparkPlan
    q.collect()
    def expand(p: SparkPlan): Seq[SparkPlan] = p match {
      case x: org.apache.spark.sql.execution.adaptive.QueryStageExec => expand(x.plan)
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
    val joins = smjs(q.queryExecution.executedPlan)
    assert(joins.size == 1 && joins.map(j => j.children.map(shufflesIn).sum).sum == 0,
      "post-compact days join must elide both exchanges")
    assert(q.collect()(0).getLong(0) == 4L * 10L * 10L)
  }

  test("refusal guards: layout column, name reuse, sidecar interplay, streaming") {
    // layout source column refuses rename
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.grd")
    spark.sql(s"CREATE TABLE $cat.grd.b (k BIGINT, v BIGINT) PARTITIONED BY (bucket(4, k))")
    val layoutErr = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.grd.b RENAME COLUMN k TO kk"))
    assert(layoutErr.getMessage.contains("layout"), layoutErr.getMessage)
    // rename to an existing or historical name refuses
    val tp = banded("grd2")
    spark.sql(s"ALTER TABLE $cat.grd2.t RENAME COLUMN v TO amount")
    val dup = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.grd2.t RENAME COLUMN k TO amount"))
    assert(dup.getMessage.contains("already exists"), dup.getMessage)
    val hist = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.grd2.t RENAME COLUMN k TO v"))
    assert(hist.getMessage.contains("renamed column"), hist.getMessage)
    val histAdd = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.grd2.t ADD COLUMN v BIGINT"))
    assert(histAdd.getMessage.contains("renamed column"), histAdd.getMessage)
    // DROP of a renamed field retires its whole lineage
    spark.sql(s"ALTER TABLE $cat.grd2.t DROP COLUMN amount")
    val retired = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.grd2.t ADD COLUMN amount BIGINT"))
    assert(retired.getMessage.contains("renamed column"), retired.getMessage)
    // rename refuses while MoR sidecars are live
    val tp3 = banded("grd3")
    spark.conf.set("spark.graft.delete.mode", "merge-on-read")
    try spark.sql(s"DELETE FROM $cat.grd3.t WHERE k = 1")
    finally spark.conf.set("spark.graft.delete.mode", "copy-on-write")
    val morErr = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.grd3.t RENAME COLUMN v TO amount"))
    assert(morErr.getMessage.contains("sidecars"), morErr.getMessage)
    // and MoR DML modes fall back to copy-on-write while eras live
    val tp4 = banded("grd4")
    spark.sql(s"ALTER TABLE $cat.grd4.t RENAME COLUMN v TO amount")
    spark.conf.set("spark.graft.delete.mode", "merge-on-read")
    try spark.sql(s"DELETE FROM $cat.grd4.t WHERE k = 1")
    finally spark.conf.set("spark.graft.delete.mode", "copy-on-write")
    assert(Snapshots.liveDeletes(tp4, Snapshots.versions(tp4).last).isEmpty,
      "MoR delete under live eras must fall back to copy-on-write")
    assert(spark.sql(s"SELECT count(*) FROM $cat.grd4.t").head().getLong(0) == 19)
    // streaming refuses era-spanning reads until compaction
    val tp5 = banded("grd5")
    spark.sql(s"ALTER TABLE $cat.grd5.t RENAME COLUMN v TO amount")
    val out = Files.createTempDirectory("graft_ren_grd_out_").toString
    val q = spark.readStream.table(s"$cat.grd5.t").writeStream
      .format("parquet").option("path", out + "/data")
      .option("checkpointLocation", out + "/chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    val streamErr = intercept[Exception](q.awaitTermination(60000))
    assert(streamErr.getMessage.contains("rename eras") ||
      Option(streamErr.getCause).exists(_.getMessage.contains("rename eras")),
      streamErr.getMessage)
  }
}
