package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{BloomSkip, FileStats, Snapshots, GraftCatalog}

/** Bloom-filter file skipping ([[graft.sources.BloomSkip]]): the
  * pruning class min/max bounds cannot serve — hash-distributed keys
  * span every file's [min,max], so point lookups and point DML need
  * the parquet column blooms the write path embeds. Pins the lookup
  * extraction algebra, write-through on every commit shape, plan-time
  * file skipping on reads, carry-by-reference on CoW DML, the
  * pre-enablement and never-enabled no-op paths, and the ±0.0
  * soundness edge. */
class BloomSkipSpec extends AnyFunSuite {
  import TestSession.spark

  private lazy val wh = Files.createTempDirectory("graft_bloom_spec_").toString
  private lazy val cat: String = {
    spark.conf.set("spark.sql.catalog.gbl", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gbl.warehouse", wh)
    "gbl"
  }

  /** 3 single-file bands keyed by md5-ish strings: every band's
    * [min,max] spans ~the full key space, so BOUNDS never prune a
    * point lookup — only the bloom can. */
  private def hashBanded(ns: String, props: String = "TBLPROPERTIES('graft.bloom.columns'='sk')"): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.$ns")
    spark.range(0, 30)
      .selectExpr("md5(CAST(id AS STRING)) AS sk", "id AS v")
      .createOrReplaceTempView(s"__bl_${ns}_src")
    spark.sql(s"CREATE TABLE $cat.$ns.t $props AS SELECT /*+ COALESCE(1) */ * FROM __bl_${ns}_src WHERE v < 10")
    spark.sql(s"INSERT INTO $cat.$ns.t SELECT /*+ COALESCE(1) */ * FROM __bl_${ns}_src WHERE v >= 10 AND v < 20")
    spark.sql(s"INSERT INTO $cat.$ns.t SELECT /*+ COALESCE(1) */ * FROM __bl_${ns}_src WHERE v >= 20")
    s"$wh/$ns/t"
  }

  private def keyOf(i: Int): String =
    org.apache.commons.codec.digest.DigestUtils.md5Hex(i.toString)

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
    leaves(df.queryExecution.executedPlan).flatMap {
      case b: BatchScanExec => b.inputPartitions.flatMap {
        case fp: FilePartition => fp.files.map(_.filePath.toString).toSeq
        case _ => Seq.empty
      }
      case _ => Seq.empty
    }.distinct
  }

  private def manifestText(tp: String, v: Long): String =
    new String(Files.readAllBytes(Paths.get(s"$tp/_meta/$v.json")),
      java.nio.charset.StandardCharsets.UTF_8)

  // ---- lookup extraction ------------------------------------------------

  private val sk = AttributeReference("sk", StringType)()
  private val other = AttributeReference("other", StringType)()
  private def S(v: String) = Literal(UTF8String.fromString(v), StringType)

  test("pointLookups: eq/in on gated columns only; nulls drop; And splits; Or ignored") {
    val cols = Set("sk")
    assert(BloomSkip.pointLookups(Seq(EqualTo(sk, S("a"))), cols) == Map("sk" -> Seq(UTF8String.fromString("a"))))
    // literal-on-left, null-safe
    assert(BloomSkip.pointLookups(Seq(EqualTo(S("a"), sk)), cols).nonEmpty)
    assert(BloomSkip.pointLookups(Seq(EqualNullSafe(sk, S("a"))), cols).nonEmpty)
    // a NULL literal never matches a row — no lookup (bounds layer owns it)
    assert(BloomSkip.pointLookups(Seq(EqualTo(sk, Literal(null, StringType))), cols).isEmpty)
    // In: null members drop, the rest test
    val in = BloomSkip.pointLookups(
      Seq(In(sk, Seq(S("a"), Literal(null, StringType), S("b")))), cols)
    assert(in("sk").toSet == Set(UTF8String.fromString("a"), UTF8String.fromString("b")))
    // column gate: a lookup on a non-bloom'd column contributes nothing
    assert(BloomSkip.pointLookups(Seq(EqualTo(other, S("a"))), cols).isEmpty)
    // And splits into conjuncts; Or is not a conjunct (unmodeled — keep)
    assert(BloomSkip.pointLookups(
      Seq(And(EqualTo(sk, S("a")), EqualTo(other, S("b")))), cols).nonEmpty)
    assert(BloomSkip.pointLookups(
      Seq(Or(EqualTo(sk, S("a")), EqualTo(sk, S("b")))), cols).isEmpty)
    // several conjuncts on one column keep the SMALLEST value set
    val multi = BloomSkip.pointLookups(
      Seq(In(sk, Seq(S("a"), S("b"))), EqualTo(sk, S("a"))), cols)
    assert(multi("sk").size == 1)
  }

  // ---- read-path skipping ------------------------------------------------

  test("point SELECT on a hash key scans only the true host file; absent keys scan nothing") {
    val tp = hashBanded("read")
    // bounds CANNOT prune: every band spans ~the full md5 space — so a
    // 1-file plan proves the bloom did it
    val k15 = keyOf(15) // lives in band 2 (v=2 directory)
    val q = spark.sql(s"SELECT v FROM $cat.read.t WHERE sk = '$k15'")
    val files = scannedFiles(q)
    assert(files.size == 1 && files.head.contains("/v=2/"), files)
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(15L))
    // a key in no band: every file's bloom proves absence — zero files
    val none = spark.sql(s"SELECT v FROM $cat.read.t WHERE sk = 'not-a-real-key'")
    assert(scannedFiles(none).isEmpty)
    assert(none.count() == 0)
    // IN across two bands: exactly the two hosts scan
    val k3 = keyOf(3); val k25 = keyOf(25)
    val two = spark.sql(s"SELECT v FROM $cat.read.t WHERE sk IN ('$k3', '$k25')")
    val twoFiles = scannedFiles(two)
    assert(twoFiles.size == 2 &&
      twoFiles.exists(_.contains("/v=1/")) && twoFiles.exists(_.contains("/v=3/")), twoFiles)
    assert(two.collect().map(_.getLong(0)).toSet == Set(3L, 25L))
    // a non-point predicate is untouched by the bloom layer: full scan
    assert(scannedFiles(spark.sql(s"SELECT v FROM $cat.read.t WHERE sk > ''")).size == 3)
  }

  test("a table never opted in plans exactly as before (no bloom reads)") {
    val before = BloomSkip.planningReads.get()
    val tp = hashBanded("off", props = "")
    assert(BloomSkip.specOf(tp).isEmpty)
    val k15 = keyOf(15)
    val q = spark.sql(s"SELECT v FROM $cat.off.t WHERE sk = '$k15'")
    // all 3 files scan (bounds can't prune the hash key, bloom is off)
    assert(scannedFiles(q).size == 3)
    assert(BloomSkip.planningReads.get() == before)
  }

  test("pre-enablement files keep (no bloom = maybe); post-enablement files skip") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.pre")
    spark.range(0, 30)
      .selectExpr("md5(CAST(id AS STRING)) AS sk", "id AS v")
      .createOrReplaceTempView("__bl_pre_src")
    spark.sql(s"CREATE TABLE $cat.pre.t AS SELECT /*+ COALESCE(1) */ * FROM __bl_pre_src WHERE v < 10")
    spark.sql(s"ALTER TABLE $cat.pre.t SET TBLPROPERTIES('graft.bloom.columns'='sk')")
    spark.sql(s"INSERT INTO $cat.pre.t SELECT /*+ COALESCE(1) */ * FROM __bl_pre_src WHERE v >= 10")
    // a band-1 key: the pre-enablement file has no bloom (kept), the
    // post-enablement file's bloom proves absence (skipped) → 1 file
    val q = spark.sql(s"SELECT v FROM $cat.pre.t WHERE sk = '${keyOf(3)}'")
    val files = scannedFiles(q)
    assert(files.size == 1 && files.head.contains("/v=1/"), files)
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  // ---- DML carry-by-reference ---------------------------------------------

  test("point DELETE carries keyless files by reference and rewrites only the host") {
    val tp = hashBanded("del")
    val k15 = keyOf(15)
    spark.sql(s"DELETE FROM $cat.del.t WHERE sk = '$k15'")
    val m = manifestText(tp, 4)
    val carried = FileStats.carriedFromManifest(m)
    // bounds alone carry NOTHING here (every band spans the key space);
    // the bloom carries the two keyless bands
    assert(carried.size == 2, m)
    assert(carried.map(_.name).forall(n => n.startsWith("v=1/") || n.startsWith("v=3/")), carried.map(_.name))
    // the table is exact afterwards
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.del.t").collect()(0).getLong(0) == 29)
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.del.t WHERE sk = '$k15'").collect()(0).getLong(0) == 0)
  }

  test("point UPDATE through the row-level CoW path carries keyless files") {
    val tp = hashBanded("upd")
    val k25 = keyOf(25)
    spark.sql(s"UPDATE $cat.upd.t SET v = 9999 WHERE sk = '$k25'")
    val m = manifestText(tp, 4)
    val carried = FileStats.carriedFromManifest(m)
    assert(carried.size == 2, m)
    assert(carried.map(_.name).forall(n => n.startsWith("v=1/") || n.startsWith("v=2/")), carried.map(_.name))
    val rows = spark.sql(s"SELECT v FROM $cat.upd.t WHERE sk = '$k25'").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(9999L))
    assert(spark.sql(s"SELECT sum(v) AS s FROM $cat.upd.t").collect()(0).getLong(0) ==
      (0 until 30).map(_.toLong).sum - 25 + 9999)
  }

  test("mergeIntoBranch on a bloom'd key carries keyless files through the In envelope") {
    val tp = hashBanded("br")
    Snapshots.createBranch(tp, "fix")
    val upd = spark.range(15, 16)
      .selectExpr("md5(CAST(id AS STRING)) AS sk", "id * 100 AS v")
    Snapshots.mergeIntoBranch(spark, tp, "fix", upd, Seq("sk"))
    // the branch CoW manifest carries the two keyless bands by ref
    val bdir = Paths.get(s"$tp/_meta/branches/fix")
    val bms = Files.list(bdir).iterator()
    var carried = -1
    bms.forEachRemaining { p =>
      if (p.getFileName.toString.endsWith(".json")) {
        val t = new String(Files.readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8)
        if (t.contains("\"operation\":\"merge\""))
          carried = FileStats.carriedFromManifest(t).size
      }
    }
    assert(carried == 2)
    // branch state exact; main untouched
    val br = Snapshots.readBranch(spark, tp, "fix")
    assert(br.filter(s"sk = '${keyOf(15)}'").collect().map(_.getLong(1)).toSeq == Seq(1500L))
    assert(br.count() == 30)
    assert(spark.sql(s"SELECT v FROM $cat.br.t WHERE sk = '${keyOf(15)}'")
      .collect().map(_.getLong(0)).toSeq == Seq(15L))
  }

  // ---- soundness edges ------------------------------------------------------

  test("floating-point bloom keys are refused loudly (parquet bloom eq is unsound across ±0.0)") {
    // measured in this environment: a parquet file holding -0.0 with a
    // bloom on the double column row-group-skips `WHERE d = 0.0` inside
    // the STOCK reader (raw-bits hashing) — so the engine refuses to
    // ever write such a bloom instead of losing rows
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.zz")
    spark.sql("SELECT CAST('-0.0' AS DOUBLE) AS d, 1L AS v UNION ALL SELECT CAST(7.5 AS DOUBLE), 2L")
      .createOrReplaceTempView("__bl_zz_src")
    val err = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.zz.t TBLPROPERTIES('graft.bloom.columns'='d') AS SELECT /*+ COALESCE(1) */ * FROM __bl_zz_src")
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + chain(t.getCause)
    assert(chain(err).contains("floating-point"), chain(err))
    // the refusal is ATOMIC: it fires before any filesystem write, so
    // the failed CTAS leaves no half-born table behind (no directory,
    // no _schema.json, no _bloom.json marker)
    assert(!Files.exists(Paths.get(wh, "zz", "t")),
      "refused CTAS left a table directory behind")
    // without the bloom the same data and probe stay exact — the
    // refusal is what keeps `d = 0.0` finding the -0.0 row
    spark.sql(s"CREATE TABLE $cat.zz.t2 AS SELECT /*+ COALESCE(1) */ * FROM __bl_zz_src")
    assert(spark.sql(s"SELECT v FROM $cat.zz.t2 WHERE d = 0.0").collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("long keys skip files too (INT64 physical hashing)") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.lk")
    // interleaved longs: both bands span [0,29] in bounds
    spark.range(0, 30).selectExpr("id AS k", "id * 10 AS v")
      .createOrReplaceTempView("__bl_lk_src")
    spark.sql(s"CREATE TABLE $cat.lk.t TBLPROPERTIES('graft.bloom.columns'='k') AS SELECT /*+ COALESCE(1) */ * FROM __bl_lk_src WHERE k % 2 = 0")
    spark.sql(s"INSERT INTO $cat.lk.t SELECT /*+ COALESCE(1) */ * FROM __bl_lk_src WHERE k % 2 = 1")
    val q = spark.sql(s"SELECT v FROM $cat.lk.t WHERE k = 15")
    val files = scannedFiles(q)
    assert(files.size == 1 && files.head.contains("/v=2/"), files)
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(150L))
  }

  test("past the planning cap the probes distribute: pruning coverage is complete, not truncated") {
    val tp = hashBanded("cap")
    val key = keyOf(5) // lives in exactly one of the 3 bands
    val files = (1 to 3).flatMap { v =>
      scala.util.Using.resource(Files.walk(Paths.get(s"$tp/v=$v"))) { w =>
        import scala.jdk.CollectionConverters._
        w.iterator().asScala.map(_.toString).filter(_.endsWith(".parquet")).toVector
      }
    }
    assert(files.size == 3)
    val flt = Seq(EqualTo(sk, S(key)): Expression)
    val prior = spark.conf.getOption("spark.graft.bloom.maxPlanningChecks")
    spark.conf.set("spark.graft.bloom.maxPlanningChecks", "2")
    try {
      val skip0 = BloomSkip.filesSkipped.get()
      // 3 candidates > cap 2 → the probes run as one small Spark job
      // over the whole candidate list: BOTH keyless bands prove
      // absent — the cap is a parallelize-beyond threshold, never a
      // silently-kept tail
      val absent = BloomSkip.provablyAbsent(tp, files, flt)
      assert(absent.size == 2, s"expected 2 proven-absent past the cap, got $absent")
      assert(BloomSkip.filesSkipped.get() - skip0 == 2)
      // and the end-to-end point SELECT stays exact under the low cap
      assert(spark.sql(s"SELECT v FROM $cat.cap.t WHERE sk = '$key'")
        .collect().map(_.getLong(0)).toSeq == Seq(5L))
    } finally prior match {
      case Some(v) => spark.conf.set("spark.graft.bloom.maxPlanningChecks", v)
      case None => spark.conf.unset("spark.graft.bloom.maxPlanningChecks")
    }
  }

  test("fully-dict chunks prove absence through their DICTIONARY (parquet-mr omits blooms there)") {
    import org.apache.spark.sql.catalyst.expressions.{EqualTo, Literal}
    import graft.sources.IncrementalMart
    import IncrementalMart.{MartDef, Measure}
    // low-cardinality dims land fully dictionary-encoded, and
    // parquet-mr deliberately writes NO bloom for fully-dict chunks
    // (the dictionary subsumes it) — the planner must read the
    // dictionary page as the exact membership list, or enum-ish
    // columns (dates, categories) would never skip
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.dd")
    val t = s"$cat.dd.t"
    spark.sql(s"CREATE TABLE $t TBLPROPERTIES('graft.changelog.keys'='k') AS " +
      "SELECT /*+ COALESCE(1) */ id AS k, DATE '2024-01-01' + CAST(id % 30 AS INT) AS d, " +
      "CAST(id % 5 AS INT) AS c1, id * 10 AS m FROM range(0, 300)")
    val mart = s"$wh/dd/t_mart"
    Files.createDirectories(Paths.get(mart))
    BloomSkip.enable(mart, Seq("d"))
    IncrementalMart.initialize(spark, mart.stripSuffix("_mart"), mart,
      MartDef(Seq("d", "c1"), Seq(Measure("m", "m"))), bandFiles = 3)
    // the band files carry a dictionary-encoded date chunk and no bloom
    val files = scala.util.Using.resource(Files.walk(Paths.get(s"$mart/v=1"))) { w =>
      import scala.jdk.CollectionConverters._
      w.iterator().asScala.map(_.toString).filter(_.endsWith(".parquet")).toVector.sorted
    }
    assert(files.size == 3)
    val dAttr = org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "d", org.apache.spark.sql.types.DateType)()
    val days = java.time.LocalDate.of(2024, 1, 14).toEpochDay.toInt
    val absent = BloomSkip.provablyAbsent(mart, files, Seq(EqualTo(dAttr,
      Literal(days, org.apache.spark.sql.types.DateType))))
    assert(absent.size == 2, s"dictionary proof should drop 2 of 3 bands, got $absent")
    // a point fix through the merge path rewrites exactly the one
    // band whose dictionary holds the date
    spark.sql(s"UPDATE $t SET m = m + 5 WHERE k = 13")
    val r = IncrementalMart.refresh(spark, mart)
    val mTxt = manifestText(mart, r)
    assert(FileStats.carriedFromManifest(mTxt).size == 2, mTxt)
  }

  test("compact() retrofits blooms onto a pre-enablement live set") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.rf")
    spark.range(0, 30)
      .selectExpr("md5(CAST(id AS STRING)) AS sk", "id AS v")
      .createOrReplaceTempView("__bl_rf_src")
    // three bloomless bands
    spark.sql(s"CREATE TABLE $cat.rf.t AS SELECT /*+ COALESCE(1) */ * FROM __bl_rf_src WHERE v < 10")
    spark.sql(s"INSERT INTO $cat.rf.t SELECT /*+ COALESCE(1) */ * FROM __bl_rf_src WHERE v >= 10 AND v < 20")
    spark.sql(s"INSERT INTO $cat.rf.t SELECT /*+ COALESCE(1) */ * FROM __bl_rf_src WHERE v >= 20")
    spark.sql(s"ALTER TABLE $cat.rf.t SET TBLPROPERTIES('graft.bloom.columns'='sk')")
    // pre-retrofit: no blooms anywhere, point query scans all 3
    assert(scannedFiles(spark.sql(s"SELECT v FROM $cat.rf.t WHERE sk = '${keyOf(15)}'")).size == 3)
    Snapshots.compact(spark, s"$wh/rf/t")
    // post-retrofit: the compacted file(s) carry blooms — an absent
    // key scans ZERO files (one compacted file would always bounds-
    // survive; only a bloom can prove absence)
    val none = spark.sql(s"SELECT v FROM $cat.rf.t WHERE sk = 'not-a-real-key'")
    assert(scannedFiles(none).isEmpty)
    assert(spark.sql(s"SELECT sum(v) FROM $cat.rf.t").collect()(0).getLong(0) == (0 until 30).sum)
  }

  test("the enablement surface validates columns and rides DESCRIBE properties") {
    val tp = hashBanded("meta")
    assert(BloomSkip.specOf(tp).map(_.columns) == Some(Seq("sk")))
    val props = spark.sql(s"SHOW TBLPROPERTIES $cat.meta.t").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(props.get("graft.bloom.columns") == Some("sk"))
    val err = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.meta.t SET TBLPROPERTIES('graft.bloom.columns'='nope')")
    }
    assert(err.getMessage.contains("no column nope"), err.getMessage)
  }
}
