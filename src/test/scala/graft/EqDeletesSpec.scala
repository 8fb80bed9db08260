package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{EqDeletes, GraftCatalog, Snapshots}

/** Equality delete files — the keyed-upsert retraction flavor of
  * Iceberg format-v2 ([[graft.sources.EqDeletes]]): a delivery
  * retracts its keys from files BELOW its bound and fast-appends its
  * rows, with zero data files read or rewritten. Pins the upsert
  * lifecycle (retraction exactness, origin scoping, idempotent
  * redelivery), the scan-side merge (SQL through the catalog),
  * pruning and count behavior under live entries, compaction
  * materialization, NULL-key semantics, and every refusal guard. */
class EqDeletesSpec extends AnyFunSuite {
  import TestSession.spark

  private lazy val wh = Files.createTempDirectory("graft_eq_spec_").toString
  private lazy val cat: String = {
    spark.conf.set("spark.sql.catalog.geq", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.geq.warehouse", wh)
    "geq"
  }

  /** 2 single-file bands on (k, v): CTAS [0,10), append [10,20). */
  private def banded(ns: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.$ns")
    spark.range(0, 20).selectExpr("id AS k", "id * 10 AS v")
      .createOrReplaceTempView(s"__eq_${ns}_src")
    spark.sql(s"CREATE TABLE $cat.$ns.t AS SELECT /*+ COALESCE(1) */ * FROM __eq_${ns}_src WHERE k < 10")
    spark.sql(s"INSERT INTO $cat.$ns.t SELECT /*+ COALESCE(1) */ * FROM __eq_${ns}_src WHERE k >= 10")
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
      case cp: graft.sources.GraftEqScan.CleanPart => unwrap(cp.inner)
      case ep: graft.sources.GraftEqScan.EqPart =>
        ep.inner.files.map(_.filePath.toString).toSeq
      case _ => Seq.empty
    }
    leaves(df.queryExecution.executedPlan).flatMap {
      case b: BatchScanExec => b.inputPartitions.flatMap(unwrap)
      case _ => Seq.empty
    }.distinct
  }

  private def kvs(table: String): Seq[(Long, Long)] =
    spark.sql(s"SELECT k, v FROM $table ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("keyed upsert: retraction + append with zero rewrites; origin scoping; both read paths merge") {
    val tp = banded("ups")
    // delivery: replace k in {3, 12} and add k=25 — ONE fast-append
    val b1 = spark.range(0, 40).selectExpr("id AS k", "id * 1000 AS v")
      .filter("k IN (3, 12, 25)")
    Snapshots.upsertBatch(spark, tp, b1, Seq("k"))
    // zero rewrites: v3 is an append whose own rows are the batch
    val m3 = new String(Files.readAllBytes(Paths.get(s"$tp/_meta/3.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(m3.contains("\"operation\":\"append\"") && m3.contains("\"added_rows\":3"), m3)
    assert(Snapshots.liveEqDeletes(tp, 3).map(_.bound) == Seq(2L))
    val expect1 = (0L until 20L).map(k =>
      (k, if (k == 3 || k == 12) k * 1000 else k * 10)) :+ (25L, 25000L)
    // DSv2 (SQL through the catalog) merges
    assert(kvs(s"$cat.ups.t") == expect1)
    // library read merges identically
    assert(Snapshots.readLatest(spark, tp).count() == 21)
    // ORIGIN SCOPING: a later plain append re-inserting a retracted
    // key is ABOVE the bound — it must stick
    spark.sql(s"INSERT INTO $cat.ups.t VALUES (3, 777)")
    assert(spark.sql(s"SELECT v FROM $cat.ups.t WHERE k = 3 ORDER BY v").collect()
      .map(_.getLong(0)).toSeq == Seq(777L, 3000L),
      "re-inserted key must survive the earlier retraction")
    // a second upsert retracts across BOTH prior upserts' rows
    val b2 = spark.range(0, 40).selectExpr("id AS k", "id * 100000 AS v")
      .filter("k IN (12, 25)")
    Snapshots.upsertBatch(spark, tp, b2, Seq("k"))
    assert(spark.sql(s"SELECT v FROM $cat.ups.t WHERE k = 12").head().getLong(0) == 1200000L)
    assert(spark.sql(s"SELECT v FROM $cat.ups.t WHERE k = 25").head().getLong(0) == 2500000L)
    // time travel: pre-upsert snapshot intact; pinned post-upsert merges
    assert(spark.sql(s"SELECT count(*) FROM $cat.ups.t VERSION AS OF 2").head().getLong(0) == 20)
    assert(spark.sql(s"SELECT v FROM $cat.ups.t VERSION AS OF 3 WHERE k = 3").head().getLong(0) == 3000L)
    // compaction materializes: entries die, values keep
    val (cv, _, _) = Snapshots.compact(spark, tp, targetFileBytes = 1L << 40)
    assert(Snapshots.liveEqDeletes(tp, cv).isEmpty)
    assert(spark.sql(s"SELECT v FROM $cat.ups.t WHERE k = 12").head().getLong(0) == 1200000L)
  }

  test("count(*) under live entries must SCAN (never manifest-answer) and be exact; pruning stays live") {
    val tp = banded("cnt")
    Snapshots.upsertBatch(spark, tp,
      spark.range(5, 8).selectExpr("id AS k", "id AS v"), Seq("k"))
    val cnt = spark.sql(s"SELECT count(*) FROM $cat.cnt.t")
    assert(scannedFiles(cnt).nonEmpty,
      "count(*) under equality deletes must scan — live rows are unknowable from the manifest")
    assert(cnt.head().getLong(0) == 20, "3 retracted + 3 appended")
    // bounds pruning: a probe outside the upsert band scans only the
    // matching band file (band-2 file [10,20) — the upsert rows 5..7
    // and band-1 are excluded by k-bounds)
    val probe = spark.sql(s"SELECT sum(v) AS s FROM $cat.cnt.t WHERE k >= 15")
    assert(scannedFiles(probe).size == 1, s"got ${scannedFiles(probe)}")
    assert(probe.head().getLong(0) == (15L until 20L).map(_ * 10).sum)
  }

  test("idempotent keyed upsert sink: redelivery cannot double-retract or double-append") {
    val tp = s"${Files.createTempDirectory("graft_eq_sink_")}/t"
    val write = Snapshots.idempotentUpsertWriter(tp, "eq_demo", Seq("k"))
    val b0 = spark.range(0, 10).selectExpr("id AS k", "id AS v")
    val b1 = spark.range(5, 15).selectExpr("id AS k", "id * 2 AS v")
    write(b0, 0L)
    write(b1, 1L)
    write(b1, 1L) // crash-after-write redelivery
    write(b0, 0L) // stale replay
    assert(Snapshots.versions(tp).size == 2, "one snapshot per DISTINCT batch")
    val rows = Snapshots.readLatest(spark, tp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(rows == ((0L until 5L).map(k => (k, k)) ++ (5L until 15L).map(k => (k, k * 2))),
      rows.toString)
  }

  test("NULL keys never retract; NULL-keyed data rows survive") {
    val tp = s"${Files.createTempDirectory("graft_eq_null_")}/t"
    Snapshots.writeSnapshot(spark.sql(
      "SELECT CASE WHEN id = 2 THEN NULL ELSE id END AS k, id AS v FROM range(5)"), tp)
    Snapshots.upsertBatch(spark, tp, spark.sql(
      "SELECT CASE WHEN id = 9 THEN NULL ELSE id END AS k, id * 10 AS v FROM range(8, 10)"),
      Seq("k"))
    val vs = Snapshots.readLatest(spark, tp).collect().map(_.getLong(1)).sorted.toSeq
    // originals 0,1,3,4 + NULL-keyed original (v=2) survive; batch adds v=80 (k=8), v=90 (k=NULL)
    assert(vs == Seq(0L, 1L, 2L, 3L, 4L, 80L, 90L), vs.toString)
  }

  test("guards narrowed to the genuinely unsound: rename/streaming under eq and eras refuse; DML and sidecar mixes compose") {
    val tp = banded("grd")
    Snapshots.upsertBatch(spark, tp,
      spark.range(1, 2).selectExpr("id AS k", "id AS v"), Seq("k"))
    // STILL refused — rename eras and delta-replay streaming are the
    // genuinely unsound combinations (the merge scans resolve key
    // columns at one set of physical names; retractions don't replay)
    val ren = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.grd.t RENAME COLUMN v TO w"))
    assert(ren.getMessage.contains("equality-delete"), ren.getMessage)
    val out = Files.createTempDirectory("graft_eq_out_").toString
    val q = spark.readStream.table(s"$cat.grd.t").writeStream
      .format("parquet").option("path", out + "/data")
      .option("checkpointLocation", out + "/chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    val streamErr = intercept[Exception](q.awaitTermination(60000))
    assert(streamErr.getMessage.contains("equality-delete") ||
      Option(streamErr.getCause).exists(_.getMessage.contains("equality-delete")),
      streamErr.getMessage)
    // row-level DML now COMPOSES with live entries (r16; the full
    // lifecycle is pinned in the composition test + oracle row): the
    // rewrite materializes retractions, carried files keep the
    // surviving entries riding the CoW manifest
    spark.sql(s"DELETE FROM $cat.grd.t WHERE k = 5")
    assert(spark.sql(s"SELECT count(*) FROM $cat.grd.t").head().getLong(0) == 19)
    assert(Snapshots.liveEqDeletes(tp, Snapshots.versions(tp).last).nonEmpty,
      "the carried band still sits under the entry's bound — it must survive")
    spark.sql(s"UPDATE $cat.grd.t SET v = 0 WHERE k = 6")
    assert(spark.sql(s"SELECT v FROM $cat.grd.t WHERE k = 6").head().getLong(0) == 0L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.grd.t WHERE k = 1 AND v = 1")
      .head().getLong(0) == 1L, "the upserted row must survive DML")
    // plain INSERT (append) is allowed; OVERWRITE clears the entries
    spark.sql(s"INSERT INTO $cat.grd.t VALUES (50, 500)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.grd.t").head().getLong(0) == 20)
    spark.sql(s"INSERT OVERWRITE $cat.grd.t SELECT * FROM __eq_grd_src")
    assert(Snapshots.liveEqDeletes(tp, Snapshots.versions(tp).last).isEmpty)
    // upsert over live positional sidecars composes too (r16): the
    // retraction lands as one fast-append, the sidecars stay anchored
    val tp2 = banded("grd2")
    spark.conf.set("spark.graft.delete.mode", "merge-on-read")
    try spark.sql(s"DELETE FROM $cat.grd2.t WHERE k = 1")
    finally spark.conf.set("spark.graft.delete.mode", "copy-on-write")
    Snapshots.upsertBatch(spark, tp2,
      spark.range(2, 3).selectExpr("id AS k", "id * 100 AS v"), Seq("k"))
    assert(Snapshots.liveDeletes(tp2, Snapshots.versions(tp2).last).nonEmpty &&
      Snapshots.liveEqDeletes(tp2, Snapshots.versions(tp2).last).nonEmpty,
      "both flavors must be live at once")
    val merged = spark.sql(s"SELECT count(*) AS c, sum(v) AS s FROM $cat.grd2.t").head()
    assert(merged.getLong(0) == 19, merged) // 20 - deleted k=1; k=2 replaced
    assert(merged.getLong(1) == (0L until 20L).map(_ * 10).sum - 10L - 20L + 200L, merged)
    // upsert refuses under live rename eras
    val tp3 = banded("grd3")
    spark.sql(s"ALTER TABLE $cat.grd3.t RENAME COLUMN v TO w")
    val eras = intercept[Exception](Snapshots.upsertBatch(spark, tp3,
      spark.range(2, 3).selectExpr("id AS k", "id AS w"), Seq("k")))
    assert(eras.getMessage.contains("rename eras"), eras.getMessage)
    // float keys refuse (bitwise-equality footgun)
    val tp4 = s"${Files.createTempDirectory("graft_eq_fl_")}/t"
    Snapshots.writeSnapshot(spark.sql("SELECT CAST(id AS DOUBLE) AS k, id AS v FROM range(3)"), tp4)
    val fl = intercept[Exception](Snapshots.upsertBatch(spark, tp4,
      spark.sql("SELECT CAST(1.0 AS DOUBLE) AS k, 9 AS v"), Seq("k")))
    assert(fl.getMessage.contains("key type"), fl.getMessage)
  }

  test("composite and string keys: multi-column tuples retract exactly; partial matches survive") {
    val tp = s"${Files.createTempDirectory("graft_eq_comp_")}/t"
    Snapshots.writeSnapshot(spark.sql(
      "SELECT CAST(id % 3 AS STRING) AS region, id AS k, id * 10 AS v FROM range(9)"), tp)
    // retract ONLY ('1', 4) — rows matching one key column but not the
    // other (('1',1), ('2',4)-shaped) must survive
    Snapshots.upsertBatch(spark, tp, spark.sql(
      "SELECT '1' AS region, CAST(4 AS BIGINT) AS k, CAST(999 AS BIGINT) AS v"),
      Seq("region", "k"))
    val rows = Snapshots.readLatest(spark, tp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(t => (t._1, t._2)).toSeq
    val expect = (0L until 9L).map(i => ((i % 3).toString, i, if (i == 4) 999L else i * 10))
      .sortBy(t => (t._1, t._2))
    assert(rows == expect, rows.toString)
    // the retention interplay: expiring pre-upsert history keeps the
    // live chain (and its sidecars) intact
    Snapshots.upsertBatch(spark, tp, spark.sql(
      "SELECT '2' AS region, CAST(5 AS BIGINT) AS k, CAST(555 AS BIGINT) AS v"),
      Seq("region", "k"))
    Snapshots.expireSnapshots(spark, tp, keepLast = 1)
    assert(Snapshots.readLatest(spark, tp).count() == 9)
    assert(Snapshots.readLatest(spark, tp).filter("k = 5 AND region = '2'")
      .head().getLong(2) == 555L)
  }

  test("mixed key columns refuse at write time; DROP/retype of a live key column refuse") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.mk")
    val t = s"$cat.mk.t"
    val tp = s"$wh/mk/t"
    spark.sql(s"CREATE TABLE $t AS SELECT /*+ COALESCE(1) */ CAST(id % 3 AS STRING) AS region, id AS k, id * 10 AS v FROM range(0, 9)")
    Snapshots.upsertBatch(spark, tp, spark.sql(
      "SELECT '9' AS region, CAST(100 AS BIGINT) AS k, CAST(1 AS BIGINT) AS v"), Seq("k"))
    // a second delivery with DIFFERENT key columns would leave the
    // merge readers extracting tuples at the wrong indices — refuse
    assert(intercept[Exception](Snapshots.upsertBatch(spark, tp, spark.sql(
      "SELECT '9' AS region, CAST(101 AS BIGINT) AS k, CAST(2 AS BIGINT) AS v"),
      Seq("region", "k"))).getMessage.contains("same key columns"))
    // dropping or widening a LIVE key column would break the key-index
    // resolution / compare retraction keys across types — refuse
    assert(intercept[Exception](
      spark.sql(s"ALTER TABLE $t DROP COLUMN k"))
      .getMessage.contains("equality-delete entries retract by it"))
    assert(intercept[Exception](
      spark.sql(s"ALTER TABLE $t ALTER COLUMN k TYPE DECIMAL(20,0)"))
      .getMessage.contains("equality-delete entries retract by it"))
    // an unrelated column still drops fine under live entries
    spark.sql(s"ALTER TABLE $t DROP COLUMN region")
    assert(spark.table(t).columns.toSeq == Seq("k", "v"))
  }

  test("retractions hit rows in laid-out files: the origin parse survives layout subdirectories") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.lay")
    val t = s"$cat.lay.t"
    val tp = s"$wh/lay/t"
    // the base files live under v=1/__graft_days=K/ — an origin parse
    // keyed to the basename-adjacent v= segment would return NULL and
    // silently resurrect every retracted row in library reads
    spark.sql(s"CREATE TABLE $t (d DATE, k BIGINT, v BIGINT) PARTITIONED BY (days(d))")
    spark.sql(s"INSERT INTO $t SELECT DATE_ADD(DATE '2024-07-01', CAST(id % 3 AS INT)), id, id * 10 FROM range(0, 9)")
    Snapshots.upsertBatch(spark, tp, spark.sql(
      "SELECT DATE '2024-07-05' AS d, CAST(4 AS BIGINT) AS k, CAST(999 AS BIGINT) AS v"),
      Seq("k"))
    val expectSum = (0L until 9L).filter(_ != 4).map(_ * 10).sum + 999L
    // library read path (applyEqDeletes)
    val lib = Snapshots.readLatest(spark, tp)
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.sum("v")).collect()(0)
    assert(lib.getLong(0) == 9L && lib.getLong(1) == expectSum, lib.toString)
    // catalog read path agrees
    val sql = spark.sql(s"SELECT count(*) AS c, sum(v) AS s FROM $t WHERE k >= 0").collect()(0)
    assert(sql.getLong(0) == 9L && sql.getLong(1) == expectSum)
  }

  test("volume guards: oversized deliveries and oversized accumulations refuse loudly") {
    import spark.implicits._
    val tp = banded("vol")
    try {
      // per-delivery cap: the refusal names the conf and the
      // copy-on-write escape hatch (bulk restatements are DML's job)
      spark.conf.set("spark.graft.eq.maxKeysPerDelivery", "3")
      val e1 = intercept[IllegalArgumentException] {
        Snapshots.upsertBatch(spark, tp,
          (0L until 5L).map(k => (k, k)).toDF("k", "v"), keys = Seq("k"))
      }
      assert(e1.getMessage.contains("maxKeysPerDelivery") &&
        e1.getMessage.contains("copy-on-write"), e1.getMessage)
      assert(Snapshots.versions(tp).size == 2, "refused delivery must not commit")
      // within the cap: commits, and the key count rides the manifest
      Snapshots.upsertBatch(spark, tp,
        Seq((1L, 111L), (2L, 222L)).toDF("k", "v"), keys = Seq("k"))
      val entry = Snapshots.liveEqDeletes(tp, Snapshots.versions(tp).last).head
      assert(entry.rows == 2L, entry)
      assert(EqDeletes.entryRows(tp, entry) == 2L)
      // accumulated cap across the live chain: the refusal names compact()
      spark.conf.set("spark.graft.eq.maxAccumulatedKeys", "3")
      val e2 = intercept[IllegalArgumentException] {
        Snapshots.upsertBatch(spark, tp,
          Seq((3L, 333L), (4L, 444L)).toDF("k", "v"), keys = Seq("k"))
      }
      assert(e2.getMessage.contains("maxAccumulatedKeys") &&
        e2.getMessage.contains("compact()"), e2.getMessage)
      // compaction clears the accumulation; the same delivery then lands
      Snapshots.compact(spark, tp)
      Snapshots.upsertBatch(spark, tp,
        Seq((3L, 333L), (4L, 444L)).toDF("k", "v"), keys = Seq("k"))
      assert(kvs(s"$cat.vol.t").toMap.view.filterKeys(Set(1L, 2L, 3L, 4L)).toMap ==
        Map(1L -> 111L, 2L -> 222L, 3L -> 333L, 4L -> 444L))
    } finally {
      spark.conf.unset("spark.graft.eq.maxKeysPerDelivery")
      spark.conf.unset("spark.graft.eq.maxAccumulatedKeys")
    }
  }

  /** Non-hidden data parquet files under a version dir (sidecar dirs
    * like `_deletes`/`_eqdeletes` excluded). */
  private def dataFilesIn(dir: String): Seq[String] = {
    val root = Paths.get(dir)
    if (!Files.isDirectory(root)) Seq.empty
    else scala.util.Using.resource(Files.walk(root)) { w =>
      import scala.jdk.CollectionConverters._
      w.iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
        .map(p => root.relativize(p).toString)
        .filterNot(_.split('/').exists(_.startsWith("_")))
        .toVector
    }
  }

  test("composed lifecycle: upsert → MoR point-DELETE → MoR UPDATE, zero rewrites, no compact() between") {
    val tp = banded("lfc") // v1 [0,10), v2 [10,20); v = k*10
    // 1) keyed upsert: retract k∈{3,12}, deliver (3,333),(12,1212),(25,2525)
    Snapshots.upsertBatch(spark, tp, spark.sql(
      "SELECT * FROM VALUES (CAST(3 AS BIGINT), CAST(333 AS BIGINT)), " +
        "(12, 1212), (25, 2525) AS t(k, v)"), Seq("k")) // v3
    // 2) MoR point-DELETE k=7: positional sidecar over the live eq chain
    spark.conf.set("spark.graft.delete.mode", "merge-on-read")
    spark.conf.set("spark.graft.update.mode", "merge-on-read")
    try {
      spark.sql(s"DELETE FROM $cat.lfc.t WHERE k = 7") // v4
      val v4 = Snapshots.versions(tp).last
      assert(dataFilesIn(s"$tp/v=$v4").isEmpty,
        "MoR DELETE must write no data files (sidecar only)")
      assert(Snapshots.liveDeletes(tp, v4).nonEmpty &&
        Snapshots.liveEqDeletes(tp, v4).nonEmpty,
        "both delete flavors must be live after the MoR DELETE")
      // 3) MoR UPDATE k=15: delta op (old-row sidecar + insert delta)
      spark.sql(s"UPDATE $cat.lfc.t SET v = 999 WHERE k = 15") // v5
      val v5 = Snapshots.versions(tp).last
      assert(dataFilesIn(s"$tp/v=$v5").size == 1,
        "MoR UPDATE writes exactly the insert delta")
      assert(Snapshots.liveDeletes(tp, v5).size == 2 &&
        Snapshots.liveEqDeletes(tp, v5).size == 1,
        "both positional sidecars and the eq entry must ride the delta commit")
      // merged reads (SQL scan + library) agree on the composed state
      val expect = ((0L until 20L).filterNot(k => k == 3 || k == 7 || k == 12 || k == 15)
        .map(k => k -> k * 10) ++ Seq(3L -> 333L, 12L -> 1212L, 15L -> 999L, 25L -> 2525L))
        .sortBy(_._1)
      assert(kvs(s"$cat.lfc.t") == expect)
      assert(Snapshots.readLatest(spark, tp).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq == expect)
      // time travel through the chain stays exact
      assert(spark.sql(s"SELECT v FROM $cat.lfc.t VERSION AS OF 3 WHERE k = 15")
        .head().getLong(0) == 150L, "pre-UPDATE snapshot must show the old value")
      assert(spark.sql(s"SELECT count(*) FROM $cat.lfc.t VERSION AS OF 3 WHERE k = 7")
        .head().getLong(0) == 1L, "pre-DELETE snapshot must still hold k=7")
      assert(spark.sql(s"SELECT v FROM $cat.lfc.t VERSION AS OF 3 WHERE k = 3")
        .head().getLong(0) == 333L, "the upsert applies from v3 on")
      // filters push through the composed scan correctly
      assert(spark.sql(s"SELECT sum(v) FROM $cat.lfc.t WHERE k >= 10")
        .head().getLong(0) == expect.filter(_._1 >= 10).map(_._2).sum)
      // compaction materializes everything; values identical
      Snapshots.compact(spark, tp)
      val cv = Snapshots.versions(tp).last
      assert(Snapshots.liveDeletes(tp, cv).isEmpty &&
        Snapshots.liveEqDeletes(tp, cv).isEmpty)
      assert(kvs(s"$cat.lfc.t") == expect)
    } finally {
      spark.conf.set("spark.graft.delete.mode", "copy-on-write")
      spark.conf.set("spark.graft.update.mode", "copy-on-write")
    }
  }

  test("composition on laid-out and evolved tables: layout files take both flavors; ADD COLUMN mid-chain merges") {
    // BOTH flavors over a days-laid table: positions key refs with
    // their layout segments; eq bounds key origins through subdirs
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.cl")
    val t = s"$cat.cl.t"
    val tp = s"$wh/cl/t"
    spark.sql(s"CREATE TABLE $t (d DATE, k BIGINT, v BIGINT) PARTITIONED BY (days(d))")
    spark.sql(s"INSERT INTO $t SELECT DATE_ADD(DATE '2024-07-01', CAST(id % 3 AS INT)), id, id * 10 FROM range(0, 9)")
    Snapshots.upsertBatch(spark, tp, spark.sql(
      "SELECT DATE '2024-07-05' AS d, CAST(4 AS BIGINT) AS k, CAST(999 AS BIGINT) AS v"),
      Seq("k"))
    spark.conf.set("spark.graft.delete.mode", "merge-on-read")
    try spark.sql(s"DELETE FROM $t WHERE k = 7")
    finally spark.conf.set("spark.graft.delete.mode", "copy-on-write")
    val last = Snapshots.versions(tp).last
    assert(Snapshots.liveDeletes(tp, last).nonEmpty &&
      Snapshots.liveEqDeletes(tp, last).nonEmpty)
    val expectSum = (0L until 9L).filter(x => x != 4 && x != 7).map(_ * 10).sum + 999L
    val sql = spark.sql(s"SELECT count(*) AS c, sum(v) AS s FROM $t").collect()(0)
    assert(sql.getLong(0) == 8L && sql.getLong(1) == expectSum, sql.toString)
    val lib = Snapshots.readLatest(spark, tp)
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.sum("v")).collect()(0)
    assert(lib.getLong(0) == 8L && lib.getLong(1) == expectSum, lib.toString)

    // metadata-only ADD COLUMN mid-chain: old files are narrower than
    // the unified schema the composed scan reads — missing column
    // serves NULL, retractions and positions still land
    val t2 = s"$cat.cl.ev"
    val tp2 = s"$wh/cl/ev"
    spark.sql(s"CREATE TABLE $t2 AS SELECT /*+ COALESCE(1) */ id AS k, id * 10 AS v FROM range(0, 6)")
    Snapshots.upsertBatch(spark, tp2, spark.sql(
      "SELECT CAST(2 AS BIGINT) AS k, CAST(222 AS BIGINT) AS v"), Seq("k"))
    spark.sql(s"ALTER TABLE $t2 ADD COLUMN note STRING")
    spark.sql(s"INSERT INTO $t2 VALUES (10, 100, 'x')")
    spark.conf.set("spark.graft.delete.mode", "merge-on-read")
    try spark.sql(s"DELETE FROM $t2 WHERE k = 5")
    finally spark.conf.set("spark.graft.delete.mode", "copy-on-write")
    val r = spark.sql(
      s"SELECT count(*) AS c, sum(v) AS s, count(note) AS n FROM $t2").collect()(0)
    assert(r.getLong(0) == 6L &&
      r.getLong(1) == Seq(0L, 10L, 222L, 30L, 40L, 100L).sum &&
      r.getLong(2) == 1L, r.toString)
  }

  test("the exactly-once keyed upsert sink composes with live positional sidecars") {
    val t = s"$cat.snk.t"
    val tp = s"$wh/snk/t"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.snk")
    spark.sql(s"CREATE TABLE $t AS SELECT /*+ COALESCE(1) */ id AS k, id * 10 AS v FROM range(0, 10)")
    spark.conf.set("spark.graft.delete.mode", "merge-on-read")
    try spark.sql(s"DELETE FROM $t WHERE k = 4")
    finally spark.conf.set("spark.graft.delete.mode", "copy-on-write")
    // micro-batches through the idempotent sink land over the sidecar
    val write = Snapshots.idempotentUpsertWriter(tp, "snk_demo", Seq("k"))
    val b0 = spark.range(1, 3).selectExpr("id AS k", "id * 100 AS v")
    write(b0, 0L)
    write(b0, 0L) // redelivery skipped
    assert(Snapshots.liveDeletes(tp, Snapshots.versions(tp).last).nonEmpty &&
      Snapshots.liveEqDeletes(tp, Snapshots.versions(tp).last).nonEmpty)
    val rows = kvs(s"$cat.snk.t").toMap
    assert(!rows.contains(4L) && rows(1L) == 100L && rows(2L) == 200L &&
      rows(3L) == 30L && rows.size == 9, rows.toString)
  }

  test("entryRows fails loudly on an unreadable pre-count sidecar (never under-counts the guard)") {
    val dir = Files.createTempDirectory("graft_eq_corrupt_")
    val side = dir.resolve("v=3/_eqdeletes")
    Files.createDirectories(side)
    // a truncated parquet: magic header, no footer — the KB tail read
    // cannot recover a row count
    Files.write(side.resolve("part-00000.parquet"),
      "PAR1garbage-no-footer".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val entry = graft.sources.EqDeletes.EqDelete("v=3/_eqdeletes", Seq("k"), 2L) // rows = -1
    val e = intercept[IllegalStateException](
      graft.sources.EqDeletes.entryRows(dir.toString, entry))
    assert(e.getMessage.contains("_eqdeletes") &&
      e.getMessage.contains("under-count"), e.getMessage)
    // a manifest-counted entry never touches the sidecar
    assert(graft.sources.EqDeletes.entryRows(dir.toString,
      entry.copy(rows = 7L)) == 7L)
  }

  test("manifest codec round-trips") {
    val dels = Seq(
      EqDeletes.EqDelete("v=3/_eqdeletes", Seq("k"), 2),
      EqDeletes.EqDelete("v=5/_eqdeletes", Seq("k"), 4))
    val json = s"""{"version":5,"eqdeletes":${EqDeletes.toJson(dels)}}"""
    assert(EqDeletes.fromManifest(json) == dels)
    assert(EqDeletes.fromManifest("""{"version":5}""") == Seq.empty)
  }
}
