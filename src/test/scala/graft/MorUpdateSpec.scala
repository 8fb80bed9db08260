package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{GraftCatalog, MorDeletes, Snapshots}

/** Merge-on-read UPDATE / MERGE — the delta-based row-level operation
  * ([[graft.sources.GraftDeltaOperation]], Spark's `SupportsDelta`
  * contract): an UPDATE commits one positional-delete sidecar for the
  * old rows plus one fast-append delta of the new rows, rewriting ZERO
  * data files; MERGE decomposes matched/not-matched the same way.
  * Pins the zero-rewrite commit shape, row exactness across reads /
  * time travel / compaction, composition with prior sidecars and with
  * the copy-on-write fallback, and NULL-predicate semantics. */
class MorUpdateSpec extends AnyFunSuite {
  import TestSession.spark

  private lazy val wh = Files.createTempDirectory("graft_moru_spec_").toString
  private lazy val cat: String = {
    spark.conf.set("spark.sql.catalog.gmu", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmu.warehouse", wh)
    "gmu"
  }

  /** 3 single-file bands: k∈[0,10) CTAS, [10,20) append, [20,30) append. */
  private def banded(ns: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.$ns")
    spark.range(0, 30).selectExpr("id AS k", "id * 10 AS v")
      .createOrReplaceTempView(s"__moru_${ns}_src")
    spark.sql(s"CREATE TABLE $cat.$ns.t AS SELECT /*+ COALESCE(1) */ * FROM __moru_${ns}_src WHERE k < 10")
    spark.sql(s"INSERT INTO $cat.$ns.t SELECT /*+ COALESCE(1) */ * FROM __moru_${ns}_src WHERE k >= 10 AND k < 20")
    spark.sql(s"INSERT INTO $cat.$ns.t SELECT /*+ COALESCE(1) */ * FROM __moru_${ns}_src WHERE k >= 20")
    s"$wh/$ns/t"
  }

  private def mor[A](verb: String)(body: => A): A = {
    spark.conf.set(s"spark.graft.$verb.mode", "merge-on-read")
    try body
    finally spark.conf.set(s"spark.graft.$verb.mode", "copy-on-write")
  }

  private def manifestParts(tp: String, v: Long) = {
    val m = new String(Files.readAllBytes(Paths.get(s"$tp/_meta/$v.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    (graft.sources.FileStats.fromManifest(m).getOrElse(Seq.empty),
      graft.sources.FileStats.carriedFromManifest(m))
  }

  private def kvs(table: String): Seq[(Long, Long)] =
    spark.sql(s"SELECT k, v FROM $table ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("MoR UPDATE: zero data files rewritten — sidecar for old rows, fast-append delta for new") {
    val tp = banded("upd")
    mor("update")(spark.sql(s"UPDATE $cat.upd.t SET v = v + 1 WHERE k IN (12, 17)"))
    val (own, carried) = manifestParts(tp, 4)
    // own files hold ONLY the 2 updated rows; all 3 bands carried
    assert(own.map(_.rows).sum == 2 && carried.size == 3,
      s"update must rewrite nothing: own_rows=${own.map(_.rows).sum} carried=${carried.size}")
    val dels = Snapshots.liveDeletes(tp, 4)
    assert(dels.size == 1 && dels.head.dir == "v=4/_deletes")
    assert(dels.head.targets.map(t => (t.f.takeWhile(_ != '/'), t.r)) == Seq(("v=2", 2L)),
      s"2 positions against the middle band, got ${dels.head.targets}")
    // live row_count is unchanged (2 deleted + 2 inserted)
    assert(Snapshots.snapshots(spark, tp).collect()
      .map(x => (x.getLong(0), x.getLong(2))).toMap.apply(4L) == 30L)
    // per-row exact: only 12 and 17 bumped
    assert(kvs(s"$cat.upd.t") ==
      (0L until 30L).map(k => (k, k * 10 + (if (k == 12 || k == 17) 1 else 0))))
    // time travel: pre-update snapshot intact
    assert(spark.sql(s"SELECT sum(v) FROM $cat.upd.t VERSION AS OF 3").head().getLong(0)
      == (0L until 30L).map(_ * 10).sum)
    // compaction materializes: sidecars gone, values keep
    val (cv, _, _) = Snapshots.compact(spark, tp, targetFileBytes = 1L << 40)
    assert(Snapshots.liveDeletes(tp, cv).isEmpty)
    assert(kvs(s"$cat.upd.t") ==
      (0L until 30L).map(k => (k, k * 10 + (if (k == 12 || k == 17) 1 else 0))))
  }

  test("MoR UPDATE composes with a prior MoR DELETE: skipped rows are never re-targeted") {
    val tp = banded("stack")
    mor("delete")(spark.sql(s"DELETE FROM $cat.stack.t WHERE k = 12"))
    mor("update")(spark.sql(s"UPDATE $cat.stack.t SET v = 0 WHERE k >= 11 AND k <= 13"))
    // v5 carries both sidecars: the delete's (1 pos) and the update's
    // (2 pos — k=12 is already dead and must NOT be re-deleted)
    val dels = Snapshots.liveDeletes(tp, 5)
    assert(dels.map(d => (d.dir, d.targets.map(_.r).sum)).sortBy(_._1) ==
      Seq(("v=4/_deletes", 1L), ("v=5/_deletes", 2L)), dels.toString)
    val expect = (0L until 30L).filterNot(_ == 12)
      .map(k => (k, if (k == 11 || k == 13) 0L else k * 10))
    assert(kvs(s"$cat.stack.t") == expect)
    // zero rewrites in both commits
    assert(manifestParts(tp, 4)._1.isEmpty && manifestParts(tp, 5)._1.map(_.rows).sum == 2)
  }

  test("MoR MERGE: matched-update + matched-delete + not-matched-insert, zero rewrites") {
    val tp = banded("mrg")
    spark.range(0, 40).selectExpr("id AS k", "id * 100 AS nv")
      .filter("k IN (5, 15, 35)") // update 5 & 15, insert 35
      .createOrReplaceTempView("__moru_mrg_updates")
    mor("merge")(spark.sql(s"""
      MERGE INTO $cat.mrg.t t
      USING __moru_mrg_updates s
      ON t.k = s.k
      WHEN MATCHED AND s.k = 15 THEN DELETE
      WHEN MATCHED THEN UPDATE SET t.v = s.nv
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.nv)"""))
    val (own, carried) = manifestParts(tp, 4)
    assert(carried.size == 3, s"all bands carried, got ${carried.size}")
    // own files hold the updated row (5) + the inserted row (35)
    assert(own.map(_.rows).sum == 2, s"own rows ${own.map(_.rows).sum}")
    // sidecar: 2 positions (5 updated → old row deleted; 15 deleted)
    val dels = Snapshots.liveDeletes(tp, 4)
    assert(MorDeletes.deletedRows(dels) == 2, dels.toString)
    val expect = ((0L until 30L).filterNot(_ == 15).map(k =>
      (k, if (k == 5) 500L else k * 10)) :+ (35L, 3500L)).sortBy(_._1)
    assert(kvs(s"$cat.mrg.t") == expect)
    // row count arithmetic: 30 − 2 deleted + 2 inserted
    assert(Snapshots.snapshots(spark, tp).collect()
      .map(x => (x.getLong(0), x.getLong(2))).toMap.apply(4L) == 30L)
  }

  test("MoR MERGE with NOT MATCHED BY SOURCE: unreferenced target rows delete by position, zero rewrites") {
    val tp = banded("nmbs")
    // source holds only k in [5, 25): everything else in the target is
    // NOT MATCHED BY SOURCE and deletes — positions across ALL bands
    spark.range(5, 25).selectExpr("id AS k", "id * 100 AS nv")
      .createOrReplaceTempView("__moru_nmbs_src")
    mor("merge")(spark.sql(s"""
      MERGE INTO $cat.nmbs.t t
      USING __moru_nmbs_src s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET t.v = s.nv
      WHEN NOT MATCHED BY SOURCE THEN DELETE"""))
    val (own, carried) = manifestParts(tp, 4)
    assert(carried.size == 3, s"all bands carried, got ${carried.size}")
    // matched = k 5..24 (20 rows, delete+reinsert); not matched by
    // source = k 0..4 and 25..29 (10 rows, delete) — own rows are the
    // 20 reinserts, deletes are 30 positions: the whole prior table is
    // either updated or deleted, with zero files rewritten
    assert(own.map(_.rows).sum == 20, s"own rows ${own.map(_.rows).sum}")
    val dels = Snapshots.liveDeletes(tp, 4)
    assert(MorDeletes.deletedRows(dels) == 30, dels.toString)
    assert(kvs(s"$cat.nmbs.t") == (5L until 25L).map(k => (k, k * 100)))
    // row count arithmetic: 30 physical carried − 30 deleted + 20 inserted
    assert(Snapshots.snapshots(spark, tp).collect()
      .map(x => (x.getLong(0), x.getLong(2))).toMap.apply(4L) == 20L)
    // compaction materializes to the same state
    Snapshots.compact(spark, tp, targetFileBytes = 1L << 40)
    assert(kvs(s"$cat.nmbs.t") == (5L until 25L).map(k => (k, k * 100)))
  }

  test("MoR UPDATE falls back to copy-on-write under live rename eras") {
    val tp = banded("eras")
    spark.sql(s"ALTER TABLE $cat.eras.t RENAME COLUMN v TO amount")
    mor("update")(spark.sql(s"UPDATE $cat.eras.t SET amount = 0 WHERE k = 12"))
    // the positional path is era-unaware: the op must have fallen back
    // to the era-aware CoW rewrite (no sidecar, one band rewritten)
    assert(Snapshots.liveDeletes(tp, Snapshots.versions(tp).last).isEmpty,
      "MoR update under live eras must fall back to copy-on-write")
    val (own, carried) = manifestParts(tp, Snapshots.versions(tp).last)
    assert(own.map(_.rows).sum == 10 && carried.size == 2,
      s"one band rewritten era-aware, two carried: own=${own.map(_.rows).sum} carried=${carried.size}")
    assert(spark.sql(s"SELECT amount FROM $cat.eras.t WHERE k = 12").head().getLong(0) == 0)
  }

  test("NULL-predicate rows survive a MoR UPDATE (condition NULL is not a match)") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.nul")
    spark.sql(s"CREATE TABLE $cat.nul.t AS SELECT /*+ COALESCE(1) */ " +
      "CASE WHEN id = 2 THEN NULL ELSE id END AS k, id * 10 AS v FROM range(5)")
    mor("update")(spark.sql(s"UPDATE $cat.nul.t SET v = -1 WHERE k < 3"))
    val rows = spark.sql(s"SELECT v FROM $cat.nul.t ORDER BY v").collect().map(_.getLong(0)).toSeq
    // k=0,1 updated; k=NULL (id 2), 3, 4 untouched
    assert(rows == Seq(-1L, -1L, 20L, 30L, 40L), rows.toString)
  }

  test("UPDATE falls back to copy-on-write when the mode is off; carried stats stay prunable") {
    val tp = banded("cow")
    spark.sql(s"UPDATE $cat.cow.t SET v = v + 1 WHERE k = 12")
    val (own, carried) = manifestParts(tp, 4)
    // copy-on-write: the straddled band REWRITES (10 rows), others carried
    assert(own.map(_.rows).sum == 10 && carried.size == 2,
      s"CoW update must rewrite the band: own_rows=${own.map(_.rows).sum} carried=${carried.size}")
    assert(Snapshots.liveDeletes(tp, 4).isEmpty)
  }

  test("MoR UPDATE with zero matches commits metadata-only (no sidecar entry, no data files)") {
    val tp = banded("zero")
    mor("update")(spark.sql(s"UPDATE $cat.zero.t SET v = 0 WHERE k = 999"))
    val vs = Snapshots.versions(tp)
    // the write still commits a (fully-carried) version; nothing changed
    assert(vs.last == 4)
    val (own, carried) = manifestParts(tp, 4)
    assert(own.isEmpty && carried.size == 3 && Snapshots.liveDeletes(tp, 4).isEmpty)
    assert(kvs(s"$cat.zero.t") == (0L until 30L).map(k => (k, k * 10)))
  }
}
