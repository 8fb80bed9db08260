package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{GraftCatalog, MorDeletes, Snapshots}

/** Merge-on-read positional delete files — the Iceberg
  * format-version-2 capability (reference
  * spark/jobs/bronze_ingestion.py:117): a small DELETE writes a
  * (file, pos) sidecar instead of rewriting data files; scans merge at
  * read time; compaction materializes. Pins the full lifecycle:
  * zero-rewrite commits, read-time merge under column pruning, sidecar
  * scoping (later appends are immune), stacking, interplay with
  * copy-on-write DML and retention, and the loud guards. */
class MorDeletesSpec extends AnyFunSuite {
  import TestSession.spark

  private lazy val wh = Files.createTempDirectory("graft_mor_spec_").toString
  private lazy val cat: String = {
    spark.conf.set("spark.sql.catalog.gms", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gms.warehouse", wh)
    "gms"
  }

  /** 3 single-file bands: k∈[0,10) CTAS, [10,20) append, [20,30) append. */
  private def banded(ns: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.$ns")
    spark.range(0, 30).selectExpr("id AS k", "id * 10 AS v")
      .createOrReplaceTempView(s"__mor_${ns}_src")
    spark.sql(s"CREATE TABLE $cat.$ns.t AS SELECT /*+ COALESCE(1) */ * FROM __mor_${ns}_src WHERE k < 10")
    spark.sql(s"INSERT INTO $cat.$ns.t SELECT /*+ COALESCE(1) */ * FROM __mor_${ns}_src WHERE k >= 10 AND k < 20")
    spark.sql(s"INSERT INTO $cat.$ns.t SELECT /*+ COALESCE(1) */ * FROM __mor_${ns}_src WHERE k >= 20")
    s"$wh/$ns/t"
  }

  private def morDelete(sql: String): Unit = {
    spark.conf.set("spark.graft.delete.mode", "merge-on-read")
    try { spark.sql(sql); () }
    finally spark.conf.set("spark.graft.delete.mode", "copy-on-write")
  }

  private def manifestParts(tp: String, v: Long) = {
    val m = new String(Files.readAllBytes(Paths.get(s"$tp/_meta/$v.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    (graft.sources.FileStats.fromManifest(m).getOrElse(Seq.empty),
      graft.sources.FileStats.carriedFromManifest(m))
  }

  private def ks(table: String): Seq[Long] =
    spark.sql(s"SELECT k FROM $table ORDER BY k").collect().map(_.getLong(0)).toSeq

  test("MoR DELETE: zero data files rewritten, sidecar committed, reads merge everywhere") {
    val tp = banded("basic")
    morDelete(s"DELETE FROM $cat.basic.t WHERE k IN (12, 17)")
    // commit shape: nothing rewritten, ALL 3 bands carried, 1 sidecar entry
    val (own, carried) = manifestParts(tp, 4)
    assert(own.isEmpty && carried.size == 3,
      s"MoR delete must rewrite nothing, got own=${own.size} carried=${carried.size}")
    val dels = Snapshots.liveDeletes(tp, 4)
    assert(dels.size == 1 && dels.head.dir == "v=4/_deletes")
    assert(dels.head.targets.map(t => (t.f.takeWhile(_ != '/'), t.r)) == Seq(("v=2", 2L)),
      s"one target (the middle band) with 2 positions, got ${dels.head.targets}")
    // live row_count is manifest arithmetic: 30 physical − 2 deleted
    assert(Snapshots.snapshots(spark, tp).collect()
      .map(x => (x.getLong(0), x.getLong(2))).toMap.apply(4L) == 28L)
    // SQL read (DSv2 merge scan): per-row exact
    assert(ks(s"$cat.basic.t") == (0L until 30L).filterNot(Set(12L, 17L)))
    // read-time merge under COLUMN PRUNING: a single-column projection
    // over the affected band still merges (positions need no columns)
    assert(spark.sql(s"SELECT sum(v) FROM $cat.basic.t WHERE k >= 10 AND k < 20").head().getLong(0)
      == (10L until 20L).filterNot(Set(12L, 17L)).map(_ * 10).sum)
    // library API read merges too
    assert(Snapshots.readLatest(spark, tp).count() == 28)
    // time travel: pre-delete snapshot intact, pinned post-delete view merges
    assert(spark.sql(s"SELECT count(*) FROM $cat.basic.t VERSION AS OF 3").head().getLong(0) == 30)
    assert(spark.sql(s"SELECT count(*) FROM $cat.basic.t VERSION AS OF 4").head().getLong(0) == 28)
    // SCOPING: a later append re-inserting a deleted key is IMMUNE to
    // the old sidecar (positions pin (file, pos), never values)
    spark.sql(s"INSERT INTO $cat.basic.t VALUES (12, 999)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.basic.t WHERE k = 12").head().getLong(0) == 1)
    assert(spark.sql(s"SELECT count(*) FROM $cat.basic.t").head().getLong(0) == 29)
    // CDC diff across the MoR version surfaces exactly the deletions
    val diff = Snapshots.diff(spark, tp, 3L, 4L, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(diff == Seq((12L, "DELETE"), (17L, "DELETE")), s"got ${diff.toList}")
  }

  test("MoR deletes stack; deleting an already-deleted row is a no-op; CoW DML composes") {
    val tp = banded("stack")
    morDelete(s"DELETE FROM $cat.stack.t WHERE k IN (12, 17)")
    morDelete(s"DELETE FROM $cat.stack.t WHERE k = 25")
    assert(Snapshots.liveDeletes(tp, 5).size == 2)
    assert(ks(s"$cat.stack.t") == (0L until 30L).filterNot(Set(12L, 17L, 25L)))
    // re-deleting a dead row: positions are found over the MERGED view,
    // so the sidecar comes back empty and no entry is committed
    morDelete(s"DELETE FROM $cat.stack.t WHERE k = 12")
    assert(Snapshots.liveDeletes(tp, 6).size == 2, "empty sidecar must add no entry")
    assert(spark.sql(s"SELECT count(*) FROM $cat.stack.t").head().getLong(0) == 27)
    // CoW delete DROPPING a clean band: entries retarget, counts stay live
    spark.sql(s"DELETE FROM $cat.stack.t WHERE k < 10")
    assert(Snapshots.liveDeletes(tp, 7).size == 2, "dropped band carried no positions")
    assert(spark.sql(s"SELECT count(*) FROM $cat.stack.t").head().getLong(0) == 17)
    // CoW delete REWRITING an affected band: prior positions materialize
    // into the rewrite (no resurrection) and its entry disappears
    spark.sql(s"DELETE FROM $cat.stack.t WHERE k BETWEEN 10 AND 12")
    val live = Snapshots.liveDeletes(tp, 8)
    assert(live.size == 1 && live.head.targets.forall(_.f.startsWith("v=3/")),
      s"band-2 entry must vanish with the rewrite, got $live")
    assert(ks(s"$cat.stack.t") == Seq(13L, 14L, 15L, 16L, 18L, 19L,
      20L, 21L, 22L, 23L, 24L, 26L, 27L, 28L, 29L))
    // snapshots listing stays live-count-exact across the whole chain
    assert(Snapshots.snapshots(spark, tp).collect()
      .map(x => (x.getLong(0), x.getLong(2))).toMap
      .apply(8L) == 15L)
  }

  test("compaction materializes sidecars; retention pins carried sidecar versions") {
    val tp = banded("comp")
    morDelete(s"DELETE FROM $cat.comp.t WHERE k IN (3, 12)")
    // a CoW delete AFTER the MoR delete carries the v4 sidecar forward
    // into v5's manifest while v4 itself holds no data files
    spark.sql(s"DELETE FROM $cat.comp.t WHERE k >= 20") // band-3 drop: metadata-only
    assert(Snapshots.liveDeletes(tp, 5).nonEmpty)
    // retention: keepLast=1 retains only v5, whose entries point into
    // v=4/_deletes — v4 MUST stay on disk or deleted rows resurrect
    val expired = Snapshots.expireSnapshots(spark, tp, keepLast = 1).collect()
      .filter(_.getString(2) == "expired").map(_.getLong(0)).toSeq
    assert(!expired.contains(4L), s"sidecar-hosting version must be pinned, expired=$expired")
    assert(Files.isDirectory(Paths.get(s"$tp/v=4/_deletes")))
    assert(ks(s"$cat.comp.t") == (0L until 20L).filterNot(Set(3L, 12L)))
    // compact: reads merge, writes a clean full-state snapshot
    val (cv, _, _) = Snapshots.compact(spark, tp)
    assert(Snapshots.liveDeletes(tp, cv).isEmpty, "compaction materializes deletes")
    assert(ks(s"$cat.comp.t") == (0L until 20L).filterNot(Set(3L, 12L)))
    // with no live deletes the manifest-answered count path is back
    assert(spark.sql(s"SELECT count(*) FROM $cat.comp.t").head().getLong(0) == 18)
  }

  test("UPDATE/MERGE over live sidecars merge positions: no resurrection, entries retarget") {
    val tp = banded("upd")
    morDelete(s"DELETE FROM $cat.upd.t WHERE k IN (7, 12)") // bands 1 and 2
    assert(Snapshots.liveDeletes(tp, 4).head.targets.size == 2)
    // UPDATE rewriting band 1 must NOT resurrect k=7; band-1's sidecar
    // positions die with the rewrite, band-2's survive
    spark.sql(s"UPDATE $cat.upd.t SET v = 0 WHERE k = 8")
    val live = Snapshots.liveDeletes(tp, 5)
    assert(live.flatMap(_.targets).map(_.f.takeWhile(_ != '/')) == Seq("v=2"),
      s"rewritten band's entry must die, got $live")
    assert(ks(s"$cat.upd.t") == (0L until 30L).filterNot(Set(7L, 12L)))
    assert(spark.sql(s"SELECT v FROM $cat.upd.t WHERE k = 8").head().getLong(0) == 0)
    // an UPDATE whose predicate matches ONLY a deleted row updates nothing
    spark.sql(s"UPDATE $cat.upd.t SET v = 999 WHERE k = 12")
    assert(spark.sql(s"SELECT count(*) FROM $cat.upd.t WHERE v = 999").head().getLong(0) == 0)
    assert(ks(s"$cat.upd.t") == (0L until 30L).filterNot(Set(7L, 12L)))
    // MERGE composes too: bump only live rows of the affected band
    spark.range(10, 14).selectExpr("id AS k", "id * 1000 AS nv")
      .createOrReplaceTempView("__mor_upd_src")
    spark.sql(s"""MERGE INTO $cat.upd.t t USING __mor_upd_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET t.v = s.nv""")
    val merged = spark.sql(s"SELECT k, v FROM $cat.upd.t WHERE k >= 10 AND k < 14 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(merged == Seq((10L, 10000L), (11L, 11000L), (13L, 13000L)),
      s"k=12 stays deleted through the MERGE, got $merged")
    // live row_count stays exact through the whole chain
    assert(Snapshots.snapshots(spark, tp).collect()
      .map(x => (x.getLong(0), x.getLong(2))).toMap
      .apply(Snapshots.versions(tp).last) == 28L)
  }

  test("streaming reads refuse live sidecars until compaction; count(*) stays manifest-answered") {
    val tp = banded("guard")
    morDelete(s"DELETE FROM $cat.guard.t WHERE k = 7")
    // a filterless COUNT(*) is exact from the live row_count: zero files
    val cnt = spark.sql(s"SELECT count(*) FROM $cat.guard.t")
    assert(cnt.head().getLong(0) == 29)
    val scanned = {
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      def leaves(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] =
        p.collectLeaves().flatMap {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => leaves(q.plan)
          case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
          case l => Seq(l)
        }
      leaves(cnt.queryExecution.executedPlan).flatMap {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputPartitions.flatMap {
            case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
              fp.files.map(_.filePath.toString).toSeq
            case _ => Seq.empty
          }
        case _ => Seq.empty
      }
    }
    assert(scanned.isEmpty, s"count(*) over live deletes must plan zero files, got $scanned")
    val ckpt = Files.createTempDirectory("graft_mor_stream_").toString
    val q = spark.readStream.table(s"$cat.guard.t")
      .writeStream.format("noop")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val stream = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    assert(stream.getMessage.contains("merge-on-read") ||
      Option(stream.getCause).exists(_.getMessage.contains("merge-on-read")),
      stream.getMessage)
    // compaction lifts the streaming guard
    Snapshots.compact(spark, tp)
    spark.sql(s"UPDATE $cat.guard.t SET v = 0 WHERE k = 8")
    assert(spark.sql(s"SELECT v FROM $cat.guard.t WHERE k = 8").head().getLong(0) == 0)
  }

  test("MoR on a bucketed table: refs carry the layout segment, SPJ degrades to correct plans") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.bkt")
    spark.range(0, 200).selectExpr("id AS k", "id * 3 AS v")
      .createOrReplaceTempView("__mor_bkt_src")
    spark.sql(s"CREATE TABLE $cat.bkt.t PARTITIONED BY (bucket(4, k)) AS SELECT * FROM __mor_bkt_src")
    morDelete(s"DELETE FROM $cat.bkt.t WHERE k IN (17, 99)")
    val tp = s"$wh/bkt/t"
    val dels = Snapshots.liveDeletes(tp, 2)
    assert(dels.nonEmpty &&
      dels.flatMap(_.targets).forall(_.f.contains("__graft_bucket=")),
      s"sidecar refs must carry the bucket layout segment, got $dels")
    assert(spark.sql(s"SELECT count(*) FROM $cat.bkt.t").head().getLong(0) == 198)
    assert(spark.sql(s"SELECT count(*) FROM $cat.bkt.t WHERE k IN (17, 99)").head().getLong(0) == 0)
    assert(spark.sql(s"SELECT sum(v) FROM $cat.bkt.t").head().getLong(0) ==
      (0L until 200L).filterNot(Set(17L, 99L)).map(_ * 3).sum)
    // a join is still row-correct (bucket grouping is absent while
    // sidecars live — degradation, never a wrong plan)
    spark.sql(s"CREATE TABLE $cat.bkt.r PARTITIONED BY (bucket(4, k)) AS SELECT k, v AS w FROM __mor_bkt_src")
    assert(spark.sql(s"""SELECT count(*) FROM $cat.bkt.t a JOIN $cat.bkt.r b ON a.k = b.k""")
      .head().getLong(0) == 198)
    // compaction restores the bucketed layout itself
    val (cv, _, after) = Snapshots.compact(spark, tp)
    assert(Snapshots.liveDeletes(tp, cv).isEmpty && after == 4,
      s"bucketed compaction keeps one file per bucket, got $after")
  }

  test("pinned reads across a schema evolution unify the merge scan's two halves") {
    // pre-evolution files become the AFFECTED half (narrow physical
    // schema), the post-evolution append the CLEAN half (wide) — the
    // positional union must read ONE unified schema or rows mis-join
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.evomor")
    spark.range(0, 10).selectExpr("id AS k", "id * 2 AS v")
      .createOrReplaceTempView("__mor_evo_src")
    spark.sql(s"CREATE TABLE $cat.evomor.t AS SELECT /*+ COALESCE(1) */ * FROM __mor_evo_src")
    morDelete(s"DELETE FROM $cat.evomor.t WHERE k = 3")
    spark.sql(s"ALTER TABLE $cat.evomor.t ADD COLUMN note STRING")
    spark.sql(s"INSERT INTO $cat.evomor.t VALUES (100, 200, 'wide')")
    // current read: declared schema on both halves
    val cur = spark.sql(s"SELECT k, v, note FROM $cat.evomor.t ORDER BY k").collect()
    assert(cur.length == 10 && cur.last.getString(2) == "wide" &&
      cur.take(9).forall(_.isNullAt(2)), cur.mkString(","))
    assert(!cur.map(_.getLong(0)).contains(3L))
    // pinned read AFTER the append (v3): infers the snapshot's own
    // unified schema over both eras; the deleted row stays deleted
    val pinned = spark.sql(s"SELECT k, v, note FROM $cat.evomor.t VERSION AS OF 3 ORDER BY k").collect()
    assert(pinned.length == 10 && pinned.last.getString(2) == "wide", pinned.mkString(","))
    assert(pinned.take(9).forall(r => r.isNullAt(2) && r.getLong(1) == r.getLong(0) * 2))
  }

  test("NULL-predicate rows survive a MoR delete (the r13 CoW bug class, re-pinned for positions)") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.nulls")
    spark.range(0, 12).selectExpr(
      "id AS k", "CASE WHEN id % 3 = 0 THEN NULL ELSE CAST(id % 2 AS STRING) END AS tag")
      .createOrReplaceTempView("__mor_null_src")
    spark.sql(s"CREATE TABLE $cat.nulls.t AS SELECT /*+ COALESCE(1) */ * FROM __mor_null_src")
    // DELETE WHERE tag = '1': rows whose tag is NULL evaluate the
    // predicate to NULL and MUST survive — the position job keeps only
    // rows where the condition is TRUE
    morDelete(s"DELETE FROM $cat.nulls.t WHERE tag = '1'")
    val left = spark.sql(s"SELECT k FROM $cat.nulls.t ORDER BY k").collect().map(_.getLong(0)).toSeq
    val expected = (0L until 12L).filterNot(k => k % 3 != 0 && k % 2 == 1)
    assert(left == expected, s"NULL-tag rows must survive: got $left expected $expected")
    assert(spark.sql(s"SELECT count(*) FROM $cat.nulls.t WHERE tag IS NULL").head().getLong(0) == 4)
  }

  test("a file whose every live row matches deletes fully by positions and reads empty") {
    val tp = banded("alldead")
    // a single whole-band predicate would be PROVEN all-matching by
    // the bounds (mustMatch) and dropped metadata-only in either mode;
    // two half-band deletes are each unprovable (the band straddles
    // both), so each commits a sidecar — after the second, every
    // physical row of band 2 carries a recorded position
    morDelete(s"DELETE FROM $cat.alldead.t WHERE k >= 10 AND k < 15")
    morDelete(s"DELETE FROM $cat.alldead.t WHERE k >= 15 AND k < 20")
    assert(Snapshots.liveDeletes(tp, 5).flatMap(_.targets).map(_.r).sum == 10)
    assert(ks(s"$cat.alldead.t") == ((0L until 10L) ++ (20L until 30L)))
    assert(spark.sql(s"SELECT count(*) FROM $cat.alldead.t").head().getLong(0) == 20)
    // compaction absorbs the fully-dead file
    val (cv, _, _) = Snapshots.compact(spark, tp)
    assert(Snapshots.liveDeletes(tp, cv).isEmpty)
    assert(ks(s"$cat.alldead.t") == ((0L until 10L) ++ (20L until 30L)))
  }

  test("manifest codec round-trips and retargeting drops emptied entries") {
    import MorDeletes.{DeleteFile, Target}
    val dels = Seq(
      DeleteFile("v=4/_deletes", Seq(Target("v=1/a.parquet", 3), Target("v=2/b.parquet", 2))),
      DeleteFile("v=6/_deletes", Seq(Target("v=2/b.parquet", 1))))
    val json = s"""{"version":7,"deletes":${MorDeletes.toJson(dels)}}"""
    assert(MorDeletes.fromManifest(json) == dels)
    assert(MorDeletes.fromManifest("""{"version":7}""") == Seq.empty)
    assert(MorDeletes.deletedRows(dels) == 6)
    val re = MorDeletes.retarget(dels, Set("v=2/b.parquet"))
    assert(re == Seq(
      DeleteFile("v=4/_deletes", Seq(Target("v=2/b.parquet", 2))),
      DeleteFile("v=6/_deletes", Seq(Target("v=2/b.parquet", 1)))))
    assert(MorDeletes.retarget(dels, Set.empty) == Seq.empty)
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
    leaves(df.queryExecution.executedPlan).flatMap {
      case b: BatchScanExec => b.inputPartitions.flatMap {
        case fp: FilePartition => fp.files.map(_.filePath.toString).toSeq
        case gp: graft.sources.GraftMorScan.CleanPart => gp.inner match {
          case fp: FilePartition => fp.files.map(_.filePath.toString).toSeq
          case _ => Seq.empty
        }
        case gp: graft.sources.GraftMorScan.CleanTagPart =>
          gp.inner.files.map(_.filePath.toString).toSeq
        case mp: graft.sources.GraftMorScan.MorPart =>
          mp.inner.files.map(_.filePath.toString).toSeq
        case _ => Seq.empty
      }
      case _ => Seq.empty
    }.distinct
  }

  test("planner surfaces stay live under sidecars: bounds prune files, LIMIT plans a live-row prefix") {
    val tp = banded("plan")
    // every band delete-bearing: 10 physical → 8 live rows each
    morDelete(s"DELETE FROM $cat.plan.t WHERE k IN (1, 3, 11, 13, 21, 23)")
    // date-band pruning survives live sidecars: a band-2 probe scans
    // exactly the band-2 file (carried bounds are over-approximations
    // of the live rows — sound to prune on) and merges exactly
    val probe = spark.sql(s"SELECT sum(v) AS s, count(*) AS c FROM $cat.plan.t WHERE k >= 10 AND k < 20")
    assert(scannedFiles(probe).size == 1, s"got ${scannedFiles(probe)}")
    assert(probe.head().getLong(0) ==
      (10L until 20L).filterNot(Set(11L, 13L)).map(_ * 10).sum)
    assert(probe.head().getLong(1) == 8)
    // LIMIT planning is live-row arithmetic: each file has 8 LIVE rows
    // (10 physical), so LIMIT 8 plans 1 file but LIMIT 9 must take 2 —
    // a physical-row prefix would plan 1 file (10 >= 9) and the query
    // would RETURN ONLY 8 ROWS (visible wrong answer, not just waste)
    val l8 = spark.sql(s"SELECT k FROM $cat.plan.t LIMIT 8")
    assert(l8.count() == 8)
    assert(scannedFiles(l8).size == 1, s"got ${scannedFiles(l8)}")
    val l9 = spark.sql(s"SELECT k FROM $cat.plan.t LIMIT 9")
    assert(l9.count() == 9)
    assert(scannedFiles(l9).size == 2, s"got ${scannedFiles(l9)}")
    assert(spark.sql(s"SELECT k FROM $cat.plan.t LIMIT 17").count() == 17)
    // refusal legs stay refused: min/max over an affected band must
    // SCAN (a deleted row could have held the extremum), never answer
    // from the manifest — proven by exact values after the deletes
    val mm = spark.sql(s"SELECT min(k) AS a, max(k) AS b FROM $cat.plan.t WHERE k < 10")
    assert(scannedFiles(mm).nonEmpty, "min/max under sidecars must scan, not manifest-answer")
    assert(mm.head().getLong(0) == 0 && mm.head().getLong(1) == 9)
    // and the filterless count(*) still answers from live arithmetic
    val cnt = spark.sql(s"SELECT count(*) FROM $cat.plan.t")
    assert(scannedFiles(cnt).isEmpty, "count(*) must stay a manifest read")
    assert(cnt.head().getLong(0) == 24)
  }

  test("position cache: one sidecar load per delete state, bounded LRU, no drop-recreate aliasing") {
    spark.conf.set("spark.graft.mor.positionCacheSize", "4")
    try {
      val tp = banded("cache")
      morDelete(s"DELETE FROM $cat.cache.t WHERE k IN (3, 14)")
      val loads0 = MorDeletes.sidecarLoads.get()
      assert(ks(s"$cat.cache.t").size == 28)
      val afterFirst = MorDeletes.sidecarLoads.get()
      // repeated reads of the SAME delete state never re-load (the
      // commit-uuid key needs no filesystem listing per read)
      assert(spark.sql(s"SELECT count(*) FROM $cat.cache.t").head().getLong(0) == 28)
      assert(ks(s"$cat.cache.t").size == 28)
      assert(MorDeletes.sidecarLoads.get() == afterFirst,
        "a cached delete state must not re-run the sidecar load job")
      assert(afterFirst >= loads0 + 1)
      // drop-recreate under the SAME name and version numbers: the new
      // table's delete state is a different commit uuid — the cache
      // must miss (old positions would silently mis-delete)
      spark.sql(s"DROP TABLE $cat.cache.t")
      banded("cache")
      morDelete(s"DELETE FROM $cat.cache.t WHERE k IN (5)")
      assert(ks(s"$cat.cache.t") == (0L until 30L).filterNot(_ == 5L),
        "recreated table must not inherit the dropped table's cached positions")
      // bound: cycling >4 distinct delete states through the cache
      // keeps at most 4 entries resident
      (1 to 5).foreach { i =>
        spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.cache$i")
        spark.sql(s"CREATE TABLE $cat.cache$i.t AS SELECT /*+ COALESCE(1) */ id AS k, id AS v FROM range(10)")
        morDelete(s"DELETE FROM $cat.cache$i.t WHERE k = $i")
        assert(spark.sql(s"SELECT count(*) FROM $cat.cache$i.t").head().getLong(0) == 9)
      }
      assert(MorDeletes.cachedStates <= 4,
        s"position cache must stay bounded at 4, got ${MorDeletes.cachedStates}")
    } finally spark.conf.unset("spark.graft.mor.positionCacheSize")
  }
}
