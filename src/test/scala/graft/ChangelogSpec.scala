package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Changelog, GraftCatalog, Snapshots}

/** The CDC changelog (`t.changes`, batch + streaming) — the
  * Delta-CDF-shaped surface: plain appends serve INSERTs by reference
  * (zero capture cost, spec-pinned), DML commits on changelog-enabled
  * tables capture their row-level effect at commit time, compaction
  * provably contributes nothing, and a stream crosses DML snapshots
  * with checkpoint resume — the read the plain table-as-stream
  * correctly refuses. */
class ChangelogSpec extends AnyFunSuite {
  import TestSession.spark

  private lazy val wh = Files.createTempDirectory("graft_cdc_spec_").toString
  private lazy val cat: String = {
    spark.conf.set("spark.sql.catalog.gcl", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcl.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcl.m")
    "gcl"
  }

  private def changesOf(t: String): Map[(String, Long), Seq[(Long, Long)]] =
    spark.sql(s"SELECT k, v, _change_type, _commit_version FROM $t.changes")
      .collect()
      .groupBy(r => (r.getString(2), r.getLong(3)))
      .view.mapValues(_.map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted).toMap

  test("append-only history serves INSERT changes by reference — no enablement, no capture files") {
    val t = s"$cat.m.cdc_app"
    val path = s"$wh/m/cdc_app"
    spark.sql(s"CREATE TABLE $t AS SELECT /*+ COALESCE(1) */ id AS k, id * 10 AS v FROM range(0, 3)") // v1
    spark.sql(s"INSERT INTO $t SELECT /*+ COALESCE(1) */ id, id * 10 FROM range(3, 5)") // v2
    val got = changesOf(t)
    assert(got(("INSERT", 1L)) == Seq((0L, 0L), (1L, 10L), (2L, 20L)))
    assert(got(("INSERT", 2L)) == Seq((3L, 30L), (4L, 40L)))
    assert(got.size == 2)
    // the fast path never writes capture sidecars
    assert(!Files.exists(Paths.get(path, "v=1", "_changes")) &&
      !Files.exists(Paths.get(path, "v=2", "_changes")))
  }

  test("DML lifecycle: upsert/MoR-delete/CoW-update capture exact pre/post pairs; compact contributes nothing") {
    import spark.implicits._
    val t = s"$cat.m.cdc_dml"
    val path = s"$wh/m/cdc_dml"
    spark.sql(s"CREATE TABLE $t AS SELECT /*+ COALESCE(1) */ id AS k, id * 10 AS v FROM range(0, 6)") // v1
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('graft.changelog.keys'='k')")
    assert(Changelog.keysOf(path).contains(Seq("k")))
    // v2: plain append — STILL no capture on an enabled table
    spark.sql(s"INSERT INTO $t SELECT /*+ COALESCE(1) */ id, id * 10 FROM range(6, 8)")
    assert(!Files.exists(Paths.get(path, "v=2", "_changes")),
      "plain appends must keep their zero-capture fast path")
    // v3: keyed upsert — k=1 restates (UPDATE pair), k=100 inserts
    Snapshots.upsertBatch(spark, path,
      Seq((1L, 111L), (100L, 1000L)).toDF("k", "v").coalesce(1), Seq("k"))
    // v4: MoR point-delete of k=2 — DELETE pre-image
    spark.conf.set("spark.graft.delete.mode", "merge-on-read")
    try spark.sql(s"DELETE FROM $t WHERE k = 2")
    finally spark.conf.unset("spark.graft.delete.mode")
    // v5: CoW UPDATE — k=3 takes +5 (UPDATE pair; untouched rewritten
    // rows must net out of the capture diff)
    spark.sql(s"UPDATE $t SET v = v + 5 WHERE k = 3")
    // v6: compaction — state-identical, zero changes
    Snapshots.compact(spark, path)

    val got = changesOf(t)
    assert(got(("INSERT", 1L)).size == 6 && got(("INSERT", 2L)).size == 2)
    assert(got(("UPDATE_pre", 3L)) == Seq((1L, 10L)))
    assert(got(("UPDATE_post", 3L)) == Seq((1L, 111L)))
    assert(got(("INSERT", 3L)) == Seq((100L, 1000L)))
    assert(got(("DELETE", 4L)) == Seq((2L, 20L)))
    assert(got(("UPDATE_pre", 5L)) == Seq((3L, 30L)))
    assert(got(("UPDATE_post", 5L)) == Seq((3L, 35L)))
    assert(!got.keys.exists(_._2 == 6L), "compaction must contribute no changes")
    // the changelog REPLAYS to the current state: inserts minus
    // deletes plus net updates
    val current = spark.sql(s"SELECT k, v FROM $t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val replayed = got.toSeq.flatMap { case ((tpe, _), rows) => rows.map((tpe, _)) }
    val replayState = scala.collection.mutable.Map[Long, Long]()
    got.toSeq.sortBy(_._1._2).foreach { case ((tpe, _), rows) =>
      rows.foreach { case (k, v) =>
        tpe match {
          case "INSERT" | "UPDATE_post" => replayState(k) = v
          case "DELETE"                 => replayState.remove(k); ()
          case "UPDATE_pre"             => ()
        }
      }
    }
    assert(replayState.toSet == current, s"replay=$replayState current=$current")
    assert(replayed.nonEmpty)
  }

  test("pre-enablement DML history backfills via diff-on-read once keys are declared; refusal only without keys") {
    val t = s"$cat.m.cdc_late"
    val path = s"$wh/m/cdc_late"
    spark.sql(s"CREATE TABLE $t AS SELECT /*+ COALESCE(1) */ id AS k, id AS v FROM range(0, 4)") // v1
    spark.sql(s"UPDATE $t SET v = v + 1 WHERE k = 1") // v2, NOT captured
    spark.sql(s"DELETE FROM $t WHERE k = 2")          // v3, NOT captured
    // with NO identifier keys the historical DML range refuses loudly,
    // naming the remedy (the diff has no pairing identity without keys)
    val e = intercept[Exception](spark.sql(s"SELECT * FROM $t.changes").collect())
    def msgs(x: Throwable): Seq[String] =
      Iterator.iterate(x)(_.getCause).takeWhile(_ != null).take(5)
        .map(m => Option(m.getMessage).getOrElse("")).toSeq
    assert(msgs(e).exists(_.contains("no identifier keys")), msgs(e))
    // declare keys — enable-then-stream now works on day one: the
    // historical DML versions serve as keyed diffs of adjacent states
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('graft.changelog.keys'='k')")
    spark.sql(s"UPDATE $t SET v = v + 1 WHERE k = 3") // v4, CAPTURED at write
    val got = changesOf(t)
    assert(got(("INSERT", 1L)) == Seq((0L, 0L), (1L, 1L), (2L, 2L), (3L, 3L)))
    assert(got(("UPDATE_pre", 2L)) == Seq((1L, 1L)) &&
      got(("UPDATE_post", 2L)) == Seq((1L, 2L)))
    assert(got(("DELETE", 3L)) == Seq((2L, 2L)))
    assert(got(("UPDATE_pre", 4L)) == Seq((3L, 3L)) &&
      got(("UPDATE_post", 4L)) == Seq((3L, 4L)))
    // the slow path is OBSERVABLE and scoped: backfilled versions carry
    // a _changes_diff sidecar (computed once, reused), while the
    // post-enablement version rides its write-time capture — the fast
    // path stays byte-identical
    assert(Files.isDirectory(Paths.get(path, "v=2", "_changes_diff")) &&
      !Files.isDirectory(Paths.get(path, "v=2", "_changes")))
    assert(Files.isDirectory(Paths.get(path, "v=3", "_changes_diff")))
    assert(Files.isDirectory(Paths.get(path, "v=4", "_changes")) &&
      !Files.isDirectory(Paths.get(path, "v=4", "_changes_diff")))
    // STREAMING drains the same history (offsets cross the backfilled
    // versions like any other)
    val ckpt = Files.createTempDirectory("graft_cdc_bf_ck_").toString
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long, Long)]()
    val q = spark.readStream.table(s"$t.changes").writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => seen.add((
          r.getAs[String]("_change_type"), r.getAs[Long]("_commit_version"),
          r.getAs[Long]("k"), r.getAs[Long]("v"))))
        ()
      }
      .option("checkpointLocation", s"$ckpt/ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000))
    import scala.jdk.CollectionConverters._
    val streamed = seen.asScala.toSet
    assert(streamed.contains(("UPDATE_post", 2L, 1L, 2L)) &&
      streamed.contains(("DELETE", 3L, 2L, 2L)) &&
      streamed.contains(("UPDATE_post", 4L, 3L, 4L)), streamed)
    // enablement guards: unknown key column refuses
    assert(intercept[IllegalArgumentException](
      Changelog.enableChangelog(path, Seq("nope")))
      .getMessage.contains("not a column"))
  }

  test("interplay: changelog over a days-laid-out table (capture and serve through layout subdirs)") {
    val t = s"$cat.m.cdc_lay"
    val path = s"$wh/m/cdc_lay"
    spark.sql(s"CREATE TABLE $t (d DATE, k BIGINT) PARTITIONED BY (days(d))")
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('graft.changelog.keys'='k')")
    spark.sql(s"INSERT INTO $t SELECT DATE_ADD(DATE '2024-05-01', CAST(id % 2 AS INT)), id FROM range(0, 6)") // v1
    spark.sql(s"UPDATE $t SET k = k + 100 WHERE k = 3") // v2 CoW over laid-out files
    val got = spark.sql(s"SELECT k, _change_type, _commit_version FROM $t.changes")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got.filter(_._3 == 1L).map(_._1) == (0L until 6L).toSet)
    // the UPDATE changed the IDENTIFIER key itself — the standard CDC
    // answer is an unpaired DELETE + INSERT (no UPDATE pair exists for
    // a row whose identity changed), and the carried-along rows of the
    // rewritten laid-out file still net out
    assert(got.filter(_._3 == 2L) == Set((3L, "DELETE", 2L), (103L, "INSERT", 2L)), got)
  }

  test("interplay: a branch publish on a changelog-enabled table captures the staged additions and fixes") {
    import spark.implicits._
    val t = s"$cat.m.cdc_pub"
    val path = s"$wh/m/cdc_pub"
    spark.sql(s"CREATE TABLE $t AS SELECT /*+ COALESCE(1) */ id AS k, id AS v FROM range(0, 4)") // v1
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('graft.changelog.keys'='k')")
    Snapshots.createBranch(path, "st")
    Snapshots.appendToBranch(spark, path, "st", Seq((100L, 1L), (101L, -1L)).toDF("k", "v").coalesce(1)) // v2 branch
    Snapshots.deleteFromBranch(spark, path, "st", "v < 0") // v3 branch fix
    val pv = Snapshots.fastForward(spark, path, "st") // v4 publish
    // nothing on the branch hit the main changelog until the publish;
    // the publish captures exactly the NET staged effect
    val got = spark.sql(s"SELECT k, _change_type, _commit_version FROM $t.changes")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got.count(_._3 == 1L) == 4)
    assert(got.filter(_._3 > 1L) == Set((100L, "INSERT", pv)), got)
  }

  test("batch range options (startingVersion/endingVersion, inclusive) slice the changelog") {
    val t = s"$cat.m.cdc_rng"
    spark.sql(s"CREATE TABLE $t AS SELECT /*+ COALESCE(1) */ id AS k, id AS v FROM range(0, 2)") // v1
    spark.sql(s"INSERT INTO $t SELECT /*+ COALESCE(1) */ id, id FROM range(10, 12)")             // v2
    spark.sql(s"INSERT INTO $t SELECT /*+ COALESCE(1) */ id, id FROM range(20, 22)")             // v3
    val sliced = spark.read.option("startingVersion", "2").option("endingVersion", "2")
      .table(s"$t.changes").collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(sliced == Set((10L, 2L), (11L, 2L)), sliced)
    val from2 = spark.read.option("startingVersion", "2").table(s"$t.changes").count()
    assert(from2 == 4L)
    assert(intercept[IllegalArgumentException](
      spark.read.option("startingVersion", "abc").table(s"$t.changes").collect())
      .getMessage.contains("snapshot version number"))
  }

  test("retention that expired requested history refuses the changelog read (no silent double-count)") {
    val t = s"$cat.m.cdc_exp"
    val path = s"$wh/m/cdc_exp"
    spark.sql(s"CREATE TABLE $t AS SELECT /*+ COALESCE(1) */ id AS k, id AS v FROM range(0, 2)") // v1
    spark.sql(s"INSERT INTO $t SELECT /*+ COALESCE(1) */ id, id FROM range(10, 12)") // v2
    Snapshots.compact(spark, path) // v3 seals the chain
    Snapshots.expireSnapshots(spark, path, keepLast = 1) // v1, v2 gone
    // a stale range into the expired interval refuses loudly…
    val e = intercept[Exception](spark.read.option("startingVersion", "2")
      .table(s"$t.changes").collect())
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(5).map(_.getMessage).toSeq
    assert(msgs(e).exists(m => m != null && m.contains("retention expired")), msgs(e))
    // the LIBRARY batch range (the path IncrementalMart.refresh folds)
    // carries the same guard: a marker inside the expired interval
    // must refuse, never silently serve the oldest survivor as a
    // full-state INSERT set (that would double-apply the base into
    // any incremental consumer and corrupt its mart permanently)
    val e2 = intercept[IllegalStateException](
      Changelog.readRange(spark, path, 1L, 3L).collect())
    assert(e2.getMessage.contains("retention expired"), e2.getMessage)
    // …while a fresh read serves the oldest survivor as the initial
    // INSERT set (correct re-sync semantics from offset 0)
    val fresh = spark.sql(s"SELECT _change_type, _commit_version FROM $t.changes")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(fresh == Set(("INSERT", 3L)), fresh)
  }

  test("rename history refuses changelog capture and pre-boundary serving, loudly") {
    val t = s"$cat.m.cdc_ren"
    val path = s"$wh/m/cdc_ren"
    spark.sql(s"CREATE TABLE $t AS SELECT /*+ COALESCE(1) */ id AS k, id AS v FROM range(0, 4)") // v1
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('graft.changelog.keys'='k')")
    spark.sql(s"ALTER TABLE $t RENAME COLUMN v TO val") // metadata-only, eras now live
    // capture over live eras would read pre-rename files as NULL —
    // the DML refuses toward compact(), never mis-captures
    val e = intercept[Exception](spark.sql(s"UPDATE $t SET val = val + 1 WHERE k = 1"))
    def msgs(th: Throwable): Seq[String] =
      Iterator.iterate(th)(_.getCause).takeWhile(_ != null).take(6).map(_.getMessage).toSeq
    assert(msgs(e).exists(m => m != null && m.contains("rename eras are live")), msgs(e))
    // pre-boundary history refuses the read, named
    val e2 = intercept[Exception](spark.sql(s"SELECT * FROM $t.changes").collect())
    assert(msgs(e2).exists(m => m != null && m.contains("predates a column rename")), msgs(e2))
    // post-compaction, post-boundary serving works again
    Snapshots.compact(spark, path) // v2: rewrites under current names
    spark.sql(s"UPDATE $t SET val = val + 1 WHERE k = 1") // v3: captured
    val got = spark.read.option("startingVersion", (3L).toString)
      .table(s"$t.changes").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("val"), r.getAs[String]("_change_type"))).toSet
    assert(got == Set((1L, 1L, "UPDATE_pre"), (1L, 2L, "UPDATE_post")), got)
  }

  test("column pruning reaches the changelog's inner parquet scans (every projection shape)") {
    val t = s"$cat.m.cdc_prune"
    spark.sql(s"CREATE TABLE $t AS SELECT /*+ COALESCE(1) */ id AS k, id * 10 AS v, CAST(id AS STRING) AS w FROM range(0, 3)") // v1
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('graft.changelog.keys'='k')")
    spark.sql(s"UPDATE $t SET v = v + 1 WHERE k = 1") // v2 captured
    // one data column + version (insert groups: both meta are consts)
    val kv = spark.sql(s"SELECT k, _commit_version FROM $t.changes")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(kv == Seq((0L, 1L), (1L, 1L), (1L, 2L), (1L, 2L), (2L, 1L)), kv)
    // type only (capture groups read it from file, inserts const)
    val types = spark.sql(s"SELECT _change_type FROM $t.changes")
      .collect().map(_.getString(0)).groupBy(identity).view.mapValues(_.length).toMap
    assert(types == Map("INSERT" -> 3, "UPDATE_pre" -> 1, "UPDATE_post" -> 1), types)
    // a bare count (no columns at all)
    assert(spark.sql(s"SELECT count(*) FROM $t.changes").collect()(0).getLong(0) == 5L)
    // the plan's parquet ReadSchema carries only the requested data
    // columns — w never loads for the k+version projection
    val plan = spark.sql(s"SELECT k, _commit_version FROM $t.changes")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("w"), "unrequested data column leaked into the scan:\n" + plan)
  }

  test("replay invariant: folding the changelog in version order reconstructs the final state across a mixed DML history") {
    import spark.implicits._
    val t = s"$cat.m.cdc_replay"
    val path = s"$wh/m/cdc_replay"
    spark.sql(s"CREATE TABLE $t AS SELECT /*+ COALESCE(1) */ id AS k, id AS v FROM range(0, 10)")
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('graft.changelog.keys'='k')")
    // a deterministic mixed history: appends, upserts, MoR deletes,
    // CoW updates, a MERGE, a truncating delete band, a compaction
    spark.sql(s"INSERT INTO $t SELECT /*+ COALESCE(1) */ id, id FROM range(10, 14)")
    Snapshots.upsertBatch(spark, path,
      Seq((2L, 222L), (50L, 500L)).toDF("k", "v").coalesce(1), Seq("k"))
    spark.conf.set("spark.graft.delete.mode", "merge-on-read")
    try spark.sql(s"DELETE FROM $t WHERE k IN (3, 11)")
    finally spark.conf.unset("spark.graft.delete.mode")
    spark.sql(s"UPDATE $t SET v = v * 2 WHERE k BETWEEN 5 AND 7")
    Seq((6L, 66L), (60L, 600L)).toDF("k", "v").createOrReplaceTempView("cdc_replay_src")
    spark.sql(s"MERGE INTO $t tgt USING cdc_replay_src src ON tgt.k = src.k " +
      "WHEN MATCHED THEN UPDATE SET v = src.v WHEN NOT MATCHED THEN INSERT (k, v) VALUES (src.k, src.v)")
    spark.sql(s"DELETE FROM $t WHERE k >= 12 AND k <= 13")
    Snapshots.compact(spark, path)
    Snapshots.upsertBatch(spark, path,
      Seq((0L, 1000L)).toDF("k", "v").coalesce(1), Seq("k"))

    val state = scala.collection.mutable.Map[Long, Long]()
    spark.sql(s"SELECT k, v, _change_type, _commit_version FROM $t.changes")
      .collect()
      .sortBy(r => (r.getLong(3), r.getString(2) == "INSERT" || r.getString(2) == "UPDATE_post"))
      .foreach { r =>
        r.getString(2) match {
          case "INSERT" | "UPDATE_post" => state(r.getLong(0)) = r.getLong(1)
          case "DELETE"                 => state.remove(r.getLong(0)); ()
          case "UPDATE_pre"             => ()
        }
      }
    val current = spark.sql(s"SELECT k, v FROM $t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(state.toMap == current,
      s"replayed=${state.toMap.toSeq.sorted} current=${current.toSeq.sorted}")
  }

  test("streaming: the changelog stream crosses DML snapshots and resumes from its checkpoint") {
    import spark.implicits._
    val t = s"$cat.m.cdc_stream"
    val path = s"$wh/m/cdc_stream"
    spark.sql(s"CREATE TABLE $t AS SELECT /*+ COALESCE(1) */ id AS k, id * 10 AS v FROM range(0, 4)") // v1
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('graft.changelog.keys'='k')")
    Snapshots.upsertBatch(spark, path,
      Seq((0L, 7L)).toDF("k", "v").coalesce(1), Seq("k")) // v2: UPDATE pair
    spark.sql(s"UPDATE $t SET v = v + 1 WHERE k = 3")      // v3: UPDATE pair

    val ckpt = Files.createTempDirectory("graft_cdc_ck_").toString
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long, Long)]()
    def drain(): Unit = {
      val q = spark.readStream.table(s"$t.changes").writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach(r => seen.add((
            r.getAs[String]("_change_type"), r.getAs[Long]("_commit_version"),
            r.getAs[Long]("k"), r.getAs[Long]("v"))))
          ()
        }
        .option("checkpointLocation", s"$ckpt/ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      if (!q.awaitTermination(120000)) {
        q.stop()
        throw new IllegalStateException("changelog drain did not finish in 120s")
      }
    }
    drain()
    import scala.jdk.CollectionConverters._
    val p1 = seen.asScala.toSet
    assert(p1.contains(("INSERT", 1L, 0L, 0L)) && p1.contains(("INSERT", 1L, 3L, 30L)))
    assert(p1.contains(("UPDATE_pre", 2L, 0L, 0L)) && p1.contains(("UPDATE_post", 2L, 0L, 7L)))
    assert(p1.contains(("UPDATE_pre", 3L, 3L, 30L)) && p1.contains(("UPDATE_post", 3L, 3L, 31L)))
    assert(p1.size == 4 + 4, p1.toString) // 4 inserts + 2 UPDATE pairs

    // while the stream is down: one plain append + one MoR delete
    seen.clear()
    spark.sql(s"INSERT INTO $t SELECT /*+ COALESCE(1) */ id, id * 10 FROM range(10, 12)") // v4
    spark.conf.set("spark.graft.delete.mode", "merge-on-read")
    try spark.sql(s"DELETE FROM $t WHERE k = 1")
    finally spark.conf.unset("spark.graft.delete.mode") // v5
    drain()
    val p2 = seen.asScala.toSet
    assert(p2 == Set(
      ("INSERT", 4L, 10L, 100L), ("INSERT", 4L, 11L, 110L),
      ("DELETE", 5L, 1L, 10L)), p2.toString)
  }
}
