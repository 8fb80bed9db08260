package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{GraftCatalog, Snapshots}

/** Branch refs — the Iceberg write-audit-publish staging shape:
  * `createBranch` forks at the current version, `appendToBranch`
  * fast-appends deltas INVISIBLE to every main read, `readBranch`
  * serves the audit frame, and `fastForward` publishes the whole
  * branch state to main as ONE zero-copy metadata commit (the
  * carried-refs shape pruned CoW commits use). Version numbers come
  * from one shared sequence so data directories never collide. */
class BranchesSpec extends AnyFunSuite {
  import TestSession.spark

  private lazy val wh = Files.createTempDirectory("graft_branch_spec_").toString
  private lazy val cat: String = {
    spark.conf.set("spark.sql.catalog.gbr", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gbr.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gbr.m")
    "gbr"
  }

  test("write-audit-publish: branch writes invisible to main, fast-forward is zero-copy, shared version sequence") {
    val t = s"$cat.m.wap"
    val path = s"$wh/m/wap"
    spark.sql(s"CREATE TABLE $t AS SELECT /*+ COALESCE(1) */ id AS k FROM range(0, 10)") // v1
    val base = Snapshots.createBranch(path, "staging")
    assert(base == 1L)

    import spark.implicits._
    val b2 = Snapshots.appendToBranch(spark, path, "staging",
      (10L until 20L).toDF("k").coalesce(1)) // v2 on the branch
    val b3 = Snapshots.appendToBranch(spark, path, "staging",
      (20L until 25L).toDF("k").coalesce(1)) // v3 on the branch
    assert((b2, b3) == ((2L, 3L)))

    // main is branch-blind: versions, reads, metadata tables
    assert(Snapshots.versions(path) == Seq(1L))
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) == 10L)
    assert(spark.sql(s"SELECT count(*) FROM $t.snapshots").collect()(0).getLong(0) == 1L)
    // the branch rides t.refs with its fork base
    assert(spark.sql(s"SELECT type, version FROM $t.refs WHERE name = 'staging'")
      .collect()(0).toSeq == Seq("branch", 1L))

    // the audit frame sees base + both deltas
    val audit = Snapshots.readBranch(spark, path, "staging")
    assert(audit.count() == 25L)
    assert(audit.agg(org.apache.spark.sql.functions.sum("k")).collect()(0).getLong(0)
      == (0L until 25L).sum)
    // SQL branch read (Iceberg's VERSION AS OF '<branch>') agrees,
    // with pushdown intact (filtered count through the stock scan)
    val sqlBranch = spark.sql(
      s"SELECT count(*) AS c, sum(k) AS s FROM $t VERSION AS OF 'staging' WHERE k >= 10")
      .collect()(0)
    assert(sqlBranch.getLong(0) == 15L && sqlBranch.getLong(1) == (10L until 25L).sum)

    // a MAIN write while the branch exists takes the NEXT shared
    // version (no directory collision) — and makes the branch
    // unpublishable (divergence)
    // ... but first: publish cleanly.
    val mainV = Snapshots.fastForward(spark, path, "staging")
    assert(mainV == 4L)
    // zero-copy: v=4 holds no data files, the manifest carries refs
    assert(scala.util.Using.resource(Files.walk(Paths.get(path, "v=4"))) { w =>
      import scala.jdk.CollectionConverters._
      !w.iterator().asScala.exists(_.getFileName.toString.endsWith(".parquet"))
    })
    val manifest = new String(Files.readAllBytes(
      Paths.get(path, "_meta", "4.json")))
    assert(manifest.contains("\"operation\":\"publish\"") && manifest.contains("\"carried\""))
    // main now reads the full published state, exactly
    val r = spark.sql(s"SELECT count(*) AS c, sum(k) AS s FROM $t").collect()(0)
    assert(r.getLong(0) == 25L && r.getLong(1) == (0L until 25L).sum)
    // the branch is consumed; time travel to the pre-publish main works
    assert(Snapshots.branchesOf(path).isEmpty)
    assert(spark.sql(s"SELECT count(*) FROM $t VERSION AS OF 1").collect()(0).getLong(0) == 10L)
    // count(*) above proves rows; also pin manifest arithmetic:
    // row_count in the publish manifest equals the physical total
    assert("\"row_count\":(\\d+)".r.findFirstMatchIn(manifest).get.group(1).toLong == 25L)
  }

  test("divergence: a main commit after the fork refuses fast-forward; branch stays readable; drop reclaims") {
    val t = s"$cat.m.div"
    val path = s"$wh/m/div"
    spark.sql(s"CREATE TABLE $t AS SELECT id AS k FROM range(0, 5)") // v1
    Snapshots.createBranch(path, "exp")
    import spark.implicits._
    Snapshots.appendToBranch(spark, path, "exp", (5L until 8L).toDF("k")) // v2 (branch)
    spark.sql(s"INSERT INTO $t SELECT id FROM range(100, 102)")           // v3 (main!)
    assert(Snapshots.versions(path) == Seq(1L, 3L))
    assert(intercept[Exception](Snapshots.fastForward(spark, path, "exp"))
      .getMessage.contains("advanced past its fork base"))
    // the branch audit frame still reads (fork-base state + delta)
    assert(Snapshots.readBranch(spark, path, "exp").count() == 8L)
    // dropping deletes the unreferenced branch directory
    Snapshots.dropBranch(spark, path, "exp")
    assert(!Files.exists(Paths.get(path, "v=2")))
    assert(Snapshots.branchesOf(path).isEmpty)
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) == 7L)
  }

  test("retention pins a live branch's fork-base chain; publish survives expiry; dropped-after-publish dirs stay") {
    val t = s"$cat.m.ret"
    val path = s"$wh/m/ret"
    spark.sql(s"CREATE TABLE $t AS SELECT id AS k FROM range(0, 6)")  // v1
    spark.sql(s"INSERT INTO $t SELECT id FROM range(6, 12)")          // v2 (append)
    Snapshots.createBranch(path, "hold")
    import spark.implicits._
    Snapshots.appendToBranch(spark, path, "hold", (12L until 15L).toDF("k")) // v3 (branch)
    spark.sql(s"INSERT INTO $t SELECT id FROM range(100, 103)")       // v4 main — diverges
    Snapshots.compact(spark, path)                                    // v5 seals main
    // keepLast=1 would reap v1..v4, but the branch still reads v1+v2
    Snapshots.expireSnapshots(spark, path, keepLast = 1).collect()
    assert(Snapshots.versions(path).contains(1L) && Snapshots.versions(path).contains(2L))
    assert(Snapshots.readBranch(spark, path, "hold").count() == 15L)
    Snapshots.dropBranch(spark, path, "hold")
    // with the branch gone the chain is ordinary again
    Snapshots.expireSnapshots(spark, path, keepLast = 1).collect()
    assert(Snapshots.versions(path) == Seq(5L))

    // publish-then-expire: carried branch dirs are pinned like any ref
    Snapshots.createBranch(path, "pub")
    Snapshots.appendToBranch(spark, path, "pub", (200L until 203L).toDF("k"))
    val pubV = Snapshots.fastForward(spark, path, "pub")
    Snapshots.expireSnapshots(spark, path, keepLast = 1).collect()
    val r = spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0)
    assert(r == 15L + 3L) // 12 original + 3 main append = 15 post-compact, + 3 published
    assert(Snapshots.versions(path).last == pubV)
  }

  test("guards: duplicate/bad names, rename refuses while branches live; delete-bearing bases branch fine (r17)") {
    val t = s"$cat.m.g"
    val path = s"$wh/m/g"
    // ONE file holding several rows, so the MoR delete below is a
    // partial-file retraction (a fully-dead file would drop
    // metadata-only and leave nothing live to compose over)
    spark.sql(s"CREATE TABLE $t AS SELECT /*+ COALESCE(1) */ id AS k FROM range(1, 5)")
    assert(intercept[Exception](Snapshots.createBranch(path, "7"))
      .getMessage.contains("not be all digits"))
    Snapshots.createBranch(path, "b1")
    assert(intercept[Exception](Snapshots.createBranch(path, "b1"))
      .getMessage.contains("already exists"))
    assert(intercept[Exception](
      spark.sql(s"ALTER TABLE $t RENAME COLUMN k TO kk"))
      .getMessage.contains("while branches exist"))
    Snapshots.dropBranch(spark, path, "b1")
    // r17: live positional sidecars no longer refuse branching — the
    // branch read is the composed merge scan (the full lifecycle is
    // pinned in the delete-bearing-base test); rename eras still do
    spark.conf.set("spark.graft.delete.mode", "merge-on-read")
    try spark.sql(s"DELETE FROM $t WHERE k = 1")
    finally spark.conf.set("spark.graft.delete.mode", "copy-on-write")
    Snapshots.createBranch(path, "b2")
    assert(Snapshots.readBranch(spark, path, "b2").count() == 3L)
    Snapshots.dropBranch(spark, path, "b2")
  }

  test("wapPublish: a failing audit leaves main untouched and the branch inspectable; a clean one publishes") {
    import graft.quality.DataChecks
    val t = s"$cat.m.wp"
    val path = s"$wh/m/wp"
    spark.sql(s"CREATE TABLE $t AS SELECT id AS k FROM range(0, 6)")
    Snapshots.createBranch(path, "staging")
    import spark.implicits._
    // stage a bad batch: duplicate keys
    Snapshots.appendToBranch(spark, path, "staging", Seq(3L, 3L).toDF("k"))
    val checks = (df: org.apache.spark.sql.DataFrame) =>
      Seq(DataChecks.unique(df, Seq("k")))
    val e = intercept[IllegalStateException](
      Snapshots.wapPublish(spark, path, "staging", checks))
    assert(e.getMessage.contains("checks failed"))
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) == 6L)
    assert(Snapshots.branchesOf(path).contains("staging"))
    // replace the staged state with a clean batch and publish
    Snapshots.dropBranch(spark, path, "staging")
    Snapshots.createBranch(path, "staging")
    Snapshots.appendToBranch(spark, path, "staging", Seq(6L, 7L).toDF("k"))
    val (v, rep) = Snapshots.wapPublish(spark, path, "staging", checks)
    assert(rep.filter("passed = false").count() == 0L)
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) == 8L)
    assert(Snapshots.versions(path).last == v)
  }

  test("hardening: schema mismatch refuses, empty-branch publish works, laid-out tables round-trip") {
    import spark.implicits._
    val t = s"$cat.m.h"
    val path = s"$wh/m/h"
    spark.sql(s"CREATE TABLE $t (d DATE, k BIGINT) PARTITIONED BY (days(d))")
    spark.sql(s"INSERT INTO $t SELECT DATE_ADD(DATE '2024-05-01', CAST(id % 2 AS INT)), id FROM range(0, 8)")
    Snapshots.createBranch(path, "st")
    // schema mismatch is loud
    assert(intercept[Exception](
      Snapshots.appendToBranch(spark, path, "st", Seq(1L).toDF("wrong")))
      .getMessage.contains("schema mismatch"))
    // branch appends on a laid-out table derive the layout column and
    // lay files out per value, exactly like the main write path — a
    // fast-forward publish carries ALIGNED files, so co-located joins
    // and per-layout-value guarantees survive the staging trip
    val bv = Snapshots.appendToBranch(spark, path, "st",
      Seq((java.sql.Date.valueOf("2024-05-03"), 100L)).toDF("d", "k"))
    assert(scala.util.Using.resource(Files.list(Paths.get(path, s"v=$bv"))) { ls =>
      import scala.jdk.CollectionConverters._
      ls.iterator().asScala.exists(p =>
        Files.isDirectory(p) && p.getFileName.toString.startsWith("__graft_days="))
    }, "branch append did not lay files out per layout value")
    assert(Snapshots.readBranch(spark, path, "st").count() == 9L)
    val v = Snapshots.fastForward(spark, path, "st")
    assert(spark.sql(s"SELECT sum(k) FROM $t").collect()(0).getLong(0)
      == (0L until 8L).sum + 100L)
    Snapshots.compact(spark, path)
    val probe = spark.sql(s"SELECT count(*) AS c, sum(k) AS s FROM $t WHERE d = DATE '2024-05-03'")
    assert(probe.collect()(0).getLong(0) == 1L)

    // empty-branch publish: a fork with zero appends re-commits base
    val t2 = s"$cat.m.h2"
    val path2 = s"$wh/m/h2"
    spark.sql(s"CREATE TABLE $t2 AS SELECT id AS k FROM range(0, 3)")
    Snapshots.createBranch(path2, "noop")
    val v2 = Snapshots.fastForward(spark, path2, "noop")
    assert(spark.sql(s"SELECT count(*) FROM $t2 VERSION AS OF $v2").collect()(0).getLong(0) == 3L)
  }

  test("published branch data survives orphan cleanup and name reuse: publish consumes the manifests") {
    import spark.implicits._
    val t = s"$cat.m.pub"
    val path = s"$wh/m/pub"
    spark.sql(s"CREATE TABLE $t AS SELECT id AS k FROM range(0, 5)") // v1
    Snapshots.createBranch(path, "st")
    Snapshots.appendToBranch(spark, path, "st", (5L until 9L).toDF("k")) // v2 (branch)
    Snapshots.fastForward(spark, path, "st") // v3 publish, carries v=1 + v=2

    // THE ORPHAN TRAP: v=2 has no version of its own number anywhere
    // (the branch manifests were consumed), but main's publish
    // manifest carries its files — cleanup must treat it as live
    val swept = Snapshots.removeOrphanFiles(spark, path, olderThanMs = 0)
    assert(swept.count() == 0L, swept.collect().mkString(","))
    assert(Files.exists(Paths.get(path, "v=2")))
    val r = spark.sql(s"SELECT count(*) AS c, sum(k) AS s FROM $t").collect()(0)
    assert(r.getLong(0) == 9L && r.getLong(1) == (0L until 9L).sum)

    // THE NAME-REUSE TRAP: a fresh branch under the published name
    // must start EMPTY — resurrecting the consumed manifests would
    // double-count v=2 in the audit frame and a second publish would
    // carry its files twice
    Snapshots.createBranch(path, "st")
    assert(Snapshots.branchVersions(path, "st").isEmpty)
    assert(Snapshots.readBranch(spark, path, "st").count() == 9L)
    Snapshots.appendToBranch(spark, path, "st", Seq(100L).toDF("k"))
    val v2 = Snapshots.fastForward(spark, path, "st")
    val r2 = spark.sql(s"SELECT count(*) AS c, sum(k) AS s FROM $t").collect()(0)
    assert(r2.getLong(0) == 10L && r2.getLong(1) == (0L until 9L).sum + 100L)
    assert(Snapshots.versions(path).last == v2)
  }

  test("streams are branch-blind: a branch append between triggers never enters the delta feed") {
    import spark.implicits._
    val t = s"$cat.m.stream"
    val path = s"$wh/m/stream"
    spark.sql(s"CREATE TABLE $t AS SELECT id AS k FROM range(0, 5)") // v1
    val ckpt = Files.createTempDirectory("graft_branch_stream_").toString
    def drain(): Long = {
      val cnt = new java.util.concurrent.atomic.AtomicLong(0L)
      val q = spark.readStream.table(t).writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          cnt.addAndGet(df.count()); () }
        .option("checkpointLocation", s"$ckpt/ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "drain timed out")
      cnt.get()
    }
    assert(drain() == 5L)
    Snapshots.createBranch(path, "st")
    Snapshots.appendToBranch(spark, path, "st", (100L until 110L).toDF("k")) // v2 (branch)
    spark.sql(s"INSERT INTO $t SELECT id FROM range(5, 8)") // v3 (main)
    // the delta feed walks ACTUAL main versions, never numeric ranges:
    // the branch's v=2 sits numerically inside (1, 3] but must not leak
    assert(drain() == 3L)
    Snapshots.dropBranch(spark, path, "st")
  }

  test("branch DML closes the WAP loop: failing audit → DELETE/UPDATE fix ON the branch → clean publish; main bit-identical throughout") {
    import spark.implicits._
    import graft.quality.DataChecks
    val t = s"$cat.m.fix"
    val path = s"$wh/m/fix"
    spark.sql(s"CREATE TABLE $t AS SELECT /*+ COALESCE(1) */ id AS k, id * 10 AS v FROM range(0, 6)") // v1
    Snapshots.createBranch(path, "st")
    // stage a batch with two poison rows (negative v)
    Snapshots.appendToBranch(spark, path, "st",
      Seq((6L, 60L), (7L, -1L), (8L, -2L)).toDF("k", "v").coalesce(1)) // v2
    val checks = (df: org.apache.spark.sql.DataFrame) =>
      Seq(DataChecks.Check("non_negative", df.filter("v < 0")))
    assert(intercept[IllegalStateException](
      Snapshots.wapPublish(spark, path, "st", checks))
      .getMessage.contains("non_negative"))
    // FIX on the branch: delete the poison rows (branch-local CoW)
    val dv = Snapshots.deleteFromBranch(spark, path, "st", "v < 0") // v3
    // pruning worked: the base file (v ∈ [0,50]) provably holds no
    // negative row — carried by reference, never read
    val cowText = new String(Files.readAllBytes(
      Paths.get(path, "_meta", "branches", "st", s"$dv.json")))
    assert(graft.sources.FileStats.carriedFromManifest(cowText).size == 1, cowText)
    // main is BIT-IDENTICAL throughout the fix: no new versions, same rows
    assert(Snapshots.versions(path) == Seq(1L))
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) == 6L)
    assert(Snapshots.readBranch(spark, path, "st").filter("v < 0").count() == 0L)
    assert(Snapshots.readBranch(spark, path, "st").count() == 7L)
    // a second fix: UPDATE on the branch
    Snapshots.updateBranch(spark, path, "st", Map("v" -> "v + 5"), "k = 6") // v4
    assert(Snapshots.readBranch(spark, path, "st").filter("k = 6")
      .collect()(0).getLong(1) == 65L)
    // the SQL branch read walks the cow anchor too
    val sqlBr = spark.sql(
      s"SELECT count(*) AS c, sum(v) AS s FROM $t VERSION AS OF 'st'").collect()(0)
    assert(sqlBr.getLong(0) == 7L &&
      sqlBr.getLong(1) == (0L until 6L).map(_ * 10).sum + 60L + 5L, sqlBr)
    // audit now passes; publish carries the fixed state zero-copy
    val (pv, rep) = Snapshots.wapPublish(spark, path, "st", checks) // v5
    assert(rep.filter("passed = false").count() == 0L)
    assert(scala.util.Using.resource(Files.walk(Paths.get(path, s"v=$pv"))) { w =>
      import scala.jdk.CollectionConverters._
      !w.iterator().asScala.exists(_.getFileName.toString.endsWith(".parquet"))
    }, "publish must own zero data files")
    val r = spark.sql(s"SELECT count(*) AS c, sum(v) AS s FROM $t").collect()(0)
    assert(r.getLong(0) == 7L && r.getLong(1) == (0L until 6L).map(_ * 10).sum + 60L + 5L)
    assert(spark.sql(s"SELECT count(*) FROM $t VERSION AS OF 1").collect()(0).getLong(0) == 6L)
  }

  test("updateBranch multi-assignment evaluates every RHS against the OLD row") {
    val t = s"$cat.m.swap"
    val path = s"$wh/m/swap"
    spark.sql(s"CREATE TABLE $t AS SELECT /*+ COALESCE(1) */ id AS k, id * 10 AS v FROM range(1, 4)")
    Snapshots.createBranch(path, "st")
    // a swap: chained withColumn would feed the new k into v's RHS
    Snapshots.updateBranch(spark, path, "st", Map("k" -> "v", "v" -> "k"), "k = 2")
    val rows = Snapshots.readBranch(spark, path, "st").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2).toSeq
    assert(rows.contains((20L, 2L)), rows.toString)
    assert(rows.toSet == Set((1L, 10L), (20L, 2L), (3L, 30L)), rows.toString)
  }

  test("a branch DML that deletes EVERY row leaves a readable empty branch state; publish materializes it") {
    val t = s"$cat.m.empty"
    val path = s"$wh/m/empty"
    spark.sql(s"CREATE TABLE $t AS SELECT /*+ COALESCE(1) */ id AS k FROM range(0, 4)")
    Snapshots.createBranch(path, "st")
    Snapshots.deleteFromBranch(spark, path, "st", "k >= 0")
    val empty = Snapshots.readBranch(spark, path, "st")
    assert(empty.schema.fieldNames.toSeq == Seq("k") && empty.count() == 0L)
    val pv = Snapshots.fastForward(spark, path, "st")
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) == 0L)
    assert(spark.sql(s"SELECT count(*) FROM $t VERSION AS OF 1").collect()(0).getLong(0) == 4L)
    assert(Snapshots.versions(path).last == pv)
  }

  test("rebaseBranch: append-only histories replay onto advanced main; DML/full-state/eq commits refuse") {
    import spark.implicits._
    val t = s"$cat.m.rb"
    val path = s"$wh/m/rb"
    spark.sql(s"CREATE TABLE $t AS SELECT id AS k FROM range(0, 4)") // v1
    Snapshots.createBranch(path, "st")
    Snapshots.appendToBranch(spark, path, "st", Seq(100L, 101L).toDF("k")) // v2 branch
    spark.sql(s"INSERT INTO $t SELECT id FROM range(4, 6)") // v3 main append
    // diverged: fast-forward refuses, rebase succeeds (both sides append-only)
    assert(intercept[Exception](Snapshots.fastForward(spark, path, "st"))
      .getMessage.contains("rebase"))
    val nb = Snapshots.rebaseBranch(spark, path, "st")
    assert(nb == 3L)
    // the rebased audit frame sees BOTH the main append and the branch delta
    assert(Snapshots.readBranch(spark, path, "st").count() == 8L)
    val pv = Snapshots.fastForward(spark, path, "st")
    val r = spark.sql(s"SELECT count(*) AS c, sum(k) AS s FROM $t").collect()(0)
    assert(r.getLong(0) == 8L && r.getLong(1) == (0L until 6L).sum + 201L)
    assert(Snapshots.versions(path).last == pv)

    // refusal: main advanced with a FULL-STATE commit (CoW DML)
    val t2 = s"$cat.m.rb2"
    val path2 = s"$wh/m/rb2"
    spark.sql(s"CREATE TABLE $t2 AS SELECT id AS k FROM range(0, 4)")
    Snapshots.createBranch(path2, "st")
    Snapshots.appendToBranch(spark, path2, "st", Seq(100L).toDF("k"))
    spark.sql(s"DELETE FROM $t2 WHERE k = 1")
    assert(intercept[Exception](Snapshots.rebaseBranch(spark, path2, "st"))
      .getMessage.contains("full-state"))
    // refusal: main advanced with an equality-delete-bearing append
    val t3 = s"$cat.m.rb3"
    val path3 = s"$wh/m/rb3"
    spark.sql(s"CREATE TABLE $t3 AS SELECT id AS k, id AS v FROM range(0, 4)")
    Snapshots.createBranch(path3, "st")
    Snapshots.appendToBranch(spark, path3, "st", Seq((100L, 1L)).toDF("k", "v"))
    Snapshots.upsertBatch(spark, path3, Seq((1L, 11L)).toDF("k", "v"), Seq("k"))
    assert(intercept[Exception](Snapshots.rebaseBranch(spark, path3, "st"))
      .getMessage.contains("equality-delete"))
    // refusal: the BRANCH took a DML commit (anchored on the old base)
    val t4 = s"$cat.m.rb4"
    val path4 = s"$wh/m/rb4"
    spark.sql(s"CREATE TABLE $t4 AS SELECT id AS k FROM range(0, 4)")
    Snapshots.createBranch(path4, "st")
    Snapshots.appendToBranch(spark, path4, "st", Seq(100L).toDF("k"))
    Snapshots.deleteFromBranch(spark, path4, "st", "k = 100")
    spark.sql(s"INSERT INTO $t4 SELECT id FROM range(4, 5)")
    assert(intercept[Exception](Snapshots.rebaseBranch(spark, path4, "st"))
      .getMessage.contains("branch-DML"))
    // no-op rebase: base already at head
    val t5 = s"$cat.m.rb5"
    val path5 = s"$wh/m/rb5"
    spark.sql(s"CREATE TABLE $t5 AS SELECT id AS k FROM range(0, 4)")
    Snapshots.createBranch(path5, "st")
    assert(Snapshots.rebaseBranch(spark, path5, "st") == 1L)
    // staging continues AFTER a rebase: append against the new base,
    // then publish carries main's append + both branch deltas
    import spark.implicits._
    val t6 = s"$cat.m.rb6"
    val path6 = s"$wh/m/rb6"
    spark.sql(s"CREATE TABLE $t6 AS SELECT id AS k FROM range(0, 3)")
    Snapshots.createBranch(path6, "st")
    Snapshots.appendToBranch(spark, path6, "st", Seq(100L).toDF("k"))
    spark.sql(s"INSERT INTO $t6 SELECT id FROM range(3, 5)")
    Snapshots.rebaseBranch(spark, path6, "st")
    Snapshots.appendToBranch(spark, path6, "st", Seq(200L).toDF("k"))
    Snapshots.fastForward(spark, path6, "st")
    val r6 = spark.sql(s"SELECT count(*) AS c, sum(k) AS s FROM $t6").collect()(0)
    assert(r6.getLong(0) == 7L && r6.getLong(1) == (0L until 5L).sum + 300L, r6)
  }

  test("branch reads honor the DECLARED schema across metadata-only column add/drop") {
    import spark.implicits._
    val t = s"$cat.m.sch"
    val path = s"$wh/m/sch"
    spark.sql(s"CREATE TABLE $t (k BIGINT, junk STRING) USING parquet")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')")
    Snapshots.createBranch(path, "st")
    // main evolves metadata-only while the branch exists: drop a
    // column old files still carry physically, add a new one
    spark.sql(s"ALTER TABLE $t DROP COLUMN junk")
    spark.sql(s"ALTER TABLE $t ADD COLUMN note STRING")
    // library + SQL branch reads follow the declared shape — no
    // resurrected `junk`, `note` present (NULL for pre-add files)
    val lib = Snapshots.readBranch(spark, path, "st")
    assert(lib.schema.fieldNames.toSeq == Seq("k", "note"))
    assert(lib.filter("note IS NULL").count() == 2L)
    val sql = spark.sql(s"SELECT * FROM $t VERSION AS OF 'st'")
    assert(sql.schema.fieldNames.toSeq == Seq("k", "note"))
    // the append schema gate compares against the DECLARED shape too
    assert(intercept[Exception](
      Snapshots.appendToBranch(spark, path, "st", Seq((3L, "x")).toDF("k", "junk")))
      .getMessage.contains("schema mismatch"))
    Snapshots.appendToBranch(spark, path, "st", Seq((3L, "n")).toDF("k", "note"))
    val v = Snapshots.fastForward(spark, path, "st")
    val r = spark.sql(s"SELECT count(*) AS c, count(note) AS n FROM $t").collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 1L)
    assert(Snapshots.versions(path).last == v)
  }

  test("tags and branches share one ref namespace: collisions refuse loudly both ways") {
    val t = s"$cat.m.ns"
    val path = s"$wh/m/ns"
    spark.sql(s"CREATE TABLE $t AS SELECT id AS k FROM range(0, 4)")
    Snapshots.createTag(path, "audit", 1L)
    assert(intercept[Exception](Snapshots.createBranch(path, "audit"))
      .getMessage.contains("one namespace"))
    Snapshots.createBranch(path, "staging")
    assert(intercept[Exception](Snapshots.createTag(path, "staging", 1L))
      .getMessage.contains("one namespace"))
    // non-colliding names still work side by side
    Snapshots.createTag(path, "audit2", 1L)
    assert(Snapshots.tagsOf(path).keySet == Set("audit", "audit2") &&
      Snapshots.branchesOf(path).keySet == Set("staging"))
  }

  test("CALL surface: create_branch, fast_forward, drop_branch") {
    val t = s"$cat.m.c"
    spark.sql(s"CREATE TABLE $t AS SELECT id AS k FROM range(0, 4)")
    val cb = spark.sql(s"CALL $cat.system.create_branch(table => 'm.c', branch => 'st')")
      .collect()(0)
    assert(cb.getString(0) == "st" && cb.getLong(1) == 1L)
    import spark.implicits._
    Snapshots.appendToBranch(spark, s"$wh/m/c", "st", (4L until 6L).toDF("k"))
    val ff = spark.sql(s"CALL $cat.system.fast_forward(table => 'm.c', branch => 'st')")
      .collect()(0)
    assert(ff.getLong(1) == 3L)
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) == 6L)
    spark.sql(s"CALL $cat.system.create_branch(table => 'm.c', branch => 'tmp')")
    val db = spark.sql(s"CALL $cat.system.drop_branch(table => 'm.c', branch => 'tmp')")
      .collect()(0)
    assert(db.getString(1) == "dropped")
  }

  test("branch DML on a laid-out table writes laid-out files (layout survives the fix)") {
    val t = s"$cat.m.dml_lay"
    val path = s"$wh/m/dml_lay"
    spark.sql(s"CREATE TABLE $t (d DATE, k BIGINT) PARTITIONED BY (days(d))")
    spark.sql(s"INSERT INTO $t SELECT DATE_ADD(DATE '2024-05-01', CAST(id % 2 AS INT)), id FROM range(0, 8)")
    Snapshots.createBranch(path, "st")
    val uv = Snapshots.updateBranch(spark, path, "st",
      Map("k" -> "k + 100"), "d = DATE '2024-05-02'")
    // the DML rewrite must lay files out per layout value like the
    // append path — plain files here would lose alignment at publish
    assert(scala.util.Using.resource(Files.list(Paths.get(path, s"v=$uv"))) { ls =>
      import scala.jdk.CollectionConverters._
      ls.iterator().asScala.exists(p =>
        Files.isDirectory(p) && p.getFileName.toString.startsWith("__graft_days="))
    }, "branch DML rewrite did not lay files out per layout value")
    val fixed = Snapshots.readBranch(spark, path, "st")
    assert(fixed.columns.toSeq == Seq("d", "k"), fixed.columns.toSeq)
    assert(fixed.agg(org.apache.spark.sql.functions.sum("k")).collect()(0).getLong(0)
      == (0L until 8L).sum + 4 * 100L)
    Snapshots.fastForward(spark, path, "st")
    assert(spark.sql(s"SELECT sum(k) FROM $t WHERE d = DATE '2024-05-02'")
      .collect()(0).getLong(0) == (1L + 3 + 5 + 7) + 400L)
  }

  test("updateBranch refuses a type-changing assignment loudly (no widened branch files)") {
    val t = s"$cat.m.dml_ty"
    val path = s"$wh/m/dml_ty"
    spark.sql(s"CREATE TABLE $t AS SELECT id AS k, id AS v FROM range(0, 4)")
    Snapshots.createBranch(path, "st")
    val e = intercept[IllegalArgumentException](
      Snapshots.updateBranch(spark, path, "st", Map("v" -> "v * 1.5"), "k = 2"))
    assert(e.getMessage.contains("decimal") && e.getMessage.contains("CAST"),
      e.getMessage)
    // nothing committed to the branch, and an explicit CAST works
    assert(Snapshots.readBranch(spark, path, "st").count() == 4L)
    Snapshots.updateBranch(spark, path, "st",
      Map("v" -> "CAST(v * 3 AS BIGINT)"), "k = 2")
    val got = Snapshots.readBranch(spark, path, "st")
      .filter("k = 2").collect()(0).getLong(1)
    assert(got == 6L)
  }

  test("branch DML with a DATE literal against a TIMESTAMP column prunes safely (no crash)") {
    val t = s"$cat.m.dml_tz"
    val path = s"$wh/m/dml_tz"
    spark.sql(s"CREATE TABLE $t AS SELECT /*+ COALESCE(1) */ " +
      "TIMESTAMP '2024-01-01 12:00:00' + make_interval(0,0,0,CAST(id AS INT)) AS ts, id AS k " +
      "FROM range(0, 6)")
    Snapshots.createBranch(path, "st")
    // pre-fix this crashed inside bounds resolution (DATE→TIMESTAMP
    // literal widening needs a timezone); the DML must run — pruning
    // is an optimization, never a correctness gate. The date literal
    // promotes to midnight, so ids 2..5 (ts ≥ 01-03 12:00) delete.
    Snapshots.deleteFromBranch(spark, path, "st", "ts > DATE '2024-01-03'")
    assert(Snapshots.readBranch(spark, path, "st").count() == 2L)
    // main untouched
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) == 6L)
  }

  test("branches fork over a DELETE-BEARING base: composed reads, branch DML, zero-copy publish with entries intact") {
    import spark.implicits._
    val t = s"$cat.m.wap_del"
    val path = s"$wh/m/wap_del"
    spark.sql(s"CREATE TABLE $t AS SELECT /*+ COALESCE(1) */ id AS k, id * 10 AS v FROM range(0, 10)") // v1
    // live equality entry: retract k=2, restate as v=222
    Snapshots.upsertBatch(spark, path, Seq((2L, 222L)).toDF("k", "v").coalesce(1), Seq("k")) // v2
    // live positional sidecar: MoR point-delete of k=5 (partial file)
    spark.conf.set("spark.graft.delete.mode", "merge-on-read")
    try spark.sql(s"DELETE FROM $t WHERE k = 5")
    finally spark.conf.unset("spark.graft.delete.mode")                  // v3
    assert(Snapshots.liveDeletes(path, 3L).nonEmpty &&
      Snapshots.liveEqDeletes(path, 3L).nonEmpty, "precondition: both flavors live")

    // fork OVER both flavors — no compact()
    val base = Snapshots.createBranch(path, "st")
    assert(base == 3L)
    Snapshots.appendToBranch(spark, path, "st",
      Seq((100L, 1000L), (101L, 1010L)).toDF("k", "v").coalesce(1))      // v4
    // the audit frame merges BOTH flavors: k=5 gone, k=2 → 222 once
    val audit = Snapshots.readBranch(spark, path, "st")
    assert(audit.count() == 11L, audit.collect().mkString(","))
    assert(audit.filter("k = 2").collect().map(_.getLong(1)).toSeq == Seq(222L))
    assert(audit.filter("k = 5").count() == 0L)
    // SQL branch read routes the same composed scan
    val sqlProbe = spark.sql(
      s"SELECT count(*) AS c, sum(v) AS s FROM $t VERSION AS OF 'st' WHERE k IN (2, 5, 100)")
      .collect()(0)
    assert(sqlProbe.getLong(0) == 2L && sqlProbe.getLong(1) == 222L + 1000L, sqlProbe)

    // branch DML over the composed state: the rewrite must NOT
    // resurrect the position-deleted or retracted rows
    Snapshots.updateBranch(spark, path, "st", Map("v" -> "v + 1"), "k = 101") // v5 anchor
    val fixed = Snapshots.readBranch(spark, path, "st")
    assert(fixed.count() == 11L)
    assert(fixed.filter("k = 101").collect()(0).getLong(1) == 1011L)
    assert(fixed.filter("k = 5").count() == 0L &&
      fixed.filter("k = 2").collect().map(_.getLong(1)).toSeq == Seq(222L))

    // main bit-identical through the whole trip (10 base rows, k=2
    // retracted+restated = net 10, k=5 position-deleted → 9)
    assert(Snapshots.versions(path) == Seq(1L, 2L, 3L))
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) == 9L)

    // zero-copy publish: entries ride the manifest intact
    val pv = Snapshots.fastForward(spark, path, "st")
    // zero-copy: the publish version directory holds no data files
    assert(scala.util.Using.resource(Files.walk(Paths.get(path, s"v=$pv"))) { w =>
      import scala.jdk.CollectionConverters._
      !w.iterator().asScala.exists(_.getFileName.toString.endsWith(".parquet"))
    }, "publish wrote data files — not zero-copy")
    assert(Snapshots.liveDeletes(path, pv).nonEmpty &&
      Snapshots.liveEqDeletes(path, pv).nonEmpty,
      "publish must carry both delete flavors")
    val pub = spark.sql(s"SELECT count(*) AS c, sum(v) AS s FROM $t").collect()(0)
    assert(pub.getLong(0) == 11L)
    assert(pub.getLong(1) ==
      (0L until 10L).map(_ * 10).sum - 20L + 222L - 50L + 1000L + 1011L, pub)
    // retention keeps the published composed state readable
    Snapshots.expireSnapshots(spark, path, keepLast = 1)
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) == 11L)
    // compaction still materializes everything afterwards
    Snapshots.compact(spark, path)
    val cv = Snapshots.versions(path).last
    assert(Snapshots.liveDeletes(path, cv).isEmpty &&
      Snapshots.liveEqDeletes(path, cv).isEmpty)
    assert(spark.sql(s"SELECT sum(v) FROM $t").collect()(0).getLong(0) == pub.getLong(1))
  }

  test("mergeIntoBranch: keyed restatement fix, bounds-pruned, main untouched; CALL surface") {
    import spark.implicits._
    val t = s"$cat.m.mib"
    val path = s"$wh/m/mib"
    spark.sql(s"CREATE TABLE $t AS SELECT /*+ COALESCE(1) */ id AS k, id * 10 AS v FROM range(0, 8)") // v1, bounds k∈[0,7]
    Snapshots.createBranch(path, "st")
    Snapshots.appendToBranch(spark, path, "st",
      Seq((100L, 0L), (101L, 0L)).toDF("k", "v").coalesce(1)) // v2, bounds k∈[100,101]
    // restate k=100 (matched-UPDATE) and insert k=200 (not-matched-INSERT)
    val updates = Seq((100L, 5555L), (200L, 2000L)).toDF("k", "v")
    val mv = Snapshots.mergeIntoBranch(spark, path, "st", updates, Seq("k"))
    // bounds pruning: the base file (k ≤ 7 < 100) was carried, never read
    val manifest = new String(Files.readAllBytes(
      Paths.get(path, "_meta", "branches", "st", s"$mv.json")))
    assert(graft.sources.FileStats.carriedFromManifest(manifest).size == 1, manifest)
    val fixed = Snapshots.readBranch(spark, path, "st").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fixed(100L) == 5555L && fixed(101L) == 0L && fixed(200L) == 2000L &&
      fixed.size == 11, fixed.toString)
    // main bit-identical
    assert(Snapshots.versions(path) == Seq(1L) &&
      spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) == 8L)
    // schema / key guards are loud
    assert(intercept[IllegalArgumentException](
      Snapshots.mergeIntoBranch(spark, path, "st", Seq(1L).toDF("k"), Seq("k")))
      .getMessage.contains("schema mismatch"))
    assert(intercept[IllegalArgumentException](
      Snapshots.mergeIntoBranch(spark, path, "st", updates, Seq("zzz")))
      .getMessage.contains("no key column"))
    // publish lands the fix
    Snapshots.fastForward(spark, path, "st")
    assert(spark.sql(s"SELECT sum(v) FROM $t WHERE k >= 100").collect()(0).getLong(0)
      == 5555L + 0L + 2000L)

    // CALL surface over a source view
    val t2 = s"$cat.m.mib2"
    val path2 = s"$wh/m/mib2"
    spark.sql(s"CREATE TABLE $t2 AS SELECT id AS k, id AS v FROM range(0, 4)")
    Snapshots.createBranch(path2, "st")
    Seq((1L, 99L)).toDF("k", "v").createOrReplaceTempView("mib2_fix")
    val call = spark.sql(s"CALL $cat.system.merge_into_branch(table => 'm.mib2', " +
      "branch => 'st', source => 'mib2_fix', keys => 'k')").collect()(0)
    assert(call.getString(0) == "st" && call.getLong(1) == 2L)
    assert(Snapshots.readBranch(spark, path2, "st").filter("k = 1")
      .collect()(0).getLong(1) == 99L)
  }

  test("mergeIntoBranch over a delete-bearing base composes: retracted and position-deleted rows never resurrect into the rewrite") {
    import spark.implicits._
    val t = s"$cat.m.mib_del"
    val path = s"$wh/m/mib_del"
    spark.sql(s"CREATE TABLE $t AS SELECT /*+ COALESCE(1) */ id AS k, id * 10 AS v FROM range(0, 8)") // v1
    Snapshots.upsertBatch(spark, path, Seq((1L, 111L)).toDF("k", "v").coalesce(1), Seq("k")) // v2 eq entry
    spark.conf.set("spark.graft.delete.mode", "merge-on-read")
    try spark.sql(s"DELETE FROM $t WHERE k = 4")
    finally spark.conf.unset("spark.graft.delete.mode") // v3 positional sidecar
    Snapshots.createBranch(path, "st")
    // the merge restates k=1 (the UPSERT-restated key — its RETRACTED
    // base row must not resurrect into the rewrite) and k=4 (the
    // position-deleted key — this is a NEW insert, the dead row must
    // not resurrect either); envelope [1,4] forces the base file to
    // REWRITE, which is exactly where resurrection would happen
    val mv = Snapshots.mergeIntoBranch(spark, path, "st",
      Seq((1L, 5555L), (4L, 4444L)).toDF("k", "v"), Seq("k"))
    val fixed = Snapshots.readBranch(spark, path, "st").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fixed.size == 8, fixed.toString) // 8 live rows: 0..7 minus 4 plus new 4
    assert(fixed(1L) == 5555L && fixed(4L) == 4444L, fixed.toString)
    // main untouched; publish lands the composed fix
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) == 7L)
    Snapshots.fastForward(spark, path, "st")
    val pub = spark.sql(s"SELECT count(*) AS c, sum(v) AS s FROM $t").collect()(0)
    assert(pub.getLong(0) == 8L)
    assert(pub.getLong(1) == (0L until 8L).map(_ * 10).sum - 10 - 40 + 5555 + 4444, pub)
  }

  test("branch manifest row_count stays truthful after a rebase moves the fork base") {
    import spark.implicits._
    val t = s"$cat.m.rb_rc"
    val path = s"$wh/m/rb_rc"
    spark.sql(s"CREATE TABLE $t AS SELECT id AS k FROM range(0, 4)") // v1: 4 rows
    Snapshots.createBranch(path, "st")
    Snapshots.appendToBranch(spark, path, "st", Seq(100L, 101L).toDF("k")) // +2
    spark.sql(s"INSERT INTO $t SELECT id FROM range(4, 7)") // main +3
    Snapshots.rebaseBranch(spark, path, "st")
    val bv = Snapshots.appendToBranch(spark, path, "st", Seq(200L).toDF("k")) // +1
    // the append after the rebase must chain from the NEW base's row
    // count (4+3), not the pre-rebase branch manifest's stale baseline
    val manifest = new String(Files.readAllBytes(
      Paths.get(path, "_meta", "branches", "st", s"$bv.json")))
    val rc = "\"row_count\":(\\d+)".r.findFirstMatchIn(manifest).get.group(1).toLong
    assert(rc == 10L, s"branch manifest row_count=$rc, want 10: $manifest")
    assert(Snapshots.readBranch(spark, path, "st").count() == 10L)
  }
}
