package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.CyclicBarrier
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{GraftCatalog, GraftConcurrentCommitException, Snapshots}

/** The commit plane under concurrent writers — the arbitration the
  * reference delegates to its Iceberg REST catalog tier, rebuilt on
  * filesystem atomics: version mint = atomic directory creation,
  * commit point = CREATE_NEW manifest, commuting appends retry to
  * their own versions, non-commuting commits (DML / compaction /
  * publish) gate on their planning base and lose LOUDLY — the everyday
  * lost-update case (maintenance racing a streaming writer) can never
  * silently drop a commit. */
class ConcurrencySpec extends AnyFunSuite {
  import TestSession.spark

  private lazy val wh = Files.createTempDirectory("graft_conc_spec_").toString
  private lazy val cat: String = {
    spark.conf.set("spark.sql.catalog.gcc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcc.m")
    "gcc"
  }

  private def rowCountOfManifest(path: String, v: Long): Long = {
    val text = new String(Files.readAllBytes(Paths.get(path, "_meta", s"$v.json")))
    "\"row_count\":(\\d+)".r.findFirstMatchIn(text).get.group(1).toLong
  }

  private def causeChain(t: Throwable): Seq[Throwable] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq

  test("racing fast appends both land as distinct readable versions with exact row_count") {
    import spark.implicits._
    val path = s"$wh/conc_app"
    Snapshots.writeSnapshot(Seq(0L).toDF("k").coalesce(1), path) // v1
    val barrier = new CyclicBarrier(2)
    val versions = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def appender(lo: Long, hi: Long): Thread = new Thread(() => {
      try {
        val df = (lo until hi).toDF("k").coalesce(1)
        barrier.await()
        versions.add(Snapshots.appendSnapshot(df, path))
        ()
      } catch { case t: Throwable => errs.add(t); () }
    })
    val ts = Seq(appender(10, 15), appender(20, 26))
    ts.foreach(_.start()); ts.foreach(_.join(180000))
    assert(errs.isEmpty, errs.toArray.mkString("; "))
    // appends COMMUTE: both racers retry to their own versions — the
    // optimistic-concurrency case, no loser
    import scala.jdk.CollectionConverters._
    assert(versions.asScala.toSet == Set(2L, 3L), versions.asScala.toSeq)
    assert(Snapshots.versions(path) == Seq(1L, 2L, 3L))
    val got = Snapshots.readLatest(spark, path)
    assert(got.count() == 12L)
    assert(got.agg(org.apache.spark.sql.functions.sum("k")).collect()(0).getLong(0)
      == (10L until 15L).sum + (20L until 26L).sum)
    // in-JVM publication order = version order, so the append-chain
    // row_count arithmetic is EXACT even under the race
    assert(rowCountOfManifest(path, 3L) == 12L)
  }

  test("a non-commuting commit racing an in-flight writer loses loudly, never silently") {
    val t = s"$cat.m.race"
    val path = s"$wh/m/race"
    spark.sql(s"CREATE TABLE $t AS SELECT /*+ COALESCE(1) */ id AS k FROM range(0, 10)") // v1
    // a concurrent writer mid-commit: version minted (directory
    // reserved), manifest not yet published
    val inflight = Snapshots.reserveVersion(path)
    val e = intercept[Throwable](spark.sql(s"DELETE FROM $t WHERE k = 3"))
    assert(causeChain(e).exists(_.isInstanceOf[GraftConcurrentCommitException]),
      s"wanted GraftConcurrentCommitException in: ${causeChain(e).map(_.getClass.getName)}")
    assert(causeChain(e).exists(_.getMessage.contains("removeOrphanFiles")))
    // nothing published, nothing truncated: main is bit-identical
    assert(Snapshots.versions(path) == Seq(1L))
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) == 10L)
    // the refused DML left no debris blocking the chain: once the
    // in-flight writer resolves, the same DML lands
    Snapshots.releaseVersion(path, inflight)
    spark.sql(s"DELETE FROM $t WHERE k = 3")
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) == 9L)
  }

  test("a full-state commit gated on a stale planning base refuses after an append landed") {
    import spark.implicits._
    val path = s"$wh/conc_fs"
    Snapshots.writeSnapshot((0L until 6L).toDF("k").coalesce(1), path) // v1
    val staleHead = Snapshots.versions(path).last
    Snapshots.appendSnapshot(Seq(100L).toDF("k").coalesce(1), path) // v2 lands meanwhile
    // the compaction shape: a full-state write planned against v1
    val e = intercept[GraftConcurrentCommitException](
      Snapshots.writeSnapshot((0L until 6L).toDF("k"), path,
        operation = "compact", basedOn = Some(staleHead)))
    assert(e.getMessage.contains("re-plan") || e.getMessage.contains("re-run"),
      e.getMessage)
    // the refusal cleaned its own directory: a re-planned compact works
    val (v, _, _) = Snapshots.compact(spark, path)
    assert(Snapshots.versions(path).last == v)
    assert(Snapshots.readLatest(spark, path).count() == 7L)
  }

  test("racing keyed upserts never produce duplicate keys: one lands, the other loses loudly or serializes") {
    import spark.implicits._
    val path = s"$wh/conc_up"
    Snapshots.writeSnapshot(Seq((1L, 0L), (2L, 0L)).toDF("k", "v").coalesce(1), path)
    val barrier = new CyclicBarrier(2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def upserter(value: Long): Thread = new Thread(() => {
      try {
        val df = Seq((1L, value)).toDF("k", "v").coalesce(1)
        barrier.await()
        Snapshots.upsertBatch(spark, path, df, Seq("k"))
        ()
      } catch { case t: Throwable => errs.add(t); () }
    })
    val ts = Seq(upserter(111L), upserter(222L))
    ts.foreach(_.start()); ts.foreach(_.join(180000))
    // upserts do NOT commute with each other: either they serialized
    // cleanly (one saw the other's commit before minting) or the later
    // one failed loudly — never a silent duplicate key
    import scala.jdk.CollectionConverters._
    assert(errs.asScala.forall(t =>
      causeChain(t).exists(_.isInstanceOf[GraftConcurrentCommitException])),
      errs.asScala.map(_.toString).mkString("; "))
    val rows = Snapshots.readLatest(spark, path).filter("k = 1").collect()
    assert(rows.length == 1, s"duplicate key after racing upserts: ${rows.mkString(",")}")
    assert(Set(111L, 222L).contains(rows(0).getLong(1)))
  }

  test("stress: appenders racing a compactor — every append survives exactly once, the compactor wins or loses loudly") {
    import spark.implicits._
    val path = s"$wh/conc_stress"
    Snapshots.writeSnapshot((0L until 4L).toDF("k").coalesce(1), path) // v1
    val barrier = new CyclicBarrier(4)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def appender(lo: Long): Thread = new Thread(() => {
      try {
        val df = Seq(lo, lo + 1).toDF("k").coalesce(1)
        barrier.await()
        Snapshots.appendSnapshot(df, path)
        ()
      } catch { case t: Throwable => errs.add(t); () }
    })
    val compactorLost = new java.util.concurrent.atomic.AtomicBoolean(false)
    val compactor = new Thread(() => {
      try { barrier.await(); Snapshots.compact(spark, path); () }
      catch {
        case t: Throwable =>
          if (causeChain(t).exists(_.isInstanceOf[GraftConcurrentCommitException]))
            compactorLost.set(true)
          else errs.add(t)
          ()
      }
    })
    val ts = Seq(appender(100), appender(200), appender(300), compactor)
    ts.foreach(_.start()); ts.foreach(_.join(180000))
    assert(errs.isEmpty, errs.toArray.mkString("; "))
    // invariant: all 6 appended rows present exactly once, base rows
    // intact, regardless of whether the compactor won its race
    val rows = Snapshots.readLatest(spark, path).collect().map(_.getLong(0)).sorted
    assert(rows.toSeq == ((0L until 4L) ++ Seq(100L, 101L, 200L, 201L, 300L, 301L)).sorted,
      s"rows=${rows.mkString(",")} compactorLost=${compactorLost.get()}")
    // and the chain stays serviceable either way
    val (cv, _, _) = Snapshots.compact(spark, path)
    assert(Snapshots.versions(path).last == cv)
    assert(Snapshots.readLatest(spark, path).count() == 10L)
  }

  test("cross-process append race: both manifests record exact cumulative row_count") {
    import spark.implicits._
    val path = s"$wh/conc_xproc"
    Snapshots.writeSnapshot((0L until 4L).toDF("k").coalesce(1), path) // v1, 4 rows
    // writer A lives in "another process": it minted its version, but
    // its reservation is NOT in this JVM's ledger (the exact state a
    // second pipeline worker is in between mint and commit)
    val vA = Snapshots.reserveVersion(path)
    Snapshots.resolveVersion(path, vA) // clear the in-JVM entry only
    // writer B (this process) races: it must NOT publish past A's
    // minted-but-unpublished directory — the foreign wait holds B at
    // its publication turn until A's manifest lands
    val vB = new java.util.concurrent.atomic.AtomicLong(-1L)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val tB = new Thread(() => {
      try vB.set(Snapshots.appendSnapshot((10L until 16L).toDF("k").coalesce(1), path))
      catch { case t: Throwable => errs.add(t); () }
    })
    tB.start()
    // wait until B has written its data and is parked at the turn
    // (B's version directory exists with data, manifest absent)
    val deadline = System.currentTimeMillis() + 60000
    def bParked: Boolean = {
      val dirs = scala.util.Using.resource(Files.list(Paths.get(path))) { ls =>
        import scala.jdk.CollectionConverters._
        ls.iterator().asScala.map(_.getFileName.toString).toVector
      }
      dirs.exists(d => d.startsWith("v=") && d.stripPrefix("v=").toLong > vA) &&
        !Files.exists(Paths.get(path, "_meta", s"${vA + 1}.json"))
    }
    while (!bParked && System.currentTimeMillis() < deadline) Thread.sleep(100)
    Thread.sleep(500) // let B actually reach the wait
    // A publishes (5 rows) — then B's turn arrives
    val vAOut = Snapshots.appendSnapshot((20L until 25L).toDF("k").coalesce(1),
      path, reservedV = Some(vA))
    tB.join(120000)
    assert(errs.isEmpty, errs.toArray.mkString("; "))
    assert(vAOut == vA && vB.get() == vA + 1, s"A=$vAOut B=${vB.get()}")
    // BOTH manifests carry the exact cumulative count: A = 4+5, B =
    // 4+5+6 — the cross-process staleness the pre-r18 contract
    // documented is gone
    assert(rowCountOfManifest(path, vA) == 9L)
    assert(rowCountOfManifest(path, vB.get()) == 15L)
    assert(Snapshots.readLatest(spark, path).count() == 15L)
  }

  test("an abandoned reservation is orphan debris: the age-guarded walk reclaims it and the chain continues") {
    import spark.implicits._
    val path = s"$wh/conc_orph"
    Snapshots.writeSnapshot((0L until 4L).toDF("k").coalesce(1), path) // v1
    val abandoned = Snapshots.reserveVersion(path) // writer crashed here
    // clear the in-JVM ledger the way a process death would
    Snapshots.resolveVersion(path, abandoned)
    // young debris is protected by the in-flight window…
    val kept = Snapshots.removeOrphanFiles(spark, path).collect()
    assert(kept.exists(r => r.getString(0) == s"v=$abandoned" &&
      r.getString(2) == "kept-in-flight"), kept.mkString(","))
    // …and reclaimed once the window passes (negative cutoff = now)
    val removed = Snapshots.removeOrphanFiles(spark, path, olderThanMs = -5000).collect()
    assert(removed.exists(r => r.getString(0) == s"v=$abandoned" &&
      r.getString(2) == "removed"), removed.mkString(","))
    assert(!Files.exists(Paths.get(path, s"v=$abandoned")))
    // the chain is unblocked: DML and retention run clean (the
    // reclaimed number is free for reuse — nothing ever referenced it)
    assert(Snapshots.compact(spark, path)._1 >= abandoned)
    assert(Snapshots.readLatest(spark, path).count() == 4L)
    val exp = Snapshots.expireSnapshots(spark, path, keepLast = 1).collect()
    assert(exp.exists(r => r.getString(2) == "expired"))
  }
}
