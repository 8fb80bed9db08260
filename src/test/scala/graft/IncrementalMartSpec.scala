package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{BloomSkip, FileStats, GraftCatalog, IncrementalMart, Snapshots}

/** Incremental view maintenance off the changelog
  * ([[graft.sources.IncrementalMart]]): a count/sum aggregate mart
  * refreshed O(delta) from `t.changes` must stay BIT-IDENTICAL to a
  * full rebuild through appends, keyed upserts, point deletes, CoW
  * updates, group births and group deaths — and the mart commit must
  * carry untouched band files by reference. Pins the delta algebra,
  * the no-op fast path, NULL-dim group pairing, and the refusals. */
class IncrementalMartSpec extends AnyFunSuite {
  import TestSession.spark

  private lazy val wh = Files.createTempDirectory("graft_ivm_spec_").toString
  private lazy val cat: String = {
    spark.conf.set("spark.sql.catalog.givm", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.givm.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS givm.m")
    "givm"
  }

  /** Base rows (k, g, m): key k, group g = k % mod, measure m = k * 10. */
  private def freshBase(ns: String, n: Int, mod: Int = 3): (String, String) = {
    val t = s"$cat.m.$ns"
    val path = s"$wh/m/$ns"
    spark.sql(s"CREATE TABLE $t TBLPROPERTIES('graft.changelog.keys'='k') AS " +
      s"SELECT /*+ COALESCE(1) */ id AS k, id % $mod AS g, id * 10 AS m FROM range(0, $n)")
    (t, path)
  }

  private def rebuild(base: String): Seq[(Long, Long, Long)] =
    Snapshots.readLatest(spark, base).groupBy("g")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("row_count"),
        org.apache.spark.sql.functions.sum("m").as("sum_m"))
      .orderBy("g").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  private def martRows(mart: String): Seq[(Long, Long, Long)] =
    Snapshots.readLatest(spark, mart).orderBy("g").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("append + upsert + delete + update: every refresh matches a full rebuild; no-op refresh is -1") {
    import spark.implicits._
    val (t, base) = freshBase("b1", 9)
    val mart = s"$wh/m/b1_mart"
    IncrementalMart.initialize(spark, base, mart, Seq("g"), Seq("m"), bandFiles = 3)
    assert(martRows(mart) == rebuild(base))
    // no base change: marker read, no commit, no job
    val martV0 = Snapshots.versions(mart).last
    assert(IncrementalMart.refresh(spark, mart) == -1L)
    assert(Snapshots.versions(mart).last == martV0)
    // append (INSERT fast path — no capture files)
    spark.sql(s"INSERT INTO $t SELECT /*+ COALESCE(1) */ id, id % 3, id * 10 FROM range(9, 12)")
    assert(IncrementalMart.refresh(spark, mart) > 0)
    assert(martRows(mart) == rebuild(base))
    // keyed upsert: restate k=1 (m 10 -> 999), insert k=100 (new row, g=1)
    Snapshots.upsertBatch(spark, base,
      Seq((1L, 1L, 999L), (100L, 100L % 3, 1000L)).toDF("k", "g", "m").coalesce(1), Seq("k"))
    assert(IncrementalMart.refresh(spark, mart) > 0)
    assert(martRows(mart) == rebuild(base))
    // point CoW delete
    spark.sql(s"DELETE FROM $t WHERE k = 5")
    // CoW update moving a row ACROSS groups (g 0 -> 2): one refresh
    // must subtract from the old group and add to the new
    spark.sql(s"UPDATE $t SET g = 2 WHERE k = 6")
    assert(IncrementalMart.refresh(spark, mart) > 0)
    assert(martRows(mart) == rebuild(base))
    // idempotent tail
    assert(IncrementalMart.refresh(spark, mart) == -1L)
  }

  test("group death and birth: a group deleted to zero rows drops; a new group appears") {
    val (t, base) = freshBase("b2", 6) // groups 0,1,2 with 2 rows each
    val mart = s"$wh/m/b2_mart"
    IncrementalMart.initialize(spark, base, mart, Seq("g"), Seq("m"), bandFiles = 2)
    // kill group 1 entirely (k=1, k=4)
    spark.sql(s"DELETE FROM $t WHERE g = 1")
    assert(IncrementalMart.refresh(spark, mart) > 0)
    assert(martRows(mart).map(_._1) == Seq(0L, 2L))
    assert(martRows(mart) == rebuild(base))
    // birth: a group never seen before
    spark.sql(s"INSERT INTO $t SELECT /*+ COALESCE(1) */ 50, 7, 500")
    assert(IncrementalMart.refresh(spark, mart) > 0)
    assert(martRows(mart).map(_._1) == Seq(0L, 2L, 7L))
    assert(martRows(mart) == rebuild(base))
  }

  test("a point change rewrites one bloom'd band and carries the rest by reference") {
    val (t, base) = freshBase("b3", 300, mod = 10) // groups 0..9
    val mart = s"$wh/m/b3_mart"
    // bloom the mart's dim BEFORE initialize so every band file
    // carries a bloom from birth (hash-banded longs: every band's
    // [min,max] spans most groups — the bloom is the pruning layer)
    Files.createDirectories(Paths.get(mart))
    BloomSkip.enable(mart, Seq("g"))
    IncrementalMart.initialize(spark, base, mart, Seq("g"), Seq("m"), bandFiles = 4)
    val filesBefore = {
      val v = Snapshots.versions(mart).last
      val m = new String(Files.readAllBytes(Paths.get(s"$mart/_meta/$v.json")),
        java.nio.charset.StandardCharsets.UTF_8)
      FileStats.fromManifest(m).map(_.size).getOrElse(0) +
        FileStats.carriedFromManifest(m).size
    }
    assert(filesBefore >= 3, s"banding produced only $filesBefore files")
    // point change touching ONE group
    spark.sql(s"UPDATE $t SET m = m + 5 WHERE k = 13") // g = 3 only
    assert(IncrementalMart.refresh(spark, mart) > 0)
    val v = Snapshots.versions(mart).last
    val mTxt = new String(Files.readAllBytes(Paths.get(s"$mart/_meta/$v.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    val carried = FileStats.carriedFromManifest(mTxt).size
    assert(carried == filesBefore - 1,
      s"expected all but one of $filesBefore files carried, got $carried: $mTxt")
    assert(martRows(mart) == rebuild(base))
  }

  test("NULL group values pair null-safely (no duplicate NULL rows, exact merge)") {
    import spark.implicits._
    val (t, base) = freshBase("b4", 4)
    val mart = s"$wh/m/b4_mart"
    // make k=0 a NULL-group row BEFORE the mart exists
    spark.sql(s"UPDATE $t SET g = NULL WHERE k = 0")
    IncrementalMart.initialize(spark, base, mart, Seq("g"), Seq("m"), bandFiles = 2)
    // touch the NULL group incrementally: k=3 moves into it
    spark.sql(s"UPDATE $t SET g = NULL WHERE k = 3")
    assert(IncrementalMart.refresh(spark, mart) > 0)
    val got = Snapshots.readLatest(spark, mart).collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    val nullRows = got.filter(_._1 == -1L)
    assert(nullRows == Seq((-1L, 2L, 0L + 30L)), got)
    assert(Snapshots.readLatest(spark, mart).count() == got.size) // no duplicated groups
    // and it still equals the rebuild (null-safe on both sides)
    val reb = Snapshots.readLatest(spark, base).groupBy("g")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("row_count"),
        org.apache.spark.sql.functions.sum("m").as("sum_m")).collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    assert(got == reb)
  }

  test("compaction crossing refreshes: base compact contributes zero changes; mart compact re-bands safely") {
    val (t, base) = freshBase("b6", 9)
    val mart = s"$wh/m/b6_mart"
    IncrementalMart.initialize(spark, base, mart, Seq("g"), Seq("m"), bandFiles = 2)
    // base compact between refreshes: state-identical by contract —
    // the refresh advances the marker with NO commit
    Snapshots.compact(spark, base)
    val martV = Snapshots.versions(mart).last
    assert(IncrementalMart.refresh(spark, mart) == -1L)
    assert(Snapshots.versions(mart).last == martV)
    // a fix AFTER the compact folds through normally
    spark.sql(s"UPDATE $t SET m = m + 5 WHERE k = 4")
    assert(IncrementalMart.refresh(spark, mart) > 0)
    assert(martRows(mart) == rebuild(base))
    // compact the MART (band structure replaced wholesale), then
    // another fix: the refresh re-collects stats over the compacted
    // layout and stays exact
    Snapshots.compact(spark, mart)
    spark.sql(s"DELETE FROM $t WHERE k = 7")
    assert(IncrementalMart.refresh(spark, mart) > 0)
    assert(martRows(mart) == rebuild(base))
  }

  test("full-state restatements fold through: rollback re-materializes, TRUNCATE empties the mart") {
    val (t, base) = freshBase("b8", 6)
    val mart = s"$wh/m/b8_mart"
    IncrementalMart.initialize(spark, base, mart, Seq("g"), Seq("m"), bandFiles = 2)
    spark.sql(s"UPDATE $t SET m = m + 100 WHERE k = 2") // v2
    assert(IncrementalMart.refresh(spark, mart) > 0)
    // rollback to v1 (a full-state commit whose capture is the keyed
    // diff of the restatement — the +100 retracts)
    Snapshots.rollback(spark, base, 1L)
    assert(IncrementalMart.refresh(spark, mart) > 0)
    assert(martRows(mart) == rebuild(base))
    assert(martRows(mart).map(_._3).sum == (0 until 6).map(_ * 10).sum)
    // TRUNCATE: every row retracts, every group dies, the mart empties
    spark.sql(s"TRUNCATE TABLE $t")
    assert(IncrementalMart.refresh(spark, mart) > 0)
    assert(Snapshots.readLatest(spark, mart).count() == 0)
  }

  test("crash after commit, before marker write: the manifest ledger prevents double-apply") {
    val (t, base) = freshBase("b7", 6)
    val mart = s"$wh/m/b7_mart"
    IncrementalMart.initialize(spark, base, mart, Seq("g"), Seq("m"), bandFiles = 2)
    val markerPath = Paths.get(mart, "_ivm.json")
    val preFix = new String(Files.readAllBytes(markerPath),
      java.nio.charset.StandardCharsets.UTF_8)
    spark.sql(s"UPDATE $t SET m = m + 100 WHERE k = 2")
    assert(IncrementalMart.refresh(spark, mart) > 0)
    val folded = martRows(mart)
    assert(folded == rebuild(base))
    // simulate the crash: the commit (and its ledger tag) are durable,
    // the marker write never happened
    Files.write(markerPath, preFix.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // the ledger says the mart already reflects the base head — a
    // re-fold would double-apply the +100; refresh must no-op
    val martV = Snapshots.versions(mart).last
    assert(IncrementalMart.refresh(spark, mart) == -1L)
    assert(Snapshots.versions(mart).last == martV)
    assert(martRows(mart) == folded)
    // and the NEXT real change folds exactly once on top
    spark.sql(s"UPDATE $t SET m = m + 1 WHERE k = 3")
    assert(IncrementalMart.refresh(spark, mart) > 0)
    assert(martRows(mart) == rebuild(base))
  }

  test("streaming composition: the exactly-once upsert sink feeds a maintained mart per micro-batch") {
    val (_, base) = freshBase("b9", 6)
    val mart = s"$wh/m/b9_mart"
    IncrementalMart.initialize(spark, base, mart, Seq("g"), Seq("m"), bandFiles = 2)
    // the foreachBatch loop a streaming pipeline runs: upsert the
    // micro-batch, then refresh the mart
    val write = Snapshots.idempotentUpsertWriter(base, "ivm_stream", Seq("k"))
    val b0 = spark.range(1, 3).selectExpr("id AS k", "id % 3 AS g", "id * 1000 AS m")
    write(b0, 0L)
    assert(IncrementalMart.refresh(spark, mart) > 0)
    assert(martRows(mart) == rebuild(base))
    // at-least-once REDELIVERY of the same batch: the sink skips (no
    // new base version), so the refresh is a marker read — the mart
    // cannot double-count the restated rows
    write(b0, 0L)
    assert(IncrementalMart.refresh(spark, mart) == -1L)
    assert(martRows(mart) == rebuild(base))
    // the next batch inserts a brand-new key (and group)
    val b1 = spark.range(30, 31).selectExpr("id AS k", "CAST(7 AS BIGINT) AS g", "id * 1000 AS m")
    write(b1, 1L)
    assert(IncrementalMart.refresh(spark, mart) > 0)
    assert(martRows(mart) == rebuild(base))
    assert(martRows(mart).exists(_._1 == 7L))
  }

  test("NULL measures stay rebuild-exact: all-NULL groups keep NULL sums, and a retraction back to all-NULL restores NULL (not 0)") {
    val t = s"$cat.m.b10"
    val base = s"$wh/m/b10"
    // group 0: all-NULL measures; group 1: one non-null row (k=1)
    spark.sql(s"CREATE TABLE $t TBLPROPERTIES('graft.changelog.keys'='k') AS " +
      "SELECT /*+ COALESCE(1) */ id AS k, id % 2 AS g, " +
      "CASE WHEN id = 1 THEN id * 10 END AS m FROM range(0, 4)")
    val mart = s"$wh/m/b10_mart"
    IncrementalMart.initialize(spark, base, mart, Seq("g"), Seq("m"), bandFiles = 2)
    def sums: Map[Long, Option[Long]] =
      Snapshots.readLatest(spark, mart).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(sums == Map(0L -> None, 1L -> Some(10L)))
    // touch BOTH groups so their bands rewrite: the all-NULL group's
    // sum must re-emit as NULL, never as coalesced 0
    spark.sql(s"INSERT INTO $t SELECT 10, 0, NULL UNION ALL SELECT 11, 1, NULL")
    assert(IncrementalMart.refresh(spark, mart) > 0)
    assert(sums == Map(0L -> None, 1L -> Some(10L)))
    // retract group 1's ONLY non-null row: additively 10-10 would be
    // 0, but the non-null count hits zero — the sum must be NULL,
    // exactly like a rebuild
    spark.sql(s"DELETE FROM $t WHERE k = 1")
    assert(IncrementalMart.refresh(spark, mart) > 0)
    assert(sums == Map(0L -> None, 1L -> None))
    // and the whole mart still equals the rebuild bit-for-bit
    val reb = Snapshots.readLatest(spark, base).groupBy("g")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("row_count"),
        org.apache.spark.sql.functions.sum("m").as("sum_m"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.col("m")).as("nn_m"))
    val martDf = Snapshots.readLatest(spark, mart)
    assert(martDf.exceptAll(reb).count() == 0 && reb.exceptAll(martDf).count() == 0)
  }

  // ---- r18: expression measures, COUNT(DISTINCT) side state, filters ----

  private def rebuildD(base: String): org.apache.spark.sql.DataFrame =
    Snapshots.readLatest(spark, base).groupBy("g")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("row_count"),
        org.apache.spark.sql.functions.sum("m").as("sum_m"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.col("m")).as("nn_m"),
        org.apache.spark.sql.functions.countDistinct(
          org.apache.spark.sql.functions.col("u")).as("cd_u"))

  private def sameRows(a: org.apache.spark.sql.DataFrame,
                       b: org.apache.spark.sql.DataFrame): Boolean =
    a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0

  test("COUNT(DISTINCT): multiplicity side state keeps the count exact through duplicate births and deaths") {
    import IncrementalMart.{MartDef, Measure}
    val t = s"$cat.m.d1"
    val base = s"$wh/m/d1"
    // u = k % 5 gives in-group duplicates; g = k % 3
    spark.sql(s"CREATE TABLE $t TBLPROPERTIES('graft.changelog.keys'='k') AS " +
      "SELECT /*+ COALESCE(1) */ id AS k, id % 3 AS g, id * 10 AS m, id % 5 AS u FROM range(0, 12)")
    val mart = s"$wh/m/d1_mart"
    IncrementalMart.initialize(spark, base, mart,
      MartDef(Seq("g"), Seq(Measure("m", "m")), Seq(Measure("u", "u"))),
      bandFiles = 2)
    assert(sameRows(Snapshots.readLatest(spark, mart), rebuildD(base)))
    // duplicate birth: (g=0, u=0) already exists via k=0 — cd_u must
    // NOT move; also a brand-new value u=9 in g=1 — cd_u +1 there
    spark.sql(s"INSERT INTO $t SELECT /*+ COALESCE(1) */ 100, 0, 1, 0 UNION ALL SELECT 101, 1, 1, 9")
    assert(IncrementalMart.refresh(spark, mart) > 0)
    assert(sameRows(Snapshots.readLatest(spark, mart), rebuildD(base)))
    // retract ONE of two (g=0, u=0) holders: multiplicity 2 -> 1, the
    // distinct count must NOT decrement
    spark.sql(s"DELETE FROM $t WHERE k = 100")
    assert(IncrementalMart.refresh(spark, mart) > 0)
    assert(sameRows(Snapshots.readLatest(spark, mart), rebuildD(base)))
    // retract the LAST holder: multiplicity 1 -> 0, decrement
    spark.sql(s"DELETE FROM $t WHERE k = 0")
    assert(IncrementalMart.refresh(spark, mart) > 0)
    assert(sameRows(Snapshots.readLatest(spark, mart), rebuildD(base)))
    // UPDATE moving a value: u 4 -> 7 for k=4 (g=1): one transition
    // out and one in — the distinct COUNT nets to zero, so the mart
    // commit is SKIPPED (net-zero groups never force band rewrites)
    // while the side state still advances
    val sideVsBefore = Snapshots.versions(s"$mart/_dstate/u").size
    spark.sql(s"UPDATE $t SET u = 7 WHERE k = 4")
    assert(IncrementalMart.refresh(spark, mart) == -1L)
    assert(Snapshots.versions(s"$mart/_dstate/u").size == sideVsBefore + 1,
      "the multiplicity side state must still fold the moved value")
    assert(sameRows(Snapshots.readLatest(spark, mart), rebuildD(base)))
    // NULL distinct values are ignored, like SQL COUNT(DISTINCT)
    spark.sql(s"INSERT INTO $t SELECT 200, 0, 5, NULL")
    assert(IncrementalMart.refresh(spark, mart) > 0)
    assert(sameRows(Snapshots.readLatest(spark, mart), rebuildD(base)))
    // quiet tail
    assert(IncrementalMart.refresh(spark, mart) == -1L)
  }

  test("expression measures + filter: the gold_daily_sales shape (conditional DECIMAL sum, conditional distinct) stays rebuild-exact") {
    import IncrementalMart.{MartDef, Measure}
    val t = s"$cat.m.d2"
    val base = s"$wh/m/d2"
    spark.sql(s"CREATE TABLE $t TBLPROPERTIES('graft.changelog.keys'='k') AS " +
      "SELECT /*+ COALESCE(1) */ id AS k, id % 2 AS d, " +
      "CASE WHEN id % 3 = 0 THEN 'p' WHEN id % 3 = 1 THEN 'v' END AS typ, " +
      "id * 100 AS price, id % 4 AS uid FROM range(0, 12)")
    val mart = s"$wh/m/d2_mart"
    val defn = MartDef(Seq("d"),
      sums = Seq(
        Measure("rev", "CAST(CASE WHEN typ = 'p' THEN price ELSE 0 END AS DECIMAL(12,2))"),
        Measure("orders", "CASE WHEN typ = 'p' THEN 1 ELSE 0 END")),
      distincts = Seq(Measure("buyers", "CASE WHEN typ = 'p' THEN uid END")),
      filter = Some("typ IS NOT NULL"))
    IncrementalMart.initialize(spark, base, mart, defn, bandFiles = 2)
    def reb: org.apache.spark.sql.DataFrame =
      Snapshots.readLatest(spark, base).filter("typ IS NOT NULL").groupBy("d")
        .agg(org.apache.spark.sql.functions.expr("count(1)").as("row_count"),
          org.apache.spark.sql.functions.expr(
            "sum(CAST(CASE WHEN typ = 'p' THEN price ELSE 0 END AS DECIMAL(12,2)))").as("sum_rev"),
          org.apache.spark.sql.functions.expr(
            "count(CAST(CASE WHEN typ = 'p' THEN price ELSE 0 END AS DECIMAL(12,2)))").as("nn_rev"),
          org.apache.spark.sql.functions.expr(
            "sum(CASE WHEN typ = 'p' THEN 1 ELSE 0 END)").as("sum_orders"),
          org.apache.spark.sql.functions.expr(
            "count(CASE WHEN typ = 'p' THEN 1 ELSE 0 END)").as("nn_orders"),
          org.apache.spark.sql.functions.expr(
            "count(DISTINCT CASE WHEN typ = 'p' THEN uid END)").as("cd_buyers"))
        .selectExpr("d", "row_count", "CAST(sum_rev AS DECIMAL(22,2)) AS sum_rev",
          "nn_rev", "sum_orders", "nn_orders", "cd_buyers")
    assert(sameRows(Snapshots.readLatest(spark, mart), reb))
    // a row crosses the FILTER boundary (typ -> NULL: leaves the mart)
    spark.sql(s"UPDATE $t SET typ = NULL WHERE k = 3")
    // a row crosses the CASE boundary (view -> purchase: revenue and
    // buyers move without the row entering or leaving)
    spark.sql(s"UPDATE $t SET typ = 'p' WHERE k = 4")
    assert(IncrementalMart.refresh(spark, mart) > 0)
    assert(sameRows(Snapshots.readLatest(spark, mart), reb))
    // and back across the filter inward
    spark.sql(s"UPDATE $t SET typ = 'v' WHERE k = 3")
    assert(IncrementalMart.refresh(spark, mart) > 0)
    assert(sameRows(Snapshots.readLatest(spark, mart), reb))
  }

  test("a crashed refresh (side state committed, mart commit failed) completes exactly on the next refresh") {
    import IncrementalMart.{MartDef, Measure}
    val t = s"$cat.m.d3"
    val base = s"$wh/m/d3"
    spark.sql(s"CREATE TABLE $t TBLPROPERTIES('graft.changelog.keys'='k') AS " +
      "SELECT /*+ COALESCE(1) */ id AS k, id % 3 AS g, id * 10 AS m, id % 5 AS u FROM range(0, 12)")
    val mart = s"$wh/m/d3_mart"
    IncrementalMart.initialize(spark, base, mart,
      MartDef(Seq("g"), Seq(Measure("m", "m")), Seq(Measure("u", "u"))),
      bandFiles = 2)
    spark.sql(s"INSERT INTO $t SELECT /*+ COALESCE(1) */ 100, 1, 1, 9 UNION ALL SELECT 101, 2, 2, 0")
    // force the MART commit to fail AFTER the side-state commit
    // succeeded: a debris version directory trips the serializability
    // gate (the real mid-refresh crash shape, injected end to end)
    val debris = Paths.get(mart, s"v=${Snapshots.versions(mart).last + 1}")
    Files.createDirectory(debris)
    intercept[Exception](IncrementalMart.refresh(spark, mart))
    // the side table committed its fold; the mart did not
    val side = s"$mart/_dstate/u"
    assert(Snapshots.versions(side).size == 2, "side state should have committed")
    // clear the debris (what removeOrphanFiles would do) and refresh:
    // the recovery path must SKIP the side merge (ledger already at
    // target), recompute the transitions from the side's pre-commit
    // version, and land the mart exactly once
    Files.delete(debris)
    assert(IncrementalMart.refresh(spark, mart) > 0)
    assert(sameRows(Snapshots.readLatest(spark, mart), rebuildD(base)))
    assert(Snapshots.versions(side).size == 2, "recovery must not re-merge the side state")
    // a further change folds once on top
    spark.sql(s"DELETE FROM $t WHERE k = 100")
    assert(IncrementalMart.refresh(spark, mart) > 0)
    assert(sameRows(Snapshots.readLatest(spark, mart), rebuildD(base)))
  }

  test("recovery crossing extra base commits: the crashed target completes first, then the loop reaches the head") {
    import IncrementalMart.{MartDef, Measure}
    val t = s"$cat.m.d4"
    val base = s"$wh/m/d4"
    spark.sql(s"CREATE TABLE $t TBLPROPERTIES('graft.changelog.keys'='k') AS " +
      "SELECT /*+ COALESCE(1) */ id AS k, id % 3 AS g, id * 10 AS m, id % 5 AS u FROM range(0, 9)")
    val mart = s"$wh/m/d4_mart"
    IncrementalMart.initialize(spark, base, mart,
      MartDef(Seq("g"), Seq(Measure("m", "m")), Seq(Measure("u", "u"))),
      bandFiles = 2)
    spark.sql(s"INSERT INTO $t SELECT /*+ COALESCE(1) */ 50, 0, 5, 9")
    val debris = Paths.get(mart, s"v=${Snapshots.versions(mart).last + 1}")
    Files.createDirectory(debris)
    intercept[Exception](IncrementalMart.refresh(spark, mart))
    Files.delete(debris)
    // MORE base commits land before the recovery runs
    spark.sql(s"DELETE FROM $t WHERE k = 50")
    spark.sql(s"UPDATE $t SET u = 9 WHERE k = 1")
    assert(IncrementalMart.refresh(spark, mart) > 0)
    assert(sameRows(Snapshots.readLatest(spark, mart), rebuildD(base)))
    assert(IncrementalMart.refresh(spark, mart) == -1L)
  }

  test("float sum measures are refused loudly; DECIMAL casts are the remedy") {
    import IncrementalMart.{MartDef, Measure}
    val t = s"$cat.m.d5"
    val base = s"$wh/m/d5"
    spark.sql(s"CREATE TABLE $t TBLPROPERTIES('graft.changelog.keys'='k') AS " +
      "SELECT /*+ COALESCE(1) */ id AS k, id % 2 AS g, CAST(id AS DOUBLE) AS x FROM range(0, 4)")
    val e = intercept[IllegalArgumentException] {
      IncrementalMart.initialize(spark, base, s"$wh/m/d5_mart",
        MartDef(Seq("g"), Seq(Measure("x", "x"))), bandFiles = 2)
    }
    assert(e.getMessage.contains("DECIMAL"), e.getMessage)
    // the cast IS accepted and maintains exactly
    val mart = s"$wh/m/d5_mart_ok"
    IncrementalMart.initialize(spark, base, mart,
      MartDef(Seq("g"), Seq(Measure("x", "CAST(x AS DECIMAL(10,2))"))), bandFiles = 2)
    spark.sql(s"INSERT INTO $t SELECT 10, 0, 2.5")
    assert(IncrementalMart.refresh(spark, mart) > 0)
    val got = Snapshots.readLatest(spark, mart).selectExpr("g", "CAST(sum_x AS STRING)")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(0L -> "4.50", 1L -> "4.00"), got)
  }

  test("refusals: non-changelog base; refresh without initialize") {
    spark.sql(s"CREATE TABLE $cat.m.b5 AS SELECT id AS k, id % 3 AS g, id AS m FROM range(0, 3)")
    val e1 = intercept[Exception] {
      IncrementalMart.initialize(spark, s"$wh/m/b5", s"$wh/m/b5_mart", Seq("g"), Seq("m"))
    }
    assert(e1.getMessage.contains("changelog-enabled"), e1.getMessage)
    val e2 = intercept[Exception] {
      IncrementalMart.refresh(spark, s"$wh/m/never_init")
    }
    assert(e2.getMessage.contains("initialize"), e2.getMessage)
  }
}
