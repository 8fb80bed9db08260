package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{GraftCatalog, Snapshots}

/** Iceberg-style metadata tables: `SELECT * FROM graft.ns.t.snapshots
  * / .history / .refs / .files` resolve through the catalog's suffix
  * fallback to read-only relations over the manifest plane — no data
  * file is opened. */
class MetadataTablesSpec extends AnyFunSuite {
  import TestSession.spark

  private lazy val wh = Files.createTempDirectory("graft_metatbl_spec_").toString
  private lazy val cat: String = {
    spark.conf.set("spark.sql.catalog.gmt", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmt.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmt.m")
    "gmt"
  }

  test("snapshots, history, refs and files list the manifest plane exactly") {
    val t = s"$cat.m.t"
    spark.sql(s"CREATE TABLE $t AS SELECT /*+ COALESCE(1) */ id AS k FROM range(0, 10)")
    spark.sql(s"INSERT INTO $t SELECT /*+ COALESCE(1) */ id FROM range(10, 25)")
    spark.sql(s"CALL $cat.system.create_tag(table => 'm.t', tag => 'audit', version => 1)")

    val snaps = spark.sql(s"SELECT version, operation, row_count FROM $t.snapshots ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(snaps.length == 2)
    // snapshot row_count is the STATE's cumulative rows (the library
    // `snapshots()` contract), per-file counts live in `.files`
    assert(snaps(0)._3 == 10L && snaps(1)._3 == 25L)
    assert(snaps(1)._2 == "append")

    val hist = spark.sql(s"SELECT version, is_current FROM $t.history ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    assert(hist.toSeq == Seq((1L, false), (2L, true)))

    val refs = spark.sql(s"SELECT * FROM $t.refs").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(refs.toSeq == Seq(("audit", "tag", 1L)))

    val files = spark.sql(s"SELECT file, version, row_count, bytes FROM $t.files ORDER BY file")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(files.length == 2, files.mkString(","))
    assert(files.map(_._2).toSeq == Seq(1L, 2L))
    assert(files.map(_._3).toSeq == Seq(10L, 15L))
    assert(files.forall(f => f._1.startsWith(s"v=${f._2}/") && f._4 > 0))

    // the listing is a metadata read: filters/projections work as SQL,
    // joining against the data table stays possible
    assert(spark.sql(
      s"SELECT sum(row_count) FROM $t.files WHERE version = 2").collect()(0).getLong(0) == 15L)
  }

  test("resolution: a leaf table named like a kind is never shadowed; unknown suffixes stay loud") {
    // a REAL table named 'files' under a namespace resolves as itself
    spark.sql(s"CREATE TABLE $cat.m.files AS SELECT 1 AS a")
    assert(spark.sql(s"SELECT * FROM $cat.m.files").collect()(0).getInt(0) == 1)
    // metadata kinds only exist under a TABLE parent
    assert(intercept[Exception](
      spark.sql(s"SELECT * FROM $cat.m.ghost.snapshots").collect())
      .getMessage.toLowerCase.contains("table"))
    // an unknown suffix under a table parent is not a table
    spark.sql(s"CREATE TABLE $cat.m.real AS SELECT 1 AS a")
    assert(intercept[Exception](
      spark.sql(s"SELECT * FROM $cat.m.real.bogus").collect())
      .getMessage.toLowerCase.contains("table"))
  }

  test("files lists laid-out tables per expanded file with layout directory segments intact") {
    val t = s"$cat.m.laid"
    spark.sql(s"CREATE TABLE $t (d DATE, k BIGINT) PARTITIONED BY (days(d))")
    spark.sql(s"INSERT INTO $t SELECT DATE_ADD(DATE '2024-01-01', CAST(id % 3 AS INT)), id FROM range(0, 9)")
    val files = spark.sql(s"SELECT file, version, row_count FROM $t.files ORDER BY file")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(files.length == 3, files.mkString(","))
    assert(files.forall(f => f._1.contains("__graft_days=") && f._2 == 1L && f._3 == 3L))
  }

  test("partitions rolls up per layout value from manifest arithmetic — zero data files planned") {
    val t = s"$cat.m.part"
    spark.sql(s"CREATE TABLE $t (d DATE, k BIGINT) PARTITIONED BY (days(d))")
    spark.sql(s"INSERT INTO $t SELECT DATE_ADD(DATE '2024-01-01', CAST(id % 3 AS INT)), id FROM range(0, 9)") // v1: 3 days × 3 rows
    spark.sql(s"INSERT INTO $t SELECT DATE_ADD(DATE '2024-01-03', CAST(id AS INT)), id FROM range(0, 2)") // v2: +1 row on day 3, +1 new day 4
    val df = spark.sql(
      s"SELECT `partition`, file_count, record_count, total_size_bytes FROM $t.partitions ORDER BY `partition`")
    // the listing is a LocalScan over the manifest plane: the plan
    // must contain NO file scan at all
    assert(!df.queryExecution.executedPlan.toString.contains("BatchScan"),
      df.queryExecution.executedPlan.toString)
    val rows = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def day(d: String) = s"__graft_days=${java.time.LocalDate.parse(d).toEpochDay}"
    assert(rows.map(x => (x._1, x._2, x._3)).toSeq == Seq(
      (day("2024-01-01"), 1L, 3L),
      (day("2024-01-02"), 1L, 3L),
      (day("2024-01-03"), 2L, 4L),
      (day("2024-01-04"), 1L, 1L)), rows.mkString(","))
    assert(rows.forall(_._4 > 0))
    // an unlaid table rolls up as one '<unpartitioned>' row
    val t2 = s"$cat.m.part2"
    spark.sql(s"CREATE TABLE $t2 AS SELECT /*+ COALESCE(1) */ id AS k FROM range(0, 5)")
    val flat = spark.sql(s"SELECT `partition`, file_count, record_count FROM $t2.partitions")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(flat.toSeq == Seq(("<unpartitioned>", 1L, 5L)))
  }

  test("manifests lists the commit chain: own/carried files and both delete-entry kinds") {
    import spark.implicits._
    val t = s"$cat.m.man"
    val path = s"$wh/m/man"
    spark.sql(s"CREATE TABLE $t AS SELECT /*+ COALESCE(1) */ id AS k, id AS v FROM range(0, 10)") // v1
    Snapshots.upsertBatch(spark, path, Seq((1L, 11L)).toDF("k", "v"), Seq("k")) // v2: eq entry
    spark.conf.set("spark.graft.delete.mode", "merge-on-read")
    try spark.sql(s"DELETE FROM $t WHERE k = 2") // v3: positional sidecar, all carried
    finally spark.conf.set("spark.graft.delete.mode", "copy-on-write")
    val df = spark.sql(s"SELECT version, operation, own_files, carried_files, " +
      s"pos_delete_entries, eq_delete_entries, path FROM $t.manifests ORDER BY version")
    assert(!df.queryExecution.executedPlan.toString.contains("BatchScan"))
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getString(6)))
    assert(rows.length == 3, rows.mkString(","))
    assert(rows(0) == ((1L, "overwrite", 1L, 0L, 0L, 0L, "_meta/1.json")), rows(0))
    assert(rows(1) == ((2L, "append", 1L, 0L, 0L, 1L, "_meta/2.json")), rows(1))
    // the MoR DELETE owns no data files, carries both priors, and its
    // manifest re-carries the surviving equality entry
    assert(rows(2) == ((3L, "delete", 0L, 2L, 1L, 1L, "_meta/3.json")), rows(2))
  }

  test("entries lists every (version, file) pair with added/carried status and origin provenance") {
    val t = s"$cat.m.ent"
    spark.sql(s"CREATE TABLE $t AS SELECT /*+ COALESCE(1) */ id AS k FROM range(0, 10)") // v1
    spark.sql(s"INSERT INTO $t SELECT /*+ COALESCE(1) */ id FROM range(10, 15)") // v2
    spark.conf.set("spark.graft.delete.mode", "merge-on-read")
    try spark.sql(s"DELETE FROM $t WHERE k = 3") // v3: carries both by ref
    finally spark.conf.set("spark.graft.delete.mode", "copy-on-write")
    val df = spark.sql(s"SELECT version, status, file, row_count, origin_version " +
      s"FROM $t.entries ORDER BY version, file")
    assert(!df.queryExecution.executedPlan.toString.contains("BatchScan"))
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
    // v1/v2 each add one file at their own origin; v3 adds none and
    // carries both priors at their ORIGINAL origins
    assert(rows.count(_._2 == "added") == 2 && rows.count(_._2 == "carried") == 2,
      rows.mkString(","))
    val carried = rows.filter(_._2 == "carried")
    assert(carried.forall(_._1 == 3L) &&
      carried.map(_._5).sorted.toSeq == Seq(1L, 2L), rows.mkString(","))
    assert(rows.filter(_._2 == "added").forall(e => e._1 == e._5 &&
      e._3.startsWith(s"v=${e._1}/")))
    // provenance join: which commits still reference v1's file
    assert(spark.sql(s"SELECT count(*) FROM $t.entries WHERE origin_version = 1")
      .collect()(0).getLong(0) == 2L)
  }

  test("files reflects carried refs and sidecar-bearing states by manifest row counts") {
    val t = s"$cat.m.mor"
    val path = s"$wh/m/mor"
    spark.sql(s"CREATE TABLE $t AS SELECT /*+ COALESCE(1) */ id AS k FROM range(0, 10)")
    spark.conf.set("spark.graft.delete.mode", "merge-on-read")
    try spark.sql(s"DELETE FROM $t WHERE k = 3")
    finally spark.conf.set("spark.graft.delete.mode", "copy-on-write")
    // the data file is carried by reference under the live sidecar;
    // files lists the PHYSICAL manifest row count (the sidecar is
    // metadata, not a data file)
    val files = spark.sql(s"SELECT file, row_count FROM $t.files").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(files.length == 1 && files(0)._2 == 10L, files.mkString(","))
    assert(Snapshots.liveDeletes(path, Snapshots.versions(path).last).nonEmpty)
  }
}
