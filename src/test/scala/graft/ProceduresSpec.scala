package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{GraftCatalog, Snapshots}

/** The SQL-callable maintenance surface — Spark 4's native
  * `ProcedureCatalog` contract (`CALL graft.system.<verb>(...)`, the
  * stored-procedure shape Iceberg established): every procedure is a
  * named binding over the corresponding [[Snapshots]] verb, so SQL
  * and library calls share one implementation and one report. */
class ProceduresSpec extends AnyFunSuite {
  import TestSession.spark

  private lazy val wh = Files.createTempDirectory("graft_proc_spec_").toString
  private lazy val cat: String = {
    spark.conf.set("spark.sql.catalog.gpr", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gpr.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gpr.m")
    "gpr"
  }

  test("compact, tags, retention and rollback through CALL; reports match the library verbs") {
    val t = s"$cat.m.t"
    val path = s"$wh/m/t"
    spark.sql(s"CREATE TABLE $t AS SELECT id AS k FROM range(0, 10)") // v1
    spark.sql(s"INSERT INTO $t SELECT id FROM range(10, 20)")         // v2
    spark.sql(s"INSERT INTO $t SELECT id FROM range(20, 30)")         // v3

    val tag = spark.sql(s"CALL $cat.system.create_tag(table => 'm.t', tag => 'audit', version => 2)")
      .collect()(0)
    assert(tag.getString(0) == "audit" && tag.getLong(1) == 2L)
    assert(Snapshots.tagsOf(path) == Map("audit" -> 2L))

    val comp = spark.sql(s"CALL $cat.system.compact(table => 'm.t')").collect()(0)
    assert(comp.getLong(0) == 4L) // the sealing full-state version

    // named-argument defaulting: keep_last defaults to -1 (unset), so
    // the age form works alone; tag pins v2 and transitively v1
    val exp = spark.sql(
      s"CALL $cat.system.expire_snapshots(table => 'm.t', keep_last => 1)")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(exp == Map(1L -> "kept", 2L -> "kept", 3L -> "expired", 4L -> "kept"))

    val dropped = spark.sql(s"CALL $cat.system.drop_tag(table => 'm.t', tag => 'audit')")
      .collect()(0)
    assert(dropped.getString(0) == "audit" && dropped.getLong(1) == 2L)
    spark.sql(s"CALL $cat.system.expire_snapshots(table => 'm.t', older_than_ms => ${System.currentTimeMillis() + 60000})")
      .collect()
    assert(Snapshots.versions(path) == Seq(4L))

    // rollback commits the old state FORWARD as v5
    val rb = spark.sql(s"CALL $cat.system.rollback_to_snapshot(table => 'm.t', version => 4)")
      .collect()(0)
    assert(rb.getLong(0) == 5L)
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) == 30L)
  }

  test("rewrite_zorder and remove_orphan_files through CALL") {
    val t = s"$cat.m.z"
    val path = s"$wh/m/z"
    spark.sql(s"""CREATE TABLE $t AS
      SELECT /*+ REPARTITION(8) */ CAST(id % 100 AS BIGINT) AS x,
        CAST(id DIV 100 AS BIGINT) AS y FROM range(0, 10000)""")
    val z = spark.sql(
      s"CALL $cat.system.rewrite_zorder(table => 'm.z', columns => 'x, y', target_files => 8)")
      .collect()(0)
    assert(z.getLong(0) == 2L && z.getInt(1) == 8)
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) == 10000L)

    val dead = java.nio.file.Paths.get(path, "v=9")
    Files.createDirectories(dead)
    Files.write(dead.resolve("junk.parquet"), Array[Byte](1))
    val orph = spark.sql(
      s"CALL $cat.system.remove_orphan_files(table => 'm.z', older_than_ms => 0)")
      .collect().map(r => (r.getString(0), r.getString(2)))
    assert(orph.toSeq == Seq(("v=9", "removed")))
    assert(!Files.exists(dead))
  }

  test("validation: unknown procedure, wrong namespace, both-or-neither retention args, bad table") {
    // the analyzer wraps load failures as FAILED_TO_LOAD_ROUTINE; the
    // catalog-side messages are still the loud ones (asserted direct)
    assert(intercept[Exception](
      spark.sql(s"CALL $cat.system.no_such(table => 'm.t')").collect())
      .getMessage.contains("FAILED_TO_LOAD_ROUTINE"))
    assert(intercept[Exception](
      spark.sql(s"CALL $cat.other.compact(table => 'm.t')").collect())
      .getMessage.contains("FAILED_TO_LOAD_ROUTINE"))
    val c = spark.sessionState.catalogManager.catalog("gpr").asInstanceOf[GraftCatalog]
    assert(intercept[Exception](c.loadProcedure(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("system"), "no_such")))
      .getMessage.contains("no such procedure"))
    assert(intercept[Exception](c.loadProcedure(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("other"), "compact")))
      .getMessage.contains("system"))
    spark.sql(s"CREATE TABLE $cat.m.v AS SELECT 1 AS a")
    assert(intercept[Exception](
      spark.sql(s"CALL $cat.system.expire_snapshots(table => 'm.v')").collect())
      .getMessage.contains("EXACTLY ONE"))
    assert(intercept[Exception](
      spark.sql(s"CALL $cat.system.expire_snapshots(table => 'm.v', keep_last => 1, older_than_ms => 5)").collect())
      .getMessage.contains("EXACTLY ONE"))
    assert(intercept[Exception](
      spark.sql(s"CALL $cat.system.compact(table => 'm.ghost')").collect())
      .getMessage.contains("no such table"))
    assert(intercept[Exception](
      spark.sql(s"CALL $cat.system.compact(table => 'unqualified')").collect())
      .getMessage.contains("namespace"))
  }

  test("init_mart / refresh_mart through CALL: the IVM loop as SQL verbs") {
    val t = s"$cat.m.ivmb"
    spark.sql(s"CREATE TABLE $t TBLPROPERTIES('graft.changelog.keys'='k') AS " +
      "SELECT /*+ COALESCE(1) */ id AS k, id % 3 AS g, id * 10 AS m FROM range(0, 9)")
    val init = spark.sql(s"CALL $cat.system.init_mart(base => 'm.ivmb', " +
      "mart => 'm.ivm_mart', dims => 'g', sums => 'm', band_files => 2, bloom_dims => true)")
      .collect()(0)
    assert(init.getString(0) == "m.ivm_mart" && init.getLong(1) == 1L)
    assert(graft.sources.BloomSkip.specOf(s"$wh/m/ivm_mart").map(_.columns) == Some(Seq("g")))
    // the mart IS a catalog table now — SQL-readable
    assert(spark.sql(s"SELECT count(*) FROM $cat.m.ivm_mart").collect()(0).getLong(0) == 3L)
    // quiet refresh: -1, no commit
    assert(spark.sql(s"CALL $cat.system.refresh_mart(mart => 'm.ivm_mart')")
      .collect()(0).getLong(1) == -1L)
    // a point fix folds through
    spark.sql(s"UPDATE $t SET m = m + 5 WHERE k = 4")
    assert(spark.sql(s"CALL $cat.system.refresh_mart(mart => 'm.ivm_mart')")
      .collect()(0).getLong(1) > 0)
    val got = spark.sql(s"SELECT g, row_count, sum_m FROM $cat.m.ivm_mart ORDER BY g")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((0L, 3L, 0L + 30L + 60L), (1L, 3L, 10L + 40L + 5L + 70L),
      (2L, 3L, 20L + 50L + 80L)), got)
    // creating over an existing table refuses
    assert(intercept[Exception](
      spark.sql(s"CALL $cat.system.init_mart(base => 'm.ivmb', mart => 'm.ivm_mart', " +
        "dims => 'g', sums => 'm')").collect())
      .getMessage.contains("already exists"))
  }
}
