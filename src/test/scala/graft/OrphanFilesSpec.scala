package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{GraftCatalog, Snapshots}

/** Orphan-file cleanup (Iceberg `remove_orphan_files`): debris under
  * the table root that no manifest references — the version directory
  * of a write that died between its file step and its manifest step,
  * and Spark `_temporary` staging trees — is removed; manifested
  * state, metadata files, and candidates younger than the `olderThan`
  * in-flight guard are never touched. */
class OrphanFilesSpec extends AnyFunSuite {
  import TestSession.spark

  private lazy val wh = Files.createTempDirectory("graft_orphan_spec_").toString
  private lazy val cat: String = {
    spark.conf.set("spark.sql.catalog.gor", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gor.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gor.m")
    "gor"
  }

  test("uncommitted version dirs and _temporary trees go; live state, metadata and young candidates stay") {
    val t = s"$cat.m.t"
    val path = s"$wh/m/t"
    spark.sql(s"CREATE TABLE $t AS SELECT id AS k FROM range(0, 10)") // v1
    spark.sql(s"INSERT INTO $t SELECT id FROM range(10, 20)")         // v2

    // a write that died after its file step: v=3 exists, no manifest
    val dead = Paths.get(path, "v=3")
    Files.createDirectories(dead)
    Files.write(dead.resolve("part-dead.parquet"), Array[Byte](1, 2, 3))
    // Spark staging debris at root and inside a live version dir
    val tmpRoot = Paths.get(path, "_temporary", "0")
    Files.createDirectories(tmpRoot)
    Files.write(tmpRoot.resolve("task.parquet"), Array[Byte](4))
    val tmpLive = Paths.get(path, "v=2", "_temporary")
    Files.createDirectories(tmpLive)
    Files.write(tmpLive.resolve("attempt.parquet"), Array[Byte](5))

    // a YOUNG candidate inside the guard window survives (it may be a
    // commit between its write and manifest steps)
    val young = Snapshots.removeOrphanFiles(spark, path, olderThanMs = 3600 * 1000)
      .collect().map(r => (r.getString(0), r.getString(2))).toMap
    assert(young.values.forall(_ == "kept-in-flight"), young.toString)
    assert(Files.exists(dead.resolve("part-dead.parquet")))

    // outside the window: all three trees removed, nothing else
    val res = Snapshots.removeOrphanFiles(spark, path, olderThanMs = 0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(res.map(_._1).sorted.toSeq ==
      Seq("_temporary", "v=2/_temporary", "v=3"), res.mkString(","))
    assert(res.forall(_._3 == "removed"))
    assert(!Files.exists(dead) && !Files.exists(tmpLive) &&
      !Files.exists(Paths.get(path, "_temporary")))
    // the live chain is intact and still reads exactly
    assert(Snapshots.versions(path) == Seq(1L, 2L))
    assert(spark.sql(s"SELECT count(*) AS c, sum(k) AS s FROM $t").head()
      .getLong(1) == (0L until 20L).sum)
    assert(Files.exists(Paths.get(path, "_schema.json")))
    // idempotent: a second sweep finds nothing
    assert(Snapshots.removeOrphanFiles(spark, path, olderThanMs = 0).count() == 0L)
  }
}
