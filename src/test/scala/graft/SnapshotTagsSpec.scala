package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{GraftCatalog, Snapshots}

/** Named snapshot tags (Iceberg tag refs): immutable name → version
  * pointers created/moved with `ALTER TABLE … SET TBLPROPERTIES
  * ('graft.tag.<name>'='<v>')` and dropped with `UNSET TBLPROPERTIES`,
  * readable as `VERSION AS OF '<name>'`, retention-exempt in
  * [[Snapshots.expireSnapshots]] (the tagged state AND everything it
  * still reads survive however far the keepLast window moves), and
  * ordinary expiry candidates again once dropped. Reference frame:
  * Iceberg refs over the snapshot surface the reference's
  * schema/audit jobs rely on (`spark/jobs/schema_check.py:33`). */
class SnapshotTagsSpec extends AnyFunSuite {
  import TestSession.spark

  private lazy val wh = Files.createTempDirectory("graft_tags_spec_").toString
  private lazy val cat: String = {
    spark.conf.set("spark.sql.catalog.gtg", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtg.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtg.refs")
    "gtg"
  }

  private def mkChain(name: String): (String, String) = {
    val t = s"$cat.refs.$name"
    spark.sql(s"CREATE TABLE $t AS SELECT id AS k, id * 2 AS v FROM range(0, 10)") // v1
    spark.sql(s"INSERT INTO $t SELECT id, id * 2 FROM range(10, 20)")              // v2 append
    spark.sql(s"INSERT INTO $t SELECT id, id * 2 FROM range(20, 30)")              // v3 append
    (t, s"$wh/refs/$name")
  }

  test("create, read by name, move, drop — SQL verbs and library API agree") {
    val (t, path) = mkChain("basic")
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('graft.tag.audit'='2')")
    assert(Snapshots.tagsOf(path) == Map("audit" -> 2L))
    // VERSION AS OF '<tag>' reads exactly the tagged snapshot's state
    val byTag = spark.sql(s"SELECT count(*) AS c, sum(v) AS s FROM $t VERSION AS OF 'audit'").head()
    val byV = spark.sql(s"SELECT count(*) AS c, sum(v) AS s FROM $t VERSION AS OF 2").head()
    assert(byTag == byV && byTag.getLong(0) == 20L)
    // DESCRIBE-visible property surface
    assert(spark.sessionState.catalogManager.catalog("gtg")
      .asInstanceOf[GraftCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array("refs"), "basic"))
      .properties().get("graft.tag.audit") == "2")
    // SET on an existing tag MOVES it (property-set semantics)
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('graft.tag.audit'='3')")
    assert(Snapshots.tagsOf(path) == Map("audit" -> 3L))
    // library create without replace refuses a taken name
    assert(intercept[Exception](Snapshots.createTag(path, "audit", 1))
      .getMessage.contains("already exists"))
    spark.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES('graft.tag.audit')")
    assert(Snapshots.tagsOf(path).isEmpty)
    // a dropped tag no longer resolves; the message names the live refs
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM $t VERSION AS OF 'audit'").collect())
    assert(e.getMessage.contains("not a snapshot number, tag or branch"), e.getMessage)
  }

  test("validation: digit-only names, unknown versions, dropping absent tags") {
    val (t, path) = mkChain("valid")
    assert(intercept[Exception](Snapshots.createTag(path, "7", 1))
      .getMessage.contains("not be all digits"))
    assert(intercept[Exception](Snapshots.createTag(path, "bad name", 1))
      .getMessage.contains("tag name"))
    assert(intercept[Exception](Snapshots.createTag(path, "ghost", 99))
      .getMessage.contains("no snapshot 99"))
    assert(intercept[Exception](Snapshots.dropTag(path, "ghost"))
      .getMessage.contains("no tag ghost"))
    assert(intercept[Exception](
      spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('graft.tag.x'='notanumber')"))
      .getMessage.contains("snapshot version number"))
  }

  test("expiry honors tags transitively: the tagged append's whole read chain survives; dropping frees it") {
    val (t, path) = mkChain("expire")
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('graft.tag.audit'='2')")
    Snapshots.compact(spark, path) // v4 seals the chain
    // keepLast=1 would reap v1..v3 — but the tag pins v2, and v2 is an
    // APPEND whose state still reads v1's directory, so v1 survives
    // too; only the untagged, unreferenced v3 expires
    Snapshots.expireSnapshots(spark, path, keepLast = 1).collect()
    assert(Snapshots.versions(path) == Seq(1L, 2L, 4L))
    val byTag = spark.sql(s"SELECT count(*) AS c, sum(v) AS s FROM $t VERSION AS OF 'audit'").head()
    assert(byTag.getLong(0) == 20L && byTag.getLong(1) == (0L until 20L).map(_ * 2).sum)
    // dropping the tag makes the pinned chain ordinary candidates again
    spark.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES('graft.tag.audit')")
    Snapshots.expireSnapshots(spark, path, keepLast = 1).collect()
    assert(Snapshots.versions(path) == Seq(4L))
    val current = spark.sql(s"SELECT count(*) AS c FROM $t").head()
    assert(current.getLong(0) == 30L)
    assert(intercept[Exception](
      spark.sql(s"SELECT * FROM $t VERSION AS OF 2").collect())
      .getMessage.contains("no snapshot 2"))
  }

  test("age-based expiry selects by TIMESTAMP, not version position: non-monotone commit times expire correctly") {
    import spark.implicits._
    val path = s"$wh/refs/nonmono"
    // caller-injected commit times make the history non-monotone:
    // v1 is YOUNG (t=5000), v2..v3 are OLD (t=1000, 2000) — a
    // prefix-cut-by-position would expire young v1 and keep old v2
    Snapshots.writeSnapshot(Seq(1L).toDF("k"), path, commitTsMs = Some(5000L))
    Snapshots.writeSnapshot(Seq(2L).toDF("k"), path, commitTsMs = Some(1000L))
    Snapshots.writeSnapshot(Seq(3L).toDF("k"), path, commitTsMs = Some(2000L))
    Snapshots.writeSnapshot(Seq(4L).toDF("k"), path, commitTsMs = Some(6000L)) // current
    val out = Snapshots.expireSnapshotsOlderThan(spark, path, cutoffMs = 3000L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // old v2 and v3 expire; young v1 survives the cutoff; current kept
    assert(out == Map(1L -> "kept", 2L -> "expired", 3L -> "expired", 4L -> "kept"), out)
    assert(Snapshots.versions(path) == Seq(1L, 4L))
  }

  test("age-based expiry (older_than): prefix cut, current always kept, tags still pin") {
    val (t, path) = mkChain("age")
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('graft.tag.keepme'='2')")
    // cutoff before every commit: nothing expires
    val none = Snapshots.expireSnapshotsOlderThan(spark, path, cutoffMs = 0L)
      .select("status").collect().map(_.getString(0))
    assert(none.forall(_ == "kept"))
    // cutoff after every commit: everything but the current version is
    // a candidate — but the current v3 is an APPEND whose state still
    // reads v1 and v2, so the read-chain pinning keeps all three (and
    // the tag on v2 would too)
    val after = Snapshots.expireSnapshotsOlderThan(
      spark, path, cutoffMs = System.currentTimeMillis() + 60000L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(after == Map(1L -> "kept", 2L -> "kept", 3L -> "kept"))
    // drop the tag: the same cutoff now reaps the chain's prefix...
    // v3 is an APPEND whose state reads v1+v2 too — seal with a
    // compact first so the walk has something reapable
    spark.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES('graft.tag.keepme')")
    Snapshots.compact(spark, path) // v4
    Snapshots.expireSnapshotsOlderThan(
      spark, path, cutoffMs = System.currentTimeMillis() + 60000L).collect()
    assert(Snapshots.versions(path) == Seq(4L))
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) == 30L)
  }
}
