package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{GraftCatalog, Snapshots}

/** Metadata-only layout (partition-spec) evolution — the Iceberg
  * `ALTER TABLE … REPLACE PARTITION FIELD` semantics surfaced as
  * `ALTER TABLE t SET TBLPROPERTIES('graft.layout' = 'days(col)' |
  * 'bucket(n, col)' | 'none')`: existing data files keep their old
  * directory layout forever (no file is read or written by the verb),
  * writes from the next version on lay out under the new spec, reads
  * stay exact throughout (manifest-stats pruning never depended on
  * directories), and storage-partitioned-join grouping gates on era
  * alignment — a mixed-era table plans a CORRECT shuffle join, never
  * a wrong co-located one — until `compact()` rewrites the live set
  * under the current spec and the zero-shuffle plan returns.
  * Reference frame: Iceberg partition spec evolution over the bronze
  * DDL surface (`/root/reference/spark/jobs/bronze_ingestion.py:113`). */
class LayoutEvolutionSpec extends AnyFunSuite {
  import TestSession.spark

  private lazy val wh = Files.createTempDirectory("graft_layoutevo_spec_").toString
  private lazy val cat: String = {
    spark.conf.set("spark.sql.catalog.gle", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gle.warehouse", wh)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gle.evo")
    "gle"
  }

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.datasources.FilePartition
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    df.collect()
    def leaves(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p.collectLeaves().flatMap {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => leaves(q.plan)
        case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
        case l => Seq(l)
      }
    leaves(df.queryExecution.executedPlan).flatMap {
      case b: BatchScanExec => b.inputPartitions.flatMap {
        case fp: FilePartition => fp.files.map(_.filePath.toString).toSeq
        case p: graft.sources.GraftBucketed.BucketPartition =>
          p.inner.files.map(_.filePath.toString).toSeq
        case _ => Seq.empty
      }
      case _ => Seq.empty
    }.distinct
  }

  /** (sort-merge-join count, shuffles BELOW those joins) — the final
    * global-aggregate exchange above the join is not the join's. */
  private def smjShuffles(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    import org.apache.spark.sql.execution.SparkPlan
    df.collect()
    def expand(p: SparkPlan): Seq[SparkPlan] = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => expand(q.plan)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        expand(a.executedPlan)
      case other => Seq(other)
    }
    def shufflesIn(p: SparkPlan): Long =
      expand(p).map { n =>
        (n match {
          case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => 1L
          case _ => 0L
        }) + n.children.map(shufflesIn).sum
      }.sum
    def smjs(p: SparkPlan): Seq[SparkPlan] =
      expand(p).flatMap {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => Seq(j)
        case n => n.children.flatMap(smjs)
      }
    val joins = smjs(df.queryExecution.executedPlan)
    (joins.size.toLong, joins.map(j => j.children.map(shufflesIn).sum).sum)
  }

  private def dataFilesOf(table: String): Seq[java.nio.file.Path] =
    scala.util.Using.resource(Files.walk(Paths.get(table))) { w =>
      import scala.jdk.CollectionConverters._
      w.iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
        .toVector
    }

  test("plain -> days: metadata-only verb, per-era pruning, compaction restores full pruning") {
    val t = s"$cat.evo.p2d"
    val path = s"$wh/evo/p2d"
    spark.sql(s"CREATE TABLE $t (event_date DATE, n BIGINT) USING iceberg")
    // interleaved dates in one plain file: band stats span everything
    spark.range(0, 32).selectExpr(
      "DATE_ADD(DATE '2024-03-01', CAST(id % 8 AS INT)) AS event_date", "id AS n")
      .coalesce(1).createOrReplaceTempView("__evo_p2d_a")
    spark.sql(s"INSERT INTO $t SELECT * FROM __evo_p2d_a")
    val filesBefore = dataFilesOf(path).map(p => p -> Files.getLastModifiedTime(p))
    val versionsBefore = Snapshots.versions(path)

    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('graft.layout'='days(event_date)')")

    // the verb touched NOTHING: no new version, no file written or modified
    assert(Snapshots.versions(path) == versionsBefore)
    assert(dataFilesOf(path).map(p => p -> Files.getLastModifiedTime(p)) == filesBefore)

    // post-evolution appends lay out one directory per day
    spark.range(100, 116).selectExpr(
      "DATE_ADD(DATE '2024-03-01', CAST(id % 8 AS INT)) AS event_date", "id AS n")
      .createOrReplaceTempView("__evo_p2d_b")
    spark.sql(s"INSERT INTO $t SELECT * FROM __evo_p2d_b")
    val v2 = Snapshots.versions(path).last
    val newDirs = scala.util.Using.resource(Files.list(Paths.get(s"$path/v=$v2"))) { ls =>
      import scala.jdk.CollectionConverters._
      ls.iterator().asScala.map(_.getFileName.toString).toVector
    }
    assert(newDirs.count(_.startsWith("__graft_days=")) == 8, newDirs.mkString(","))
    // the derived layout column never reaches the schema
    assert(spark.table(t).columns.toSeq == Seq("event_date", "n"))

    // a 2-day band probe: the pre-evolution file has band-spanning
    // stats (scanned), the new era contributes exactly its 2 day files
    val band = spark.sql(s"""SELECT count(*) AS c, sum(n) AS s FROM $t
      WHERE event_date BETWEEN DATE '2024-03-02' AND DATE '2024-03-03'""")
    val scanned = scannedFiles(band)
    assert(scanned.count(!_.contains("__graft_days=")) == 1, scanned.mkString(","))
    assert(scanned.count(_.contains("__graft_days=")) == 2, scanned.mkString(","))
    val expBand = ((0L until 32L) ++ (100L until 116L)).filter(i => i % 8 == 1 || i % 8 == 2)
    assert(band.head().getLong(0) == expBand.size && band.head().getLong(1) == expBand.sum)

    // compaction rewrites the live set under the CURRENT spec: the
    // same probe now scans exactly the band's day files
    Snapshots.compact(spark, path)
    val band2 = spark.sql(s"""SELECT count(*) AS c, sum(n) AS s FROM $t
      WHERE event_date BETWEEN DATE '2024-03-02' AND DATE '2024-03-03'""")
    val scanned2 = scannedFiles(band2)
    assert(scanned2.size == 2 && scanned2.forall(_.contains("__graft_days=")),
      scanned2.mkString(","))
    assert(band2.head().getLong(0) == expBand.size && band2.head().getLong(1) == expBand.sum)
  }

  test("bucket(4) -> bucket(8): mixed eras degrade SPJ to a CORRECT shuffle join; compaction realigns") {
    def mk(name: String): (String, String) = {
      val t = s"$cat.evo.$name"
      spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT) PARTITIONED BY (bucket(4, k))")
      spark.range(0, 64).selectExpr("id AS k", "id * 10 AS v")
        .createOrReplaceTempView(s"__evo_$name")
      spark.sql(s"INSERT INTO $t SELECT * FROM __evo_$name")
      (t, s"$wh/evo/$name")
    }
    val (l, lp) = mk("b2bl")
    val (r, rp) = mk("b2br")
    def join = spark.sql(
      s"SELECT /*+ MERGE(rr) */ count(*) AS c, sum(ll.v + rr.v) AS s FROM $l ll JOIN $r rr ON ll.k = rr.k")
    // aligned bucket(4) on both sides: the co-located join has no shuffle
    assert(smjShuffles(join) == ((1L, 0L)))

    spark.sql(s"ALTER TABLE $l SET TBLPROPERTIES('graft.layout'='bucket(8, k)')")
    spark.sql(s"ALTER TABLE $r SET TBLPROPERTIES('graft.layout'='bucket(8, k)')")
    spark.range(64, 96).selectExpr("id AS k", "id * 10 AS v")
      .createOrReplaceTempView("__evo_b2b_more")
    spark.sql(s"INSERT INTO $l SELECT * FROM __evo_b2b_more")
    spark.sql(s"INSERT INTO $r SELECT * FROM __evo_b2b_more")

    // THE TRAP this gate exists for: pre-evolution files still sit in
    // __graft_bucket=0..3 directories whose keys were derived under
    // n=4 — values 0..3 are a SUBSET of the bucket(8) key domain, so
    // segment-value grouping would pass the subset check and route
    // rows to wrong SPJ partitions. The era gate must refuse grouping
    // (shuffles appear) and the join must stay row-exact.
    val mixed = join
    assert(smjShuffles(mixed)._2 > 0L)
    val row = mixed.head()
    val exp = (0L until 96L).map(i => 2 * i * 10).sum
    assert(row.getLong(0) == 96L && row.getLong(1) == exp)

    // compaction rewrites both live sets under bucket(8): zero-shuffle returns
    Snapshots.compact(spark, lp)
    Snapshots.compact(spark, rp)
    val realigned = join
    assert(smjShuffles(realigned) == ((1L, 0L)))
    assert(realigned.head().getLong(0) == 96L && realigned.head().getLong(1) == exp)
  }

  test("days -> bucket cross-kind and -> none: reads exact, no partition discovery of old layout dirs") {
    val t = s"$cat.evo.x"
    val path = s"$wh/evo/x"
    spark.sql(s"CREATE TABLE $t (d DATE, k BIGINT) PARTITIONED BY (days(d))")
    spark.range(0, 12).selectExpr(
      "DATE_ADD(DATE '2024-06-01', CAST(id % 3 AS INT)) AS d", "id AS k")
      .createOrReplaceTempView("__evo_x_a")
    spark.sql(s"INSERT INTO $t SELECT * FROM __evo_x_a")

    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('graft.layout'='bucket(2, k)')")
    spark.sql(s"INSERT INTO $t SELECT DATE '2024-06-04' AS d, id AS k FROM range(100, 104)")
    val v2 = Snapshots.versions(path).last
    val dirs = scala.util.Using.resource(Files.list(Paths.get(s"$path/v=$v2"))) { ls =>
      import scala.jdk.CollectionConverters._
      ls.iterator().asScala.map(_.getFileName.toString).toVector
    }
    val layoutDirs = dirs.filter(_.startsWith("__graft"))
    assert(layoutDirs.nonEmpty && layoutDirs.forall(_.startsWith("__graft_bucket=")),
      dirs.mkString(","))

    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('graft.layout'='none')")
    spark.sql(s"INSERT INTO $t SELECT DATE '2024-06-05' AS d, id AS k FROM range(200, 202)")
    // three eras on disk (days, bucket, plain); schema stays clean and
    // every row reads back exactly
    assert(spark.table(t).columns.toSeq == Seq("d", "k"))
    val all = spark.sql(s"SELECT count(*) AS c, sum(k) AS s FROM $t").head()
    val expSum = (0L until 12L).sum + (100L until 104L).sum + (200L until 202L).sum
    assert(all.getLong(0) == 18L && all.getLong(1) == expSum)
    // time travel to the pre-evolution snapshot is unaffected
    val pinned = spark.sql(s"SELECT count(*) AS c FROM $t VERSION AS OF 1").head()
    assert(pinned.getLong(0) == 12L)
  }

  test("validation: bad expressions, unknown and mistyped columns, bucket(0), no-op redeclaration") {
    val t = s"$cat.evo.v"
    val path = s"$wh/evo/v"
    spark.sql(s"CREATE TABLE $t (d DATE, s STRING, k BIGINT) USING iceberg")
    spark.sql(s"INSERT INTO $t VALUES (DATE '2024-01-01', 'a', 1)")
    def evolveTo(expr: String): Unit =
      spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('graft.layout'='$expr')")
    assert(intercept[Exception](evolveTo("hours(d)")).getMessage.contains("graft.layout"))
    assert(intercept[Exception](evolveTo("days(nope)")).getMessage.contains("not in schema"))
    assert(intercept[Exception](evolveTo("days(s)")).getMessage.contains("DATE or TIMESTAMP"))
    assert(intercept[Exception](evolveTo("bucket(0, k)")).getMessage.contains("bucket"))
    // a no-op redeclaration records no era; a real one does
    val marker = Paths.get(path, "_layout.json")
    assert(!Files.exists(marker))
    evolveTo("none")
    assert(!Files.exists(marker)) // plain -> none: nothing to record
    evolveTo("days(d)")
    val one = new String(Files.readAllBytes(marker))
    evolveTo("days(d)")
    assert(new String(Files.readAllBytes(marker)) == one)
    // redefinition with no data written in between REPLACES the
    // pending era (strictly increasing from_v invariant)
    evolveTo("bucket(2, k)")
    assert(!new String(Files.readAllBytes(marker)).contains("days"))
  }

  test("column guards follow the CURRENT spec: evolving away frees the old source column") {
    val t = s"$cat.evo.g"
    spark.sql(s"CREATE TABLE $t (d DATE, k BIGINT, x BIGINT) PARTITIONED BY (days(d))")
    spark.sql(s"INSERT INTO $t VALUES (DATE '2024-01-01', 1, 10)")
    // the active layout source column refuses rename/drop/retype
    assert(intercept[Exception](
      spark.sql(s"ALTER TABLE $t RENAME COLUMN d TO dd")).getMessage.contains("layout"))
    assert(intercept[Exception](
      spark.sql(s"ALTER TABLE $t DROP COLUMN d")).getMessage.contains("layout"))
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('graft.layout'='bucket(2, k)')")
    // now k is load-bearing, d is inert (old directories are physical
    // path segments, nothing re-derives from the column)
    assert(intercept[Exception](
      spark.sql(s"ALTER TABLE $t RENAME COLUMN k TO kk")).getMessage.contains("layout"))
    spark.sql(s"ALTER TABLE $t RENAME COLUMN d TO dd")
    assert(spark.table(t).columns.toSeq == Seq("dd", "k", "x"))
    assert(spark.sql(s"SELECT sum(k) FROM $t WHERE dd = DATE '2024-01-01'")
      .head().getLong(0) == 1L)
  }

  test("composes with live RENAME eras: the new spec binds the current name, era reads stay exact") {
    val t = s"$cat.evo.rn"
    val path = s"$wh/evo/rn"
    spark.sql(s"CREATE TABLE $t (d DATE, k BIGINT) USING iceberg")
    spark.sql(s"INSERT INTO $t SELECT DATE '2024-01-01', id FROM range(0, 8)")
    // metadata-only rename leaves the old physical name in v=1's files
    spark.sql(s"ALTER TABLE $t RENAME COLUMN k TO kk")
    // evolving the layout onto the RENAMED column validates against
    // current names; writes derive from current-name frames
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('graft.layout'='bucket(2, kk)')")
    spark.sql(s"INSERT INTO $t SELECT DATE '2024-01-02', id FROM range(100, 104)")
    // the era-union read crosses rename AND layout eras exactly
    val r = spark.sql(s"SELECT count(*) AS c, sum(kk) AS s FROM $t WHERE kk >= 0").head()
    assert(r.getLong(0) == 12L && r.getLong(1) == (0L until 8L).sum + (100L until 104L).sum)
    // compaction materializes both: current names, current layout
    Snapshots.compact(spark, path)
    val v = Snapshots.versions(path).last
    val dirs = scala.util.Using.resource(Files.list(Paths.get(s"$path/v=$v"))) { ls =>
      import scala.jdk.CollectionConverters._
      ls.iterator().asScala.map(_.getFileName.toString).toVector
    }
    assert(dirs.count(_.startsWith("__graft_bucket=")) == 2, dirs.mkString(","))
    val r2 = spark.sql(s"SELECT count(*) AS c, sum(kk) AS s FROM $t").head()
    assert(r2.getLong(0) == 12L && r2.getLong(1) == r.getLong(1))
  }

  test("composes with equality-delete entries: upserts keep retracting across an evolution") {
    val t = s"$cat.evo.eq"
    val path = s"$wh/evo/eq"
    spark.sql(s"CREATE TABLE $t (d DATE, k BIGINT, val BIGINT) USING iceberg")
    spark.sql(s"INSERT INTO $t SELECT DATE '2024-01-01', id, id * 10 FROM range(0, 6)")
    import spark.implicits._
    val d1 = Seq((java.sql.Date.valueOf("2024-01-02"), 2L, 222L),
      (java.sql.Date.valueOf("2024-01-02"), 9L, 999L)).toDF("d", "k", "val")
    Snapshots.upsertBatch(spark, path, d1, keys = Seq("k")) // retracts k=2, adds k=9
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('graft.layout'='days(d)')")
    // the entry still retracts under the new era declaration
    val r = spark.sql(s"SELECT count(*) AS c, sum(val) AS s FROM $t WHERE k >= 0").head()
    val expSum = (0L until 6L).filter(_ != 2L).map(_ * 10).sum + 222L + 999L
    assert(r.getLong(0) == 7L && r.getLong(1) == expSum)
    // a post-evolution upsert lands in the new layout and retracts its key
    val d2 = Seq((java.sql.Date.valueOf("2024-01-03"), 9L, 888L)).toDF("d", "k", "val")
    Snapshots.upsertBatch(spark, path, d2, keys = Seq("k"))
    val r2 = spark.sql(s"SELECT count(*) AS c, sum(val) AS s FROM $t WHERE k >= 0").head()
    assert(r2.getLong(0) == 7L && r2.getLong(1) == expSum - 999L + 888L)
    // compaction materializes retractions and lays out per day
    Snapshots.compact(spark, path)
    val r3 = spark.sql(s"SELECT count(*) AS c, sum(val) AS s FROM $t WHERE k >= 0").head()
    assert(r3.getLong(0) == 7L && r3.getLong(1) == r2.getLong(1))
  }

  test("composes with live merge-on-read sidecars: evolution is metadata-only, reads stay exact") {
    val t = s"$cat.evo.mor"
    val path = s"$wh/evo/mor"
    spark.sql(s"CREATE TABLE $t (d DATE, k BIGINT) USING iceberg")
    spark.range(0, 10).selectExpr("DATE '2024-01-01' AS d", "id AS k")
      .createOrReplaceTempView("__evo_mor_a")
    spark.sql(s"INSERT INTO $t SELECT * FROM __evo_mor_a")
    spark.conf.set("spark.graft.delete.mode", "merge-on-read")
    try spark.sql(s"DELETE FROM $t WHERE k = 3")
    finally spark.conf.set("spark.graft.delete.mode", "copy-on-write")
    assert(Snapshots.liveDeletes(path, Snapshots.versions(path).last).nonEmpty)

    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('graft.layout'='days(d)')")
    // the sidecar still applies under the new era declaration
    val r = spark.sql(s"SELECT count(*) AS c, sum(k) AS s FROM $t WHERE k >= 0").head()
    assert(r.getLong(0) == 9L && r.getLong(1) == (0L until 10L).sum - 3L)
    // compaction materializes the delete AND lays out under the new spec
    Snapshots.compact(spark, path)
    assert(Snapshots.liveDeletes(path, Snapshots.versions(path).last).isEmpty)
    val v = Snapshots.versions(path).last
    val dirs = scala.util.Using.resource(Files.list(Paths.get(s"$path/v=$v"))) { ls =>
      import scala.jdk.CollectionConverters._
      ls.iterator().asScala.map(_.getFileName.toString).toVector
    }
    assert(dirs.exists(_.startsWith("__graft_days=")), dirs.mkString(","))
    val r2 = spark.sql(s"SELECT count(*) AS c, sum(k) AS s FROM $t WHERE k >= 0").head()
    assert(r2.getLong(0) == 9L && r2.getLong(1) == (0L until 10L).sum - 3L)
  }
}
