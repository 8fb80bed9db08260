package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{GraftCatalog, Snapshots}

/** The DSv2 catalog over the versioned-parquet store: the reference's
  * Iceberg catalog surface (spark-defaults.conf:16-22 registers the
  * catalog; schema_verify.py:42-47 reads AS OF) as literal SQL
  * against Spark's public catalog-plugin API — CTAS, fast-append
  * INSERT, INSERT OVERWRITE, VERSION/TIMESTAMP AS OF, SHOW/DESCRIBE/
  * DROP — plus the store-level fast-append invariants (O(delta)
  * write, retention chain guard). */
class GraftCatalogSpec extends AnyFunSuite {
  import TestSession.spark

  // An isolated catalog instance per suite run (the shared `graft`
  // catalog keeps its per-JVM warehouse for the driver query).
  private lazy val wh = Files.createTempDirectory("graft_cat_spec_").toString
  private lazy val cat: String = {
    spark.conf.set("spark.sql.catalog.gcs", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcs.warehouse", wh)
    "gcs"
  }

  test("full SQL lifecycle: CTAS, fast-append INSERT, INSERT OVERWRITE, VERSION AS OF, SHOW, DESCRIBE, DROP") {
    spark.sql(s"CREATE NAMESPACE $cat.life")
    spark.range(0, 10).selectExpr("id", "id * 2 AS v")
      .createOrReplaceTempView("__cat_life_src")
    spark.sql(s"CREATE TABLE $cat.life.t AS SELECT * FROM __cat_life_src WHERE id < 4")
    assert(spark.sql(s"SELECT count(*) FROM $cat.life.t").head().getLong(0) == 4)

    // INSERT INTO = fast append: version 2's data dir holds ONLY the delta
    spark.sql(s"INSERT INTO $cat.life.t SELECT * FROM __cat_life_src WHERE id >= 4 AND id < 7")
    assert(spark.sql(s"SELECT count(*) FROM $cat.life.t").head().getLong(0) == 7)
    val v2Rows = spark.read.parquet(s"$wh/life/t/v=2").count()
    assert(v2Rows == 3, s"fast append must write only the delta, wrote $v2Rows rows")

    spark.sql(s"INSERT OVERWRITE $cat.life.t SELECT * FROM __cat_life_src")
    assert(spark.sql(s"SELECT count(*) FROM $cat.life.t").head().getLong(0) == 10)

    // time travel across all three snapshots, incl. the append chain
    assert(spark.sql(s"SELECT count(*) FROM $cat.life.t VERSION AS OF 1").head().getLong(0) == 4)
    assert(spark.sql(s"SELECT sum(v) FROM $cat.life.t VERSION AS OF 2").head().getLong(0) == (0 until 7).map(_ * 2).sum)
    assert(spark.sql(s"SELECT count(*) FROM $cat.life.t VERSION AS OF 3").head().getLong(0) == 10)

    assert(spark.sql(s"SHOW TABLES IN $cat.life").collect().map(_.getString(1)).contains("t"))
    val described = spark.sql(s"DESCRIBE TABLE $cat.life.t").collect().map(_.getString(0))
    assert(described.contains("id") && described.contains("v"))

    spark.sql(s"DROP TABLE $cat.life.t")
    assert(spark.sql(s"SHOW TABLES IN $cat.life").isEmpty)
  }

  test("TIMESTAMP AS OF resolves against injected commit times") {
    spark.sql(s"CREATE NAMESPACE $cat.tt")
    val table = s"$wh/tt/t"
    Snapshots.writeSnapshot(spark.range(0, 5).toDF("id"), table,
      commitTsMs = Some(1000000L))
    Snapshots.writeSnapshot(spark.range(0, 9).toDF("id"), table,
      commitTsMs = Some(2000000L))
    def countAsOf(ts: String): Long =
      spark.sql(s"SELECT count(*) FROM $cat.tt.t TIMESTAMP AS OF '$ts'").head().getLong(0)
    // 1970-01-01 00:30 UTC = 1800s = between the two commits
    assert(countAsOf("1970-01-01 00:30:00") == 5)
    assert(countAsOf("1970-01-01 01:00:00") == 9)
    val tooEarly = intercept[Exception] { countAsOf("1970-01-01 00:00:30") }
    assert(tooEarly.getMessage.contains("no snapshot committed at or before"))
  }

  test("created-but-empty table: declared schema, zero rows; missing version errors") {
    spark.sql(s"CREATE NAMESPACE $cat.empty")
    spark.sql(s"CREATE TABLE $cat.empty.t (id BIGINT, name STRING)")
    val df = spark.sql(s"SELECT * FROM $cat.empty.t")
    assert(df.columns.toSeq == Seq("id", "name") && df.isEmpty)
    // first INSERT INTO an empty table is the initial full state
    spark.sql(s"INSERT INTO $cat.empty.t VALUES (1, 'a')")
    assert(spark.sql(s"SELECT name FROM $cat.empty.t").head().getString(0) == "a")
    val noV = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.empty.t VERSION AS OF 9").collect()
    }
    assert(noV.getMessage.contains("no snapshot 9"))
  }

  test("reads plan through the stock parquet scan with pushdown") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.plan")
    spark.range(0, 100).selectExpr("id", "id % 7 AS k", "CAST(id AS STRING) AS unused")
      .createOrReplaceTempView("__cat_plan_src")
    spark.sql(s"CREATE TABLE $cat.plan.t AS SELECT * FROM __cat_plan_src")
    val plan = spark.sql(s"SELECT id FROM $cat.plan.t WHERE k = 3")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(k), EqualTo(k,3)]"),
      s"predicate must reach the parquet scan:\n$plan")
    // projection pruned to the referenced columns: `unused` never read
    assert(plan.contains("ReadSchema: struct<id:bigint,k:bigint>"),
      s"projection must prune the unreferenced column:\n$plan")
  }

  test("store-level: expire cannot break a retained append chain") {
    val table = Files.createTempDirectory("graft_chain_").toString + "/t"
    Snapshots.writeSnapshot(spark.range(0, 4).toDF("id"), table)          // v1 full
    Snapshots.appendSnapshot(spark.range(4, 6).toDF("id"), table)          // v2 delta
    Snapshots.appendSnapshot(spark.range(6, 7).toDF("id"), table)          // v3 delta
    assert(Snapshots.readAsOf(spark, table, 3).count() == 7)
    assert(Snapshots.readAsOf(spark, table, 2).count() == 6)
    // keepLast=1 retains v3, whose read set spans v1..v3: nothing may expire
    val report = Snapshots.expireSnapshots(spark, table, keepLast = 1)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(report == Map(1L -> "kept", 2L -> "kept", 3L -> "kept"))
    assert(Snapshots.readAsOf(spark, table, 3).count() == 7,
      "the retained snapshot must still read after retention")
    // a full-state write seals the chain; now history before it can go
    Snapshots.writeSnapshot(Snapshots.readLatest(spark, table), table)     // v4 full
    val report2 = Snapshots.expireSnapshots(spark, table, keepLast = 1)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(report2 == Map(1L -> "expired", 2L -> "expired", 3L -> "expired", 4L -> "kept"))
    assert(Snapshots.readLatest(spark, table).count() == 7)
  }

  test("compact rewrites an append chain into one snapshot; expire then reaps it") {
    val table = Files.createTempDirectory("graft_compact_").toString + "/t"
    Snapshots.writeSnapshot(spark.range(0, 10).toDF("id").coalesce(1), table)
    Snapshots.appendSnapshot(spark.range(10, 20).toDF("id").coalesce(1), table)
    Snapshots.appendSnapshot(spark.range(20, 30).toDF("id").coalesce(1), table)
    Snapshots.appendSnapshot(spark.range(30, 40).toDF("id").coalesce(1), table)
    val (v, before, after) = Snapshots.compact(spark, table, targetFileBytes = 1L << 40)
    assert(v == 5 && before == 4 && after == 1, s"got ($v,$before,$after)")
    assert(Snapshots.readLatest(spark, table).count() == 40)
    assert(Snapshots.snapshots(spark, table).collect()
      .exists(r => r.getLong(0) == 5L && r.getString(1) == "compact"))
    // history preserved: time travel into the pre-compact chain
    assert(Snapshots.readAsOf(spark, table, 3).count() == 30)
    // the compact snapshot is full-state, so it SEALS the chain:
    // retention can now expire every small-file version behind it
    val report = Snapshots.expireSnapshots(spark, table, keepLast = 1)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(report == Map(1L -> "expired", 2L -> "expired", 3L -> "expired",
      4L -> "expired", 5L -> "kept"), report.toString)
    assert(Snapshots.readLatest(spark, table).count() == 40,
      "data must survive compaction + retention")
  }

  test("append manifest records metadata-arithmetic totals; snapshots listing sees them") {
    val table = Files.createTempDirectory("graft_total_").toString + "/t"
    Snapshots.writeSnapshot(spark.range(0, 4).toDF("id"), table)
    Snapshots.appendSnapshot(spark.range(4, 9).toDF("id"), table)
    val listed = Snapshots.snapshots(spark, table).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(listed.toSeq == Seq((1L, "overwrite", 4L), (2L, "append", 9L)))
    // schema mismatch on append fails loudly, never corrupts the chain
    val bad = intercept[IllegalArgumentException] {
      Snapshots.appendSnapshot(spark.range(0, 1).selectExpr("id AS other"), table)
    }
    assert(bad.getMessage.contains("append schema mismatch"))
    // same NAME but different TYPE must also be rejected BEFORE commit:
    // an INT delta on a LONG chain would make every later mergeSchema
    // read of the chain fail or silently widen — corrupting committed
    // history instead of rejecting the write
    val badType = intercept[IllegalArgumentException] {
      Snapshots.appendSnapshot(
        spark.range(0, 1).selectExpr("CAST(id AS INT) AS id"), table)
    }
    assert(badType.getMessage.contains("append schema mismatch") &&
      badType.getMessage.contains("int"), badType.getMessage)
    assert(Snapshots.versions(table) == Seq(1L, 2L))
    assert(Snapshots.readLatest(spark, table).count() == 9,
      "the rejected appends must leave the committed chain readable")
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
        case _ => Seq.empty
      }
      case _ => Seq.empty
    }.distinct
  }

  test("manifest min/max stats prune data files at scan planning time") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.datasources.FilePartition
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

    spark.sql(s"CREATE NAMESPACE $cat.skipns")
    val tdir = s"$wh/skipns/t"
    // 4 data files with (approximately) disjoint id ranges
    Snapshots.writeSnapshot(
      spark.range(0, 4000).selectExpr("id", "CAST(id % 7 AS STRING) AS tag")
        .repartitionByRange(4, col("id")),
      tdir)

    val full = scannedFiles(spark.sql(s"SELECT * FROM $cat.skipns.t"))
    assert(full.size == 4, s"expected 4 data files, scanned ${full.size}")

    // range predicate: only the file(s) whose [min,max] intersect scan
    val sel = spark.sql(
      s"SELECT count(*) AS c, sum(id) AS s FROM $cat.skipns.t WHERE id BETWEEN 1000 AND 1099")
    val selFiles = scannedFiles(sel)
    assert(selFiles.nonEmpty && selFiles.size < full.size,
      s"stats must prune files (and the walk must SEE the aggregate's scan " +
        s"through AQE stages): scanned ${selFiles.mkString(",")}")
    val row = sel.collect()(0)
    assert(row.getLong(0) == 100 && row.getLong(1) == (1000L to 1099L).sum,
      "the pruned scan must return exactly the predicate's rows")

    // provably-absent string value: every file pruned, empty scan runs
    val none = spark.sql(s"SELECT * FROM $cat.skipns.t WHERE tag = 'zz'")
    assert(scannedFiles(none).isEmpty && none.count() == 0,
      "an impossible predicate must prune ALL files and still execute")

    // append chain: a point lookup in the delta must not scan v1 files
    spark.sql(s"INSERT INTO $cat.skipns.t VALUES (999999, 'x')")
    val point = spark.sql(s"SELECT tag FROM $cat.skipns.t WHERE id = 999999")
    val pointFiles = scannedFiles(point)
    assert(pointFiles.size == 1 && pointFiles.forall(_.contains("/v=2/")),
      s"a delta-only match must scan only the delta file, got $pointFiles")
    assert(point.collect().map(_.getString(0)).toSeq == Seq("x"))

    // runtime filtering (the Iceberg SupportsRuntimeV2Filtering seam):
    // dynamic pruning feeds the join build side's key set back as an
    // IN predicate — files whose bounds exclude every key must drop
    // out when the exec replans, WITHOUT rebuilding the scan object
    {
      import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, TableCatalog}
      import org.apache.spark.sql.connector.expressions.Expressions
      import org.apache.spark.sql.connector.expressions.filter.Predicate
      import org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
      import org.apache.spark.sql.util.CaseInsensitiveStringMap
      val tbl = spark.sessionState.catalogManager.catalog(cat)
        .asInstanceOf[TableCatalog]
        .loadTable(Identifier.of(Array("skipns"), "t"))
      def planned(scan: org.apache.spark.sql.connector.read.Scan): Int =
        scan.toBatch.planInputPartitions().flatMap {
          case fp: FilePartition => fp.files.map(_.filePath.toString).toSeq
          case _ => Seq.empty
        }.distinct.length
      val scan = tbl.asInstanceOf[SupportsRead]
        .newScanBuilder(CaseInsensitiveStringMap.empty()).build()
      val rf = scan.asInstanceOf[SupportsRuntimeV2Filtering]
      assert(rf.filterAttributes().map(_.describe()).toSet == Set("id", "tag"),
        "both stats-modeled columns must be advertised for runtime filtering")
      val before = planned(scan)
      assert(before == 5, s"pre-filter plan must cover all files, got $before")
      rf.filter(Array(new Predicate("IN", Array[org.apache.spark.sql.connector.expressions.Expression](
        Expressions.column("id"),
        Expressions.literal(java.lang.Long.valueOf(1500L)),
        Expressions.literal(java.lang.Long.valueOf(999999L))))))
      val after = planned(scan)
      assert(after == 2 && after < before,
        s"runtime IN over two bands must prune to 2 files, got $after")
    }

    // end-to-end: a broadcast fact⋈dim join with a selective dim
    // filter — Spark's dynamic pruning should feed the dim keys back
    // into the fact scan as runtime filters; results must be exact
    // regardless, and if the optimizer injected the subquery the scan
    // must show it
    {
      // the dim must be OPAQUE (a real table): a derived CASE dim lets
      // the optimizer infer the key statically and DPP never fires
      spark.range(0, 4000).selectExpr("id AS d_id",
        "CASE WHEN id = 1234 THEN 'pick' ELSE 'skip' END AS d_tag")
        .write.mode("overwrite").parquet(s"$wh/skipns_dim")
      spark.read.parquet(s"$wh/skipns_dim").createOrReplaceTempView("__skip_dim")
      val j = spark.sql(
        s"""SELECT /*+ BROADCAST(d) */ f.id, f.tag FROM $cat.skipns.t f
           |JOIN __skip_dim d ON f.id = d.d_id
           |WHERE d.d_tag = 'pick'""".stripMargin)
      val got = j.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got == Seq((1234L, (1234 % 7).toString)),
        s"join under runtime filtering must return exactly the picked row, got $got")
      val planStr = j.queryExecution.executedPlan.toString
      assert(planStr.contains("dynamicpruningexpression"),
        s"dynamic pruning must engage on an opaque broadcast dim:\n${planStr.take(2000)}")
      // BatchScanExec.inputPartitions is the PRE-runtime-filter list;
      // the scan's own live file list is what the exec actually read
      def leaves2(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] =
        p.collectLeaves().flatMap {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => leaves2(q.plan)
          case a: AdaptiveSparkPlanExec => leaves2(a.executedPlan)
          case l => Seq(l)
        }
      val joinFiles = leaves2(j.queryExecution.executedPlan).flatMap {
        case b: BatchScanExec => b.scan match {
          case g: graft.sources.GraftStreamableScan => g.scannedFileList
          case _ => Seq.empty
        }
        case _ => Seq.empty
      }.distinct
      assert(joinFiles.nonEmpty && joinFiles.size <= 2 && joinFiles.size < full.size,
        s"the runtime IN must prune fact files before tasks launch, scanned $joinFiles")
    }

    // row-level DML on a stats-bearing table must never lose rows:
    // pushed filters select FILES to rewrite (never rows — they are
    // not forwarded to the inner parquet scan, where row-group
    // pruning would drop a kept file's unchanged rows), and every
    // file outside the rewrite group is carried by reference
    spark.sql(s"UPDATE $cat.skipns.t SET tag = 'upd' WHERE id = 1500")
    val after = spark.sql(
      s"SELECT count(*) AS c, sum(CASE WHEN tag='upd' THEN 1 ELSE 0 END) AS u FROM $cat.skipns.t")
      .collect()(0)
    assert(after.getLong(0) == 4001 && after.getLong(1) == 1,
      s"UPDATE over a pruned-capable table must preserve all rows, got $after")
    // the point UPDATE must have rewritten ONE band and carried the rest
    val mf = new String(java.nio.file.Files.readAllBytes(
      Paths.get(s"$wh/skipns/t/_meta/3.json")), java.nio.charset.StandardCharsets.UTF_8)
    val carriedUpd = graft.sources.FileStats.carriedFromManifest(mf)
    val ownUpd = graft.sources.FileStats.fromManifest(mf).getOrElse(Seq.empty)
    assert(ownUpd.size == 1 && carriedUpd.size == 4,
      s"UPDATE id=1500 over 5 files must rewrite 1 and carry 4, " +
        s"got own=${ownUpd.size} carried=${carriedUpd.size}")
  }

  test("versions() and catalog listings close their directory streams (no fd leak)") {
    // versions() sits on hot paths (per catalog read, per DML commit,
    // per streaming trigger); an unclosed Files.list leaks one fd per
    // call for the process lifetime — long bench/verify sessions would
    // hit EMFILE. Exercise all four listing sites hard and assert the
    // process fd count stays flat (GC must not be what saves us).
    val table = Files.createTempDirectory("graft_fd_").toString + "/t"
    Snapshots.writeSnapshot(spark.range(0, 2).toDF("id"), table)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.fdprobe")
    spark.sql(s"CREATE TABLE $cat.fdprobe.t AS SELECT 1 AS id")
    def openFds(): Int = new java.io.File("/proc/self/fd").list().length
    def hammer(n: Int): Unit = (1 to n).foreach { _ =>
      Snapshots.versions(table)
      spark.sql(s"SHOW TABLES IN $cat.fdprobe").collect()
      spark.sql(s"SHOW NAMESPACES IN $cat").collect()
      ()
    }
    hammer(20) // settle lazy session machinery before baselining
    val before = openFds()
    hammer(300)
    val after = openFds()
    assert(after - before < 100,
      s"directory-listing fds leaked: $before -> $after over 900 listing calls")
  }

  test("ALTER TABLE ADD COLUMN: the reference's metadata-only evolution, verbatim DDL") {
    // reference flow (schema_add_column.py:19-32): DESCRIBE-based
    // idempotence check, then ALTER TABLE ... ADD COLUMN payment_method
    // STRING COMMENT '...', then DESCRIBE + snapshot listing
    spark.sql(s"CREATE NAMESPACE $cat.evo")
    spark.range(0, 5).selectExpr("id", "CAST(id AS STRING) AS name")
      .createOrReplaceTempView("__cat_evo_src")
    spark.sql(s"CREATE TABLE $cat.evo.t AS SELECT * FROM __cat_evo_src")
    spark.sql(s"""
        ALTER TABLE $cat.evo.t
        ADD COLUMN payment_method STRING
        COMMENT 'Payment method: credit_card, debit_card, paypal, cash_on_delivery'
    """)
    // metadata-only: visible immediately, pre-evolution rows read NULL
    val cols = spark.sql(s"DESCRIBE $cat.evo.t").collect()
      .map(_.getString(0)).filter(c => c.nonEmpty && !c.startsWith("#"))
    assert(cols.toSeq == Seq("id", "name", "payment_method"))
    assert(spark.sql(s"SELECT count(*) FROM $cat.evo.t WHERE payment_method IS NULL")
      .head().getLong(0) == 5)
    // post-evolution fast append carries the wider schema; the mixed
    // chain reads as one table (old rows NULL, new row populated)
    spark.sql(s"INSERT INTO $cat.evo.t VALUES (99, 'z', 'paypal')")
    assert(spark.sql(s"SELECT count(*) FROM $cat.evo.t").head().getLong(0) == 6)
    assert(spark.sql(s"SELECT payment_method FROM $cat.evo.t WHERE id = 99")
      .head().getString(0) == "paypal")
    assert(spark.sql(s"SELECT count(*) FROM $cat.evo.t WHERE payment_method IS NULL")
      .head().getLong(0) == 5)
    // time travel keeps the per-snapshot schema: v1 has no payment_method
    assert(!spark.sql(s"SELECT * FROM $cat.evo.t VERSION AS OF 1")
      .columns.contains("payment_method"))
    // RENAME became metadata-only in r15 (era-split mapping,
    // RenameColumnSpec pins the full lifecycle) — here just its
    // metadata-only composition with ADD on this table
    spark.sql(s"ALTER TABLE $cat.evo.t RENAME COLUMN name TO label")
    assert(spark.table(s"$cat.evo.t").columns.toSeq ==
      Seq("id", "label", "payment_method"))
    assert(spark.sql(s"SELECT label FROM $cat.evo.t WHERE id = 99")
      .head().getString(0) == "z")
    // rename-BACK refuses: 'name' is now a historical physical name
    // (pre-rename files still carry it) — the reuse guard
    val reuse = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.evo.t RENAME COLUMN label TO name")
    }
    assert(reuse.getMessage.contains("renamed column"), reuse.getMessage)
    // idempotence guard: adding an existing column errors clearly
    val dup = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.evo.t ADD COLUMN payment_method STRING")
    }
    assert(dup.getMessage.contains("already exists"))
  }

  test("DELETE FROM and TRUNCATE: copy-on-write snapshots, history preserved") {
    spark.sql(s"CREATE NAMESPACE $cat.dml")
    spark.range(0, 10).selectExpr("id", "CAST(id % 3 AS INT) AS bucket")
      .createOrReplaceTempView("__cat_dml_src")
    spark.sql(s"CREATE TABLE $cat.dml.t AS SELECT * FROM __cat_dml_src")
    spark.sql(s"DELETE FROM $cat.dml.t WHERE bucket = 1 OR id >= 8")
    // survivors: id in 0..7 with bucket != 1 -> 0,2,3,5,6
    assert(spark.sql(s"SELECT id FROM $cat.dml.t ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(0L, 2L, 3L, 5L, 6L))
    // append-only history: the pre-delete snapshot still reads
    assert(spark.sql(s"SELECT count(*) FROM $cat.dml.t VERSION AS OF 1").head().getLong(0) == 10)
    val listed = Snapshots.snapshots(spark, s"$wh/dml/t").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(listed.toSeq == Seq((1L, "overwrite"), (2L, "delete")))
    spark.sql(s"TRUNCATE TABLE $cat.dml.t")
    assert(spark.sql(s"SELECT * FROM $cat.dml.t").isEmpty)
    assert(spark.sql(s"SELECT count(*) FROM $cat.dml.t VERSION AS OF 2").head().getLong(0) == 5)
    // time travel INTO the truncate snapshot: the empty full-state
    // version must still carry a readable schema (Spark writes one
    // schema-bearing empty file for 0-partition jobs)
    assert(spark.sql(s"SELECT * FROM $cat.dml.t VERSION AS OF 3").isEmpty)
    // post-truncate INSERT starts a fresh state on the same history
    spark.sql(s"INSERT INTO $cat.dml.t VALUES (42, 0)")
    assert(spark.sql(s"SELECT id FROM $cat.dml.t").head().getLong(0) == 42L)
  }

  test("MERGE INTO and UPDATE: group-based copy-on-write row-level SQL") {
    spark.sql(s"CREATE NAMESPACE $cat.rlo")
    spark.range(0, 6).selectExpr("id", "CAST(id * 10 AS LONG) AS amount")
      .createOrReplaceTempView("__cat_rlo_tgt")
    spark.sql(s"CREATE TABLE $cat.rlo.t AS SELECT * FROM __cat_rlo_tgt")
    // UPDATE: full SQL, arbitrary expressions
    spark.sql(s"UPDATE $cat.rlo.t SET amount = amount + 1 WHERE id % 2 = 0")
    assert(spark.sql(s"SELECT sum(amount) FROM $cat.rlo.t").head().getLong(0)
      == (0 until 6).map(i => i * 10L + (if (i % 2 == 0) 1 else 0)).sum)
    // MERGE: matched update + not-matched insert, Iceberg's flagship verb
    spark.range(4, 8).selectExpr("id", "CAST(999 AS LONG) AS amount")
      .createOrReplaceTempView("__cat_rlo_src")
    spark.sql(s"""
      MERGE INTO $cat.rlo.t t
      USING __cat_rlo_src s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET t.amount = s.amount
      WHEN NOT MATCHED THEN INSERT (id, amount) VALUES (s.id, s.amount)
    """)
    val rows = spark.sql(s"SELECT id, amount FROM $cat.rlo.t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq(0L -> 1L, 1L -> 10L, 2L -> 21L, 3L -> 30L,
      4L -> 999L, 5L -> 999L, 6L -> 999L, 7L -> 999L))
    // every DML verb is its own snapshot; history replays
    val ops = Snapshots.snapshots(spark, s"$wh/rlo/t").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(ops == Seq((1L, "overwrite", 6L), (2L, "update", 6L), (3L, "merge", 8L)))
    assert(spark.sql(s"SELECT sum(amount) FROM $cat.rlo.t VERSION AS OF 1")
      .head().getLong(0) == (0 until 6).map(_ * 10L).sum)
    // MERGE with a delete clause
    spark.sql(s"""
      MERGE INTO $cat.rlo.t t
      USING __cat_rlo_src s
      ON t.id = s.id
      WHEN MATCHED AND s.id >= 6 THEN DELETE
    """)
    assert(spark.sql(s"SELECT count(*) FROM $cat.rlo.t").head().getLong(0) == 6)
  }

  // shared banded fixture: 3 single-file commits with disjoint id bands
  private def bandedTable(ns: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.$ns")
    spark.range(0, 3000).selectExpr("id", "CAST(id % 5 AS STRING) AS tag")
      .createOrReplaceTempView(s"__${ns}_src")
    spark.sql(s"CREATE TABLE $cat.$ns.t AS SELECT /*+ COALESCE(1) */ * FROM __${ns}_src WHERE id < 1000")
    spark.sql(s"INSERT INTO $cat.$ns.t SELECT /*+ COALESCE(1) */ * FROM __${ns}_src WHERE id >= 1000 AND id < 2000")
    spark.sql(s"INSERT INTO $cat.$ns.t SELECT /*+ COALESCE(1) */ * FROM __${ns}_src WHERE id >= 2000")
    s"$wh/$ns/t"
  }

  private def manifestParts(tp: String, v: Long): (Seq[graft.sources.FileStats.FileStat], Seq[graft.sources.FileStats.FileStat]) = {
    val m = new String(java.nio.file.Files.readAllBytes(
      Paths.get(s"$tp/_meta/$v.json")), java.nio.charset.StandardCharsets.UTF_8)
    (graft.sources.FileStats.fromManifest(m).getOrElse(Seq.empty),
      graft.sources.FileStats.carriedFromManifest(m))
  }

  test("file-pruned CoW UPDATE: one band rewritten, two carried by reference, history intact") {
    val tp = bandedTable("cowu")
    spark.sql(s"UPDATE $cat.cowu.t SET tag = 'upd' WHERE id BETWEEN 1200 AND 1300")
    val (own, carried) = manifestParts(tp, 4)
    assert(own.size == 1 && carried.size == 2,
      s"mid-band UPDATE must rewrite 1 file and carry 2, got own=${own.size} carried=${carried.size}")
    assert(carried.forall(f => f.name.matches("v=\\d+/.*\\.parquet")),
      s"carried refs must be table-root-relative: ${carried.map(_.name)}")
    // correctness: every row survives, exactly the band is updated
    val r = spark.sql(s"SELECT count(*) AS c, sum(CASE WHEN tag='upd' THEN 1 ELSE 0 END) AS u FROM $cat.cowu.t").head()
    assert(r.getLong(0) == 3000 && r.getLong(1) == 101, s"got $r")
    // manifest row count is carried+own arithmetic
    assert(Snapshots.snapshots(spark, tp).collect().map(x => (x.getLong(0), x.getLong(2))).toMap.apply(4L) == 3000L)
    // time travel to the pre-update snapshot is untouched
    assert(spark.sql(s"SELECT count(*) FROM $cat.cowu.t VERSION AS OF 3 WHERE tag = 'upd'").head().getLong(0) == 0)
    // static file skipping still engages OVER the CoW version (carried
    // stats were copied into the new manifest)
    val probe = spark.sql(s"SELECT count(*) FROM $cat.cowu.t WHERE id BETWEEN 100 AND 200")
    assert(scannedFiles(probe).size == 1,
      s"carried-ref pruning must scan 1 file, got ${scannedFiles(probe)}")
    // fast append chains on top of the CoW base
    spark.sql(s"INSERT INTO $cat.cowu.t VALUES (99999, 'z')")
    assert(spark.sql(s"SELECT count(*) FROM $cat.cowu.t").head().getLong(0) == 3001)
    // retention: the CoW version's carried refs pin their home dirs —
    // only the fully-rewritten band's dir may expire
    val expired = Snapshots.expireSnapshots(spark, tp, keepLast = 2).collect()
      .filter(_.getString(2) == "expired").map(_.getLong(0)).toSeq
    assert(expired == Seq(2L),
      s"only the rewritten band's dir is reapable (v1/v3 are carried-pinned), got $expired")
    assert(spark.sql(s"SELECT count(*) FROM $cat.cowu.t").head().getLong(0) == 3001,
      "current state must survive retention")
  }

  test("metadata-only DELETE: all-matching file dropped unread, non-matching carried, partial rewritten") {
    val tp = bandedTable("cowd")
    // band 3 provably ALL-matches (min 2000, zero nulls) → dropped;
    // bands 1-2 provably none-match → carried; NO file is read: the
    // commit is pure manifest arithmetic
    spark.sql(s"DELETE FROM $cat.cowd.t WHERE id >= 2000")
    val (own4, carried4) = manifestParts(tp, 4)
    assert(own4.isEmpty && carried4.size == 2,
      s"retention-style DELETE must be metadata-only, got own=${own4.size} carried=${carried4.size}")
    assert(scala.util.Using.resource(java.nio.file.Files.list(Paths.get(s"$tp/v=4"))) { ls =>
      !scala.jdk.CollectionConverters.IteratorHasAsScala(ls.iterator()).asScala
        .exists(_.getFileName.toString.endsWith(".parquet"))
    }, "metadata-only delete must write no data files")
    assert(spark.sql(s"SELECT count(*) FROM $cat.cowd.t").head().getLong(0) == 2000)
    // partial-band DELETE: band 1 rewritten (straddled), band 2 carried
    spark.sql(s"DELETE FROM $cat.cowd.t WHERE id < 200")
    val (own5, carried5) = manifestParts(tp, 5)
    assert(own5.size == 1 && carried5.size == 1,
      s"partial delete must rewrite the straddled band only, got own=${own5.size} carried=${carried5.size}")
    assert(spark.sql(s"SELECT count(*) FROM $cat.cowd.t").head().getLong(0) == 1800)
    assert(spark.sql(s"SELECT min(id) FROM $cat.cowd.t").head().getLong(0) == 200)
    // history: both deletes are snapshots; pre-delete state replays
    assert(spark.sql(s"SELECT count(*) FROM $cat.cowd.t VERSION AS OF 3").head().getLong(0) == 3000)
    assert(spark.sql(s"SELECT count(*) FROM $cat.cowd.t VERSION AS OF 4").head().getLong(0) == 2000)
  }

  test("MERGE runtime group filtering: the source's key range narrows the rewrite group at execution time") {
    val tp = bandedTable("cowm")
    // source touches ONLY band 2 — no static predicate reveals that;
    // Spark's runtime group filtering must feed the matched key set
    // back into the row-level scan before partitions are planned
    spark.range(1500, 1510).selectExpr("id", "CAST('merged' AS STRING) AS tag")
      .createOrReplaceTempView("__cowm_src")
    spark.sql(s"""
      MERGE INTO $cat.cowm.t t
      USING __cowm_src s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET t.tag = s.tag
    """)
    val r = spark.sql(s"SELECT count(*) AS c, sum(CASE WHEN tag='merged' THEN 1 ELSE 0 END) AS u FROM $cat.cowm.t").head()
    assert(r.getLong(0) == 3000 && r.getLong(1) == 10, s"got $r")
    val (own, carried) = manifestParts(tp, 4)
    assert(own.size == 1 && carried.size == 2,
      s"runtime group filtering must confine the MERGE rewrite to band 2, " +
        s"got own=${own.size} carried=${carried.size}")
  }

  test("storage-partitioned join: same-bucketed tables join with zero exchanges") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.sql(s"CREATE NAMESPACE $cat.spj")
    spark.range(0, 5000).selectExpr("id AS k", "id * 3 AS a")
      .createOrReplaceTempView("__spj_left")
    spark.range(0, 5000).selectExpr("id AS k", "CAST(id % 11 AS LONG) AS b")
      .createOrReplaceTempView("__spj_right")
    spark.sql(s"CREATE TABLE $cat.spj.l PARTITIONED BY (bucket(8, k)) AS SELECT * FROM __spj_left")
    spark.sql(s"CREATE TABLE $cat.spj.r PARTITIONED BY (bucket(8, k)) AS SELECT * FROM __spj_right")

    def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      var c = 0
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
        p match {
          case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => c += 1
          case _ =>
        }
        p match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => walk(a.executedPlan)
          case other => other.children.foreach(walk)
        }
      }
      walk(df.queryExecution.executedPlan)
      c
    }

    // the co-located join: correct rows AND no shuffle on either side
    // (MERGE hint pins a sort-merge join so the zero can't come from a
    // broadcast — the exchanges elided are the storage partitioning's)
    val j = spark.sql(
      s"SELECT /*+ MERGE(r) */ l.k, l.a, r.b FROM $cat.spj.l l JOIN $cat.spj.r r ON l.k = r.k WHERE r.b = 7")
    val got = j.collect()
    assert(got.length == 5000 / 11 + (if (7 < 5000 % 11) 1 else 0) ||
      got.length == spark.sql("SELECT count(*) FROM __spj_right WHERE k % 11 = 7").head().getLong(0).toInt)
    assert(got.forall(r => r.getLong(1) == r.getLong(0) * 3 && r.getLong(2) == 7))
    assert(exchanges(j) == 0,
      s"same-bucketed join must plan with NO exchange:\n${j.queryExecution.executedPlan.toString.take(1500)}")

    // a baseline join against an unbucketed side still shuffles — the
    // zero above is the layout's doing, not a trivial plan artifact
    val plain = spark.sql(
      s"SELECT /*+ MERGE(r) */ l.k FROM $cat.spj.l l JOIN __spj_right r ON l.k = r.k WHERE r.b = 7")
    assert(exchanges(plain) > 0, "control join must still shuffle")

    // appends keep the layout: the join stays exchange-free and exact
    spark.sql(s"INSERT INTO $cat.spj.l VALUES (99990, 5), (99991, 6)")
    spark.sql(s"INSERT INTO $cat.spj.r VALUES (99990, 7)")
    val j2 = spark.sql(
      s"SELECT /*+ MERGE(r) */ l.k, r.b FROM $cat.spj.l l JOIN $cat.spj.r r ON l.k = r.k WHERE l.k >= 99990")
    assert(j2.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((99990L, 7L)))
    assert(exchanges(j2) == 0, "append-extended bucketed join must stay exchange-free")

    // the layout column must never leak into ANY read surface: the
    // Snapshots-level APIs (time travel, history arithmetic) see the
    // declared schema only
    val asOf1 = Snapshots.readAsOf(spark, s"$wh/spj/l", 1)
    assert(asOf1.columns.sorted.toSeq == Seq("a", "k"),
      s"layout subdirs must not partition-discover: ${asOf1.columns.mkString(",")}")

    // compaction preserves the layout (per-bucket rewrite): the chain
    // seals AND the join stays exchange-free afterwards
    val (cv, _, filesAfter) = Snapshots.compact(spark, s"$wh/spj/l")
    assert(filesAfter <= 8, s"bucketed compact writes ≤1 file per bucket, got $filesAfter")
    assert(Snapshots.readLatest(spark, s"$wh/spj/l").count() == 5002,
      "compacted bucketed state must keep every row")
    val j4 = spark.sql(
      s"SELECT /*+ MERGE(r) */ l.k, r.b FROM $cat.spj.l l JOIN $cat.spj.r r ON l.k = r.k")
    assert(j4.collect().length == 5001) // 5000 base + 99990; 99991 unmatched
    assert(exchanges(j4) == 0,
      s"post-compact bucketed join must stay exchange-free (compact v$cv)")

    // streaming reads of a bucketed table: initial state + delta, both
    // with the declared schema (no layout column), counts exact
    val ckpt = Files.createTempDirectory("graft_spj_stream_").toString
    def drain(): (Long, Seq[String]) = {
      val cnt = new java.util.concurrent.atomic.AtomicLong(0L)
      @volatile var cols: Seq[String] = Seq.empty
      val q = spark.readStream.table(s"$cat.spj.r").writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          cols = df.columns.toSeq.sorted; cnt.addAndGet(df.count()); () }
        .option("checkpointLocation", s"$ckpt/ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "drain timed out")
      (cnt.get(), cols)
    }
    val (initial, cols1) = drain()
    assert(initial == 5001 && cols1 == Seq("b", "k"),
      s"initial bucketed stream batch: $initial rows, cols $cols1")
    spark.sql(s"INSERT INTO $cat.spj.r VALUES (77777, 3)")
    val (delta, cols2) = drain()
    assert(delta == 1 && cols2 == Seq("b", "k"),
      s"bucketed delta batch: $delta rows, cols $cols2")

    // an unaligned rewrite (CoW UPDATE writes plain files) degrades to
    // normal planning — correct rows, partitioning just not reported
    spark.sql(s"UPDATE $cat.spj.r SET b = 99 WHERE k = 12")
    val j3 = spark.sql(
      s"SELECT r.b FROM $cat.spj.l l JOIN $cat.spj.r r ON l.k = r.k WHERE l.k = 12")
    assert(j3.collect().map(_.getLong(0)).toSeq == Seq(99L),
      "post-DML reads must stay correct even though alignment is gone")

    // the table reports its declared transform
    val tbl = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array("spj"), "l"))
    assert(tbl.partitioning().map(_.toString).toSeq == Seq("bucket(8, k)"),
      s"partitioning must surface the layout, got ${tbl.partitioning().mkString(",")}")

    // unsupported transforms stay loud (days(col) is supported since
    // r14 — DaysLayoutSpec pins it; months is not)
    val bad = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.spj.bad (k BIGINT, d DATE) PARTITIONED BY (months(d))")
    }
    assert(bad.getMessage.contains("bucket"), bad.getMessage)

    // the bucket function is SQL-callable through the FunctionCatalog
    // and agrees with the write-side layout expression — users can
    // pre-compute a row's bucket (e.g. to co-locate external data)
    val viaFn = spark.sql(s"SELECT $cat.system.bucket(8, CAST(1234 AS BIGINT)) AS b")
      .head().getInt(0)
    val viaExpr = spark.sql(
      "SELECT CAST(pmod(xxhash64(CAST(1234 AS BIGINT)), 8L) AS INT)").head().getInt(0)
    assert(viaFn == viaExpr,
      s"SQL-callable bucket ($viaFn) must agree with the layout expression ($viaExpr)")
  }

  test("manifest-complete aggregate pushdown: count/min/max scan zero files, unsound shapes bail") {
    spark.sql(s"CREATE NAMESPACE $cat.agg")
    spark.range(0, 3000)
      .selectExpr("id", "CAST(id % 7 AS DOUBLE) AS x",
        "CASE WHEN id % 10 = 0 THEN NULL ELSE id * 2 END AS v")
      .createOrReplaceTempView("__agg_src")
    spark.sql(s"CREATE TABLE $cat.agg.t AS SELECT /*+ COALESCE(1) */ * FROM __agg_src WHERE id < 1000")
    spark.sql(s"INSERT INTO $cat.agg.t SELECT /*+ COALESCE(1) */ * FROM __agg_src WHERE id >= 1000")

    // the manifest-answered shapes: exact values, ZERO files scanned
    val q = spark.sql(
      s"SELECT count(*) AS c, count(v) AS cv, min(id) AS mn, max(id) AS mx FROM $cat.agg.t")
    val r = q.collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3000L, 2700L, 0L, 2999L)), s"got $r")
    assert(scannedFiles(q).isEmpty,
      s"count/min/max must be manifest arithmetic, scanned ${scannedFiles(q)}")

    // bail 1: a WHERE clause — bounds cannot split rows
    val filtered = spark.sql(s"SELECT count(*) FROM $cat.agg.t WHERE id >= 1000")
    assert(filtered.head().getLong(0) == 2000 && scannedFiles(filtered).nonEmpty)

    // bail 2: float min/max — parquet bounds exclude NaN, Spark's
    // ordering puts NaN largest; the bounds would silently lie
    val fl = spark.sql(s"SELECT min(x), max(x) FROM $cat.agg.t")
    assert(fl.head().getDouble(0) == 0.0 && fl.head().getDouble(1) == 6.0)
    assert(scannedFiles(fl).nonEmpty, "float min/max must scan")

    // bail 3: SUM is not bounds-answerable
    val sm = spark.sql(s"SELECT sum(id) FROM $cat.agg.t")
    assert(sm.head().getLong(0) == (0L until 3000L).sum && scannedFiles(sm).nonEmpty)

    // unfiltered LIMIT plans only the covering file prefix (the limit
    // itself stays Spark-side — whole files come back)
    val lim = spark.sql(s"SELECT id FROM $cat.agg.t LIMIT 7")
    assert(lim.collect().length == 7)
    assert(scannedFiles(lim).size == 1,
      s"LIMIT 7 over a 1000-row + 2000-row file must plan 1, got ${scannedFiles(lim)}")
    // ...and a filtered LIMIT must NOT be prefix-planned: the covering
    // prefix could come up short of MATCHING rows
    val limF = spark.sql(s"SELECT id FROM $cat.agg.t WHERE id >= 1000 LIMIT 7")
    assert(limF.collect().length == 7 &&
      limF.collect().forall(_.getLong(0) >= 1000))

    // the CoW-carried state folds in: metadata DELETE then aggregate
    spark.sql(s"DELETE FROM $cat.agg.t WHERE id >= 1000")
    val q2 = spark.sql(s"SELECT count(*) AS c, max(id) AS mx FROM $cat.agg.t")
    assert((q2.head().getLong(0), q2.head().getLong(1)) == ((1000L, 999L)))
    assert(scannedFiles(q2).isEmpty, "carried refs carry their stats")

    // the plain scan reports the EXACT manifest row count to Catalyst
    // (join sizing / AQE reads it for free)
    val full = spark.sql(s"SELECT * FROM $cat.agg.t")
    val stats = full.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.computeStats()
    }.get
    assert(stats.rowCount.contains(BigInt(1000)),
      s"scan must report the exact manifest row count, got ${stats.rowCount}")
  }

  test("file-pruned DML composes with metadata-only schema evolution") {
    // pre-evolution files lack the added column entirely: their
    // manifest stats cannot speak for it, so predicates on it must
    // keep (rewrite) those files, and carried refs must keep reading
    // NULL for old rows after any CoW commit
    spark.sql(s"CREATE NAMESPACE $cat.evodml")
    spark.range(0, 2000).selectExpr("id", "CAST(id % 3 AS STRING) AS tag")
      .createOrReplaceTempView("__evodml_src")
    spark.sql(s"CREATE TABLE $cat.evodml.t AS SELECT /*+ COALESCE(1) */ * FROM __evodml_src WHERE id < 1000")
    spark.sql(s"INSERT INTO $cat.evodml.t SELECT /*+ COALESCE(1) */ * FROM __evodml_src WHERE id >= 1000")
    spark.sql(s"ALTER TABLE $cat.evodml.t ADD COLUMN note STRING")
    // post-evolution append carries the wider schema
    spark.sql(s"INSERT INTO $cat.evodml.t VALUES (5000, 'x', 'tagged')")

    // UPDATE keyed on the PRE-evolution column: prunes to one band,
    // carried refs re-read correctly, the evolved column survives
    spark.sql(s"UPDATE $cat.evodml.t SET note = 'upd' WHERE id BETWEEN 1100 AND 1200")
    val (own, carried) = manifestParts(s"$wh/evodml/t", 4)
    assert(own.size == 1 && carried.size == 2,
      s"evolved-table UPDATE must still prune: own=${own.size} carried=${carried.size}")
    val r = spark.sql(s"""SELECT count(*) AS c,
      sum(CASE WHEN note = 'upd' THEN 1 ELSE 0 END) AS u,
      sum(CASE WHEN note IS NULL THEN 1 ELSE 0 END) AS n FROM $cat.evodml.t""").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2001L, 101L, 1899L)), s"got $r")

    // DELETE keyed on the ADDED column: pre-evolution files have no
    // stat for it — mayMatch keeps them (rewrite), mustMatch refuses
    // (no unread drop), and NULL rows survive the comparison
    spark.sql(s"DELETE FROM $cat.evodml.t WHERE note = 'upd'")
    val after = spark.sql(s"""SELECT count(*) AS c,
      sum(CASE WHEN note IS NULL THEN 1 ELSE 0 END) AS n FROM $cat.evodml.t""").head()
    assert((after.getLong(0), after.getLong(1)) == ((1900L, 1899L)), s"got $after")
    assert(spark.sql(s"SELECT count(*) FROM $cat.evodml.t WHERE note = 'tagged'").head().getLong(0) == 1)
    // pre-delete history still replays
    assert(spark.sql(s"SELECT count(*) FROM $cat.evodml.t VERSION AS OF 4").head().getLong(0) == 2001)
  }

  test("DROP COLUMN and widening TYPE changes are metadata-only; DML composes; RENAME stays loud") {
    spark.sql(s"CREATE NAMESPACE $cat.evo2")
    val tp = s"$wh/evo2/t"
    spark.range(0, 2000).selectExpr(
      "CAST(id AS INT) AS k", "CAST(id % 3 AS STRING) AS tag", "id * 2 AS v")
      .createOrReplaceTempView("__evo2_src")
    spark.sql(s"CREATE TABLE $cat.evo2.t AS SELECT /*+ COALESCE(1) */ * FROM __evo2_src WHERE k < 1000")
    spark.sql(s"INSERT INTO $cat.evo2.t SELECT /*+ COALESCE(1) */ * FROM __evo2_src WHERE k >= 1000")

    // WIDEN k INT→BIGINT: no data write, pre-widen INT32 files upcast on read
    spark.sql(s"ALTER TABLE $cat.evo2.t ALTER COLUMN k TYPE BIGINT")
    assert(Snapshots.versions(tp).size == 2, "widen must be metadata-only")
    assert(spark.table(s"$cat.evo2.t").schema("k").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(spark.sql(s"SELECT sum(k) FROM $cat.evo2.t").head().getLong(0) ==
      (0L until 2000L).sum)
    // post-widen rows may exceed INT range
    spark.sql(s"INSERT INTO $cat.evo2.t VALUES (${Long.MaxValue - 5}, 'w', 0)")
    assert(spark.sql(s"SELECT max(k) FROM $cat.evo2.t WHERE k > 100").head().getLong(0) ==
      Long.MaxValue - 5)
    // DML keyed on the widened column: pre-widen files carry i32 stats
    // (tag mismatch keeps them — no wrong pruning), rows delete exactly
    spark.sql(s"DELETE FROM $cat.evo2.t WHERE k BETWEEN 100 AND 199")
    assert(spark.sql(s"SELECT count(*) FROM $cat.evo2.t").head().getLong(0) == 1901)

    // DROP COLUMN tag: metadata-only; narrower appends; history keeps it
    spark.sql(s"ALTER TABLE $cat.evo2.t DROP COLUMN tag")
    assert(Snapshots.versions(tp).size == 4, "drop must be metadata-only")
    assert(spark.table(s"$cat.evo2.t").columns.toSeq == Seq("k", "v"))
    spark.sql(s"INSERT INTO $cat.evo2.t VALUES (77777, 154)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.evo2.t").head().getLong(0) == 1902)
    // per-snapshot schemas: the pre-drop snapshot still surfaces tag
    assert(spark.sql(s"SELECT count(*) FROM $cat.evo2.t VERSION AS OF 2 WHERE tag = '1'")
      .head().getLong(0) > 0)

    // RENAME became metadata-only in r15 (era-split mapping — the
    // full lifecycle is RenameColumnSpec's): over THIS table's mixed
    // DML/evolution history, v renames without a data version and the
    // pre-rename files still answer under the new name
    val nvBefore = Snapshots.versions(tp).size
    spark.sql(s"ALTER TABLE $cat.evo2.t RENAME COLUMN v TO w")
    assert(Snapshots.versions(tp).size == nvBefore, "rename must be metadata-only")
    assert(spark.table(s"$cat.evo2.t").columns.toSeq == Seq("k", "w"))
    assert(spark.sql(s"SELECT count(*) FROM $cat.evo2.t WHERE w = 154")
      .head().getLong(0) >= 1)
    // narrowing stays loud (Spark's analyzer rejects it before the
    // catalog; the catalog's own widening guard backstops non-SQL paths
    // and analyzer-admitted promotions parquet cannot perform)
    val narrow = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.evo2.t ALTER COLUMN k TYPE INT")
    }
    assert(narrow.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN") ||
      narrow.getMessage.contains("widening"), narrow.getMessage)
    val notPromotable = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.evo2.t ALTER COLUMN k TYPE DECIMAL(38,0)")
    }
    assert(notPromotable.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN") ||
      notPromotable.getMessage.contains("widening"), notPromotable.getMessage)
    // layout source columns are load-bearing: drop/retype refuse
    spark.sql(s"CREATE TABLE $cat.evo2.b (u INT, x BIGINT) PARTITIONED BY (bucket(4, u))")
    val dropLayout = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.evo2.b DROP COLUMN u")
    }
    assert(dropLayout.getMessage.contains("layout"), dropLayout.getMessage)
    val retypeLayout = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.evo2.b ALTER COLUMN u TYPE BIGINT")
    }
    assert(retypeLayout.getMessage.contains("layout"), retypeLayout.getMessage)
  }

  test("driver query matches its oracle shape and the DDL surface stays unsupported-loud") {
    val daily = graft.marts.DailySales.build(
      graft.marts.SilverEvents.build(graft.sources.Tables.events(spark, TestSession.sf)))
    val out = GraftCatalog.timeTravelOver(spark, daily).collect()
    assert(out.length == 3 && out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // monotone history: each snapshot extends the date frontier
    val dates = out.map(_.getString(2))
    assert(dates(0) <= dates(1) && dates(1) <= dates(2))
    assert(out(0).getLong(1) <= out(1).getLong(1) && out(1).getLong(1) <= out(2).getLong(1))
    val alter = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.plan.t ALTER COLUMN k TYPE STRING")
    }
    assert(alter.getMessage.contains("SchemaEvolution"),
      "type changes are full-state rewrites, not metadata-only")
  }

  test("DDL input validation: hostile bucket column names, reserved layout column, bucket(0, ...)") {
    spark.sql(s"CREATE NAMESPACE $cat.val")
    // a backtick in the bucket column name would corrupt _layout.json /
    // the generated layout expression on every later write — DDL rejects
    val hostile = intercept[Exception] {
      spark.sql(s"""CREATE TABLE $cat.val.h (`a``b` BIGINT, v BIGINT) PARTITIONED BY (bucket(4, `a``b`))""")
    }
    assert(hostile.getMessage.contains("[A-Za-z0-9_]+"), hostile.getMessage)
    // a DATA column named like the derived layout column would be
    // silently replaced by the derived bucket id on writes — DDL rejects
    val reserved = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.val.r (__graft_bucket INT, v BIGINT)")
    }
    assert(reserved.getMessage.contains("reserved"), reserved.getMessage)
    val reservedAdd = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.val.ra (v BIGINT)")
      spark.sql(s"ALTER TABLE $cat.val.ra ADD COLUMN __graft_bucket INT")
    }
    assert(reservedAdd.getMessage.contains("reserved"), reservedAdd.getMessage)
    // the SQL-callable bucket function fails descriptively on n <= 0
    // instead of a raw ArithmeticException
    val zero = intercept[Exception] {
      spark.sql(s"SELECT $cat.system.bucket(0, 7L)").collect()
    }
    assert(zero.getMessage.contains("n > 0"), zero.getMessage)
  }
}
