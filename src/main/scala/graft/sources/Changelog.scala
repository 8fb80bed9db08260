package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** CHANGELOG (CDC) serving for versioned tables — the Delta Change
  * Data Feed / Iceberg changelog-scan shape (the reference's Iceberg
  * tables expose `.changes`-style incremental scans through their
  * catalog tier): every commit's row-level effect is readable as
  * `(columns…, _change_type ∈ INSERT/DELETE/UPDATE_pre/UPDATE_post,
  * _commit_version)`, batch via `SELECT * FROM t.changes` and
  * streaming via `spark.readStream.table("cat.ns.t.changes")` — the
  * stream that crosses DML snapshots, which the plain table-as-stream
  * correctly refuses.
  *
  * Design (the Delta CDF trade, not the diff-on-read trade):
  *  - **Plain fast appends cost NOTHING and capture nothing** — their
  *    delta directories ARE the INSERT changelog, served by reference.
  *    The first (or oldest surviving) version serves the same way.
  *  - **DML commits on changelog-ENABLED tables capture their
  *    row-level effect at COMMIT time** into a hidden
  *    `v=N/_changes/` sidecar (pre/post images paired by the table's
  *    declared identifier keys — Iceberg's identifier-field idea).
  *    The capture job is bounded by the TOUCHED file set (non-carried
  *    + newly-position-targeted files), never the table: a one-file
  *    CoW UPDATE on a 100 TB table diffs one file against its
  *    rewrite. Keyed upserts capture pre-images by one semi-join of
  *    the prior state against the delivery's key set.
  *  - **Compaction captures nothing** (state-identical by contract);
  *    a DML commit from BEFORE the changelog was enabled refuses the
  *    read loudly, naming the fix.
  *
  * Identifier keys must be unique within any commit's touched row set
  * (the standard CDC pairing assumption — Iceberg identifier fields,
  * Delta's MERGE key contract); duplicate keys make UPDATE pairing
  * ambiguous and the capture join would multiply rows. */
object Changelog {

  val TypeCol = "_change_type"
  val VersionCol = "_commit_version"

  private def marker(table: String) = Paths.get(table, "_changelog.json")

  /** Declare the table CHANGELOG-ENABLED with `keys` as its
    * identifier columns (the pre/post pairing identity). DML commits
    * from this point on capture their row-level effect; history
    * BEFORE this point serves only if it is append-only. */
  def enableChangelog(table: String, keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "changelog needs at least one identifier key column")
    keys.foreach(k => require(k.matches("[A-Za-z0-9_]+"),
      s"changelog key must be a plain column name: '$k'"))
    Snapshots.declaredCleanOf(table).foreach(s => keys.foreach(k =>
      require(s.fieldNames.contains(k),
        s"changelog key $k is not a column of $table (${s.fieldNames.mkString(",")})")))
    val body = keys.map(k => "\"" + k + "\"").mkString("[", ",", "]")
    Files.createDirectories(Paths.get(table))
    Files.write(marker(table),
      s"""{"keys":$body}""".getBytes(StandardCharsets.UTF_8))
    ()
  }

  /** The table's declared changelog identifier keys; None = changelog
    * not enabled (captures are skipped, DML ranges refuse at read). */
  def keysOf(table: String): Option[Seq[String]] = {
    val p = marker(table)
    if (!Files.isRegularFile(p)) None
    else {
      val text = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      Some("\"([A-Za-z0-9_]+)\"".r.findAllMatchIn(
        text.dropWhile(_ != '[')).map(_.group(1)).toSeq)
    }
  }

  /** Library-level batch read of the changelog over a VERSION RANGE —
    * the same per-version plan the `t.changes` DSv2 scan serves
    * ([[changesPlanFor]]), composed as one DataFrame: capture files
    * read with the change type in-file, append deltas as constant
    * INSERT, each tagged with its commit version. `(fromVExclusive,
    * toV]` matches the streaming offset convention. Cost is O(changed
    * rows in range) — the base table is never read. */
  def readRange(spark: SparkSession, table: String,
                fromVExclusive: Long, toV: Long): DataFrame = {
    val ds = Snapshots.declaredCleanOf(table).getOrElse {
      val vs = Snapshots.versions(table)
      require(vs.nonEmpty, s"changelog of $table: no snapshots")
      val files = Snapshots.readSet(table, vs.last).flatMap(p =>
        if (p.endsWith(".parquet")) Seq(p) else Snapshots.expandParquet(p))
      spark.read.option("mergeSchema", "true").parquet(files: _*).schema
    }
    val withType = org.apache.spark.sql.types.StructType(
      ds.fields :+ org.apache.spark.sql.types.StructField(TypeCol,
        org.apache.spark.sql.types.StringType, nullable = false))
    val all = Snapshots.versions(table)
    // same expired-history guard as the streaming path (planRange): a
    // non-zero start below the oldest SURVIVING version means retention
    // removed versions inside the range — serving the oldest survivor
    // as a full-state INSERT would double-apply the whole base into
    // any incremental consumer (IncrementalMart.refresh folds this
    // range and advances its marker: a silent gap here is permanent
    // mart corruption). Refuse loudly; the remedy is re-initializing
    // the consumer from the current state.
    if (fromVExclusive > 0 && all.nonEmpty && fromVExclusive < all.head)
      throw new IllegalStateException(
        s"changelog of $table: the range starts after version $fromVExclusive " +
          s"but retention expired history up to v${all.head} — the changes in " +
          "between are gone; re-initialize the consumer from the current state")
    val vs = all.filter(v => v > fromVExclusive && v <= toV)
    val parts = vs.flatMap { v =>
      changesPlanFor(table, v).map { case (files, constType) =>
        val base = constType match {
          case Some(t) => spark.read.schema(ds).parquet(files: _*)
            .withColumn(TypeCol, lit(t))
          case None => spark.read.schema(withType).parquet(files: _*)
        }
        base.withColumn(VersionCol, lit(v))
      }
    }
    parts.reduceOption(_.unionByName(_)).getOrElse(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(withType.fields :+
          org.apache.spark.sql.types.StructField(VersionCol,
            org.apache.spark.sql.types.LongType, nullable = false))))
  }

  private def capDir(table: String, v: Long) =
    Paths.get(table, s"v=$v", "_changes")

  private def capFiles(table: String, v: Long): Seq[String] = {
    val d = capDir(table, v)
    if (!Files.isDirectory(d)) Nil
    else scala.util.Using.resource(Files.walk(d)) { w =>
      w.iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
        .map(_.toString).toVector.sorted
    }
  }

  /** Write-time capture for a CoW / full-state commit of version `v`
    * (data already written, manifest not yet published): the keyed
    * diff of the prior state's TOUCHED files against version `v`'s
    * view of them. Touched = prior files not carried forward, plus
    * files targeted by NEW positional entries (their rows shrink),
    * plus carried refs that were not part of the prior state (a
    * publish bringing branch directories in). No-op unless the
    * changelog marker is present; `compact` is state-identical by
    * contract and captures nothing. */
  private[sources] def captureCow(spark: SparkSession, table: String, v: Long,
                                  operation: String,
                                  carried: Seq[FileStats.FileStat],
                                  newDeletes: Seq[MorDeletes.DeleteFile],
                                  eqDeletes: Seq[EqDeletes.EqDelete]): Unit = {
    val keys = keysOf(table).getOrElse(return)
    if (operation == "compact") return
    val vs = Snapshots.versions(table)
    if (vs.isEmpty) return
    val priorV = vs.last
    // capture reads resolve columns at ONE set of physical names —
    // live rename eras break that (pre-rename files would read the
    // declared names as NULL, corrupting pre-images), the same
    // argument every merge surface makes. Refuse the COMMIT loudly:
    // a silent mis-capture would poison the changelog forever.
    require(!Snapshots.erasActive(table, priorV, Snapshots.renameInfoOf(table),
        Long.MaxValue),
      s"changelog capture on $table: rename eras are live — run " +
        "Snapshots.compact() before DML on a changelog-enabled table")
    val priorFiles = Snapshots.readSet(table, priorV).flatMap(p =>
      if (p.endsWith(".parquet")) Seq(p) else Snapshots.expandParquet(p))
    val priorRefs = priorFiles.map(p => Snapshots.rootRel(table, p)).toSet
    val carriedNames = carried.map(_.name).toSet
    val newPosTargets = MorDeletes.targetRefs(
      newDeletes.filter(_.dir.startsWith(s"v=$v/")))
    val touchedOld = (priorRefs -- carriedNames) ++ (newPosTargets intersect priorRefs)
    val ownRefs = Snapshots.expandParquet(s"$table/v=$v")
      .map(p => Snapshots.rootRel(table, p)).toSet
    val postRefs = ownRefs ++ (carriedNames -- priorRefs) ++
      (newPosTargets intersect carriedNames)
    val outSchema = Snapshots.declaredCleanOf(table).getOrElse {
      val any = (priorFiles ++ ownRefs.map(r => s"$table/$r")).headOption
        .getOrElse(return)
      spark.read.option("mergeSchema", "true").parquet(any).schema
    }
    keys.foreach(k => require(outSchema.fieldNames.contains(k),
      s"changelog key $k is not a column of $table"))
    def readRefs(refs: Set[String],
                 dels: Seq[MorDeletes.DeleteFile],
                 eqs: Seq[EqDeletes.EqDelete]): DataFrame =
      if (refs.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
      else Snapshots.applyAllDeletes(
        spark.read.option("mergeSchema", "true").schema(outSchema)
          .parquet(refs.toSeq.sorted.map(r => s"$table/$r"): _*),
        table, dels, eqs)
    val pre = readRefs(touchedOld,
      Snapshots.liveDeletes(table, priorV), Snapshots.liveEqDeletes(table, priorV))
    val post = readRefs(postRefs, newDeletes, eqDeletes)
    writeCapture(spark, table, v, diffByKey(pre, post, keys, outSchema))
  }

  /** The keyed pre/post diff: full-outer on the identifier keys with
    * a full-row hash for change detection — pre-only rows are
    * DELETEs, post-only INSERTs, changed pairs emit UPDATE_pre +
    * UPDATE_post, identical pairs (a rewritten file's carried-along
    * rows) net out. One pass via explode — no re-reads per branch. */
  private def diffByKey(pre: DataFrame, post: DataFrame, keys: Seq[String],
                        schema: StructType): DataFrame = {
    val cols = schema.fieldNames.toSeq
    def tagged(df: DataFrame, side: String) =
      df.select(keys.map(col) ++ Seq(
        md5(to_json(struct(cols.sorted.map(col): _*))).as(s"__h_$side"),
        struct(cols.map(col): _*).as(s"__r_$side")): _*)
    tagged(pre, "a").join(tagged(post, "b"), keys.toSeq, "full_outer")
      .select(expr(s"""
        CASE WHEN __h_b IS NULL THEN array(named_struct('r', __r_a, 't', 'DELETE'))
             WHEN __h_a IS NULL THEN array(named_struct('r', __r_b, 't', 'INSERT'))
             WHEN __h_a != __h_b THEN array(
               named_struct('r', __r_a, 't', 'UPDATE_pre'),
               named_struct('r', __r_b, 't', 'UPDATE_post'))
             ELSE array() END""").as("__cs"))
      .select(explode(col("__cs")).as("__c"))
      .select(col("__c.r.*"), col("__c.t").as(TypeCol))
  }

  /** Write-time capture for one keyed UPSERT delivery (version `v`,
    * retraction bound `priorV`): pre-images are the prior state's
    * rows matching the delivery's key set (every delivered row is
    * appended, so every matched pre-image is an UPDATE_pre); delivered
    * rows whose key existed before are UPDATE_post, the rest INSERT.
    * Cost: one semi-join of the prior state against the delivery keys
    * — paid only by changelog-enabled tables (the Delta CDF trade;
    * the plain upsert keeps its zero-read blind-write contract). */
  private[sources] def captureUpsert(spark: SparkSession, table: String, v: Long,
                                     priorV: Long, rows: DataFrame,
                                     keys: Seq[String]): Unit = {
    if (keysOf(table).isEmpty) return
    val cols = rows.columns.toSeq
    // the pre-image scan is FILE-PRUNED by the delivery's own key
    // envelope (the same manifest-bounds carry mergeIntoBranch uses):
    // at 100 TB the capture reads only files that can hold a delivered
    // key, never the table — statless components are kept whole
    // (pruning is an optimization, never a correctness gate)
    val envelope = Snapshots.keyEnvelope(rows, keys, rows.schema)
    val comps = Snapshots.stateComponents(table, priorV)
    val boundsKept = comps.flatMap {
      case Left(d) => Snapshots.expandParquet(d).map((_, false))
      case Right((p, st)) =>
        if (envelope.isEmpty || FileStats.mayMatch(st, envelope)) Seq((p, true)) else Nil
    }
    // bloom layer: small deliveries carry their exact key set as In
    // conjuncts in the envelope — on a bloom-opted key column, files
    // provably holding none of the delivered keys drop from the
    // pre-image scan even when bounds can't prune (hash-shaped keys)
    val bloomAbsent = BloomSkip.provablyAbsent(table,
      boundsKept.collect { case (p, true) => p }, envelope)
    val keepFiles = boundsKept.collect {
      case (p, _) if !bloomAbsent.contains(p) => p
    }
    val outSchema = Snapshots.declaredCleanOf(table)
      .getOrElse(Snapshots.readAsOf(spark, table, priorV).schema)
    val prior =
      if (keepFiles.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
      else Snapshots.applyAllDeletes(
        spark.read.option("mergeSchema", "true").schema(outSchema)
          .parquet(keepFiles: _*),
        table, Snapshots.liveDeletes(table, priorV),
        Snapshots.liveEqDeletes(table, priorV))
    val newKeys = rows.select(keys.map(col): _*).na.drop("any").distinct()
    val matchedPre = prior.join(newKeys, keys.toSeq, "left_semi")
    val matchedKeys = matchedPre.select(keys.map(col): _*).distinct()
    val preImg = matchedPre.select(cols.map(col): _*)
      .withColumn(TypeCol, lit("UPDATE_pre"))
    val updPost = rows.join(matchedKeys, keys.toSeq, "left_semi")
      .select(cols.map(col): _*).withColumn(TypeCol, lit("UPDATE_post"))
    val ins = rows.join(matchedKeys, keys.toSeq, "left_anti")
      .select(cols.map(col): _*).withColumn(TypeCol, lit("INSERT"))
    writeCapture(spark, table, v, preImg.unionByName(updPost).unionByName(ins))
  }

  private def writeCapture(spark: SparkSession, table: String, v: Long,
                           changes: DataFrame): Unit = {
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    // an EMPTY capture still writes the directory: "captured, zero
    // changes" must stay distinguishable from "never captured"
    changes.write.mode("errorifexists").option("compression", "snappy")
      .parquet(capDir(table, v).toString)
  }

  /** The read plan of version `v`'s changes: file groups with an
    * optional constant change type (None = the type column is IN the
    * capture files). Nil = provably zero changes (compaction).
    * Throws, named, for a DML commit that predates enablement. */
  private[graft] def changesPlanFor(table: String, v: Long)
      : Seq[(Seq[String], Option[String])] = {
    // history at or below a rename boundary carries OLD physical
    // names the current schema would read as NULL — refuse, named
    // (post-boundary versions serve fine: their files and captures
    // already carry current names)
    val info = Snapshots.renameInfoOf(table)
    if (info.nonEmpty && v <= info.maxBoundary)
      throw new IllegalStateException(
        s"changelog of $table: version $v predates a column rename (boundary " +
          s"v${info.maxBoundary}) — pre-rename history carries old physical " +
          "names; start the changelog from the current state")
    val cap = capFiles(table, v)
    if (Files.isDirectory(capDir(table, v)))
      return if (cap.isEmpty) Nil else Seq((cap, None))
    val vs = Snapshots.versions(table)
    val own = Snapshots.expandParquet(s"$table/v=$v")
    if (v == vs.head) // the oldest surviving version IS the initial INSERT set
      return if (own.isEmpty) Nil else Seq((own, Some("INSERT")))
    val op = Snapshots.operationOf(table, v)
    if (op == "append" &&
        EqDeletes.fromManifest(Snapshots.manifestTextOf(table, v)).isEmpty)
      // the fast-append fast path: the delta directory IS the INSERT
      // changelog — zero capture cost by design
      if (own.isEmpty) Nil else Seq((own, Some("INSERT")))
    else if (op == "compact") Nil // state-identical by contract
    else keysOf(table) match {
      // the BACKFILL slow path: a DML commit from BEFORE the changelog
      // was enabled has no capture files, but the identifier keys are
      // declared NOW — its row-level effect is recomputable as the
      // keyed diff of the two adjacent surviving states (the
      // diff-on-read trade: two state reads for this one version,
      // paid once and cached as a sidecar). Post-enablement ranges
      // never come here — their captures serve byte-identically.
      case Some(keys) => backfillDiffPlan(table, v, keys)
      case None => throw new IllegalStateException(
        s"changelog of $table: version $v is a '$op' commit with no captured " +
          "change files — it predates changelog enablement and no identifier " +
          "keys are declared. Enable the changelog (Snapshots.enableChangelog " +
          "/ TBLPROPERTIES 'graft.changelog.keys'); with keys declared, " +
          "historical DML ranges are served via diff-on-read backfill")
    }
  }

  private def diffDir(table: String, v: Long) =
    Paths.get(table, s"v=$v", "_changes_diff")

  /** Serve pre-enablement DML version `v` as a keyed diff of the two
    * adjacent SURVIVING states, materialized once into a
    * `v=N/_changes_diff/` sidecar (atomic directory rename; a racing
    * planner loses the rename and reuses the winner's files). If
    * retention expired versions between `v` and its surviving
    * predecessor, their collapsed effect is attributed to `v` — the
    * range's overall semantics stay exact (no loss, no double count).
    * Cost: two full-state reads for THIS version only — the
    * diff-on-read trade a backfill pays once; the files then serve
    * like capture files (change type in-file), so batch and streaming
    * consumers are byte-identical to the fast path downstream. */
  private def backfillDiffPlan(table: String, v: Long, keys: Seq[String])
      : Seq[(Seq[String], Option[String])] = {
    val dir = diffDir(table, v)
    if (!Files.isDirectory(dir)) {
      val spark = SparkSession.active
      val prev = Snapshots.versions(table).filter(_ < v).lastOption.getOrElse(
        throw new IllegalStateException(
          s"changelog backfill of $table v$v: no surviving predecessor"))
      val outSchema = Snapshots.declaredCleanOf(table).getOrElse(
        Snapshots.readAsOf(spark, table, v).schema)
      keys.foreach(k => require(outSchema.fieldNames.contains(k),
        s"changelog key $k is not a column of $table"))
      val cols = outSchema.fieldNames.toSeq
      val pre = Snapshots.readAsOf(spark, table, prev).select(cols.map(col): _*)
      val post = Snapshots.readAsOf(spark, table, v).select(cols.map(col): _*)
      val tmp = Paths.get(table, s"v=$v",
        s"_changes_diff.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      diffByKey(pre, post, keys,
        org.apache.spark.sql.types.StructType(outSchema.fields))
        .write.mode("errorifexists").option("compression", "snappy")
        .parquet(tmp.toString)
      try Files.move(tmp, dir, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileAlreadyExistsException |
             _: java.nio.file.DirectoryNotEmptyException =>
          // a racing planner won — its files are equivalent; drop ours
          scala.util.Using.resource(Files.walk(tmp)) { w =>
            w.sorted(java.util.Comparator.reverseOrder())
              .forEach(p => { Files.deleteIfExists(p); () })
          }
      }
    }
    val files = scala.util.Using.resource(Files.walk(dir)) { w =>
      w.iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
        .map(_.toString).toVector.sorted
    }
    if (files.isEmpty) Nil else Seq((files, None))
  }
}

/** The `t.changes` table: batch (`SELECT * FROM cat.ns.t.changes`)
  * and streaming (`readStream.table("cat.ns.t.changes")`) over the
  * changelog — schema = the table's columns + `_change_type` +
  * `_commit_version`. */
private[graft] class GraftChangesTable(tablePath: String, tableName: String)
  extends Table with SupportsRead {

  private def spark: SparkSession = SparkSession.active

  override def name(): String = tableName

  private[graft] def dataSchema: StructType =
    Snapshots.declaredCleanOf(tablePath).getOrElse {
      val vs = Snapshots.versions(tablePath)
      require(vs.nonEmpty, s"$tableName: no snapshots")
      val files = Snapshots.readSet(tablePath, vs.last).flatMap(p =>
        if (p.endsWith(".parquet")) Seq(p) else Snapshots.expandParquet(p))
      spark.read.option("mergeSchema", "true").parquet(files: _*).schema
    }

  override def schema(): StructType = {
    val ds = dataSchema
    ds.add(Changelog.TypeCol, StringType, nullable = false)
      .add(Changelog.VersionCol, LongType, nullable = false)
  }

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val out = schema()
    val ds = dataSchema
    // Delta-CDF-style range options for BATCH reads: startingVersion /
    // endingVersion, both INCLUSIVE (streaming ignores them — its
    // range comes from offsets)
    def longOpt(k: String): Option[Long] =
      Option(options.get(k)).map(v => try v.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$name option $k must be a snapshot version number, got '$v'")
      })
    val starting = longOpt("startingVersion")
    val ending = longOpt("endingVersion")
    new ScanBuilder
      with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
      private var required: StructType = out
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan =
        new GraftChangesScan(tablePath, ds, required, starting, ending)
    }
  }
}

/** The changes scan: per version in range, one stock parquet batch
  * over either the version's capture files (change type in-file) or
  * its append delta (constant INSERT), with the commit version (and
  * constant type) appended by a thin reader wrapper. Column pruning
  * is honored (the inner parquet scans read only the requested data
  * columns; the meta columns are in-file or constants). Batch reads
  * serve the full surviving history; the micro-batch stream serves
  * `(start, end]` version ranges with snapshot-version offsets —
  * checkpoint resume across DML commits for free. */
private[graft] class GraftChangesScan(tablePath: String,
                                      dataSchema: StructType,
                                      output: StructType,
                                      startingVersion: Option[Long] = None,
                                      endingVersion: Option[Long] = None)
  extends Scan with Batch {

  override def readSchema(): StructType = output
  override def toBatch: Batch = this
  override def description(): String = s"graft-changes($tablePath)"

  private def spark: SparkSession = SparkSession.active

  // the requested projection, split: data columns (read from parquet,
  // in table-schema order — Spark's pruning preserves it) and the two
  // meta columns (in-file for capture groups / constants otherwise)
  private val typeRequested = output.fieldNames.contains(Changelog.TypeCol)
  private val versionRequested = output.fieldNames.contains(Changelog.VersionCol)
  private val prunedData = StructType(output.fields.filterNot(f =>
    f.name == Changelog.TypeCol || f.name == Changelog.VersionCol))

  import GraftChangesScan.{ChangePart, Group}

  @volatile private var groups: Array[Group] = Array.empty

  private[graft] def planRange(startExclusive: Long, endInclusive: Long)
      : Array[InputPartition] = {
    val all = Snapshots.versions(tablePath)
    // a non-zero start below the oldest SURVIVING version means the
    // range's history was expired by retention — serving the oldest
    // survivor as a full-state INSERT would double-count everything
    // the consumer already took; refuse loudly (Delta CDF makes the
    // same demand), the remedy is a fresh stream from offset 0
    if (startExclusive > 0 && all.nonEmpty && startExclusive < all.head)
      throw new IllegalStateException(
        s"changelog of $tablePath: the range starts after version $startExclusive " +
          s"but retention expired history up to v${all.head} — the changes in " +
          "between are gone; restart the changelog read from scratch")
    val vs = all.filter(v => v > startExclusive && v <= endInclusive)
    val gs = Seq.newBuilder[Group]
    vs.foreach { v =>
      Changelog.changesPlanFor(tablePath, v).foreach { case (files, constType) =>
        // capture groups read the type column FROM FILE iff requested;
        // insert groups read data only and the type rides as a const
        val schemaFor =
          if (constType.isEmpty && typeRequested)
            prunedData.add(Changelog.TypeCol, StringType, nullable = true)
          else prunedData
        val batch = ParquetTable(s"graft-changes($tablePath@v$v)", spark,
          new CaseInsensitiveStringMap(
            java.util.Collections.singletonMap("mergeSchema", "true")),
          files, userSpecifiedSchema = Some(schemaFor),
          fallbackFileFormat = classOf[ParquetFileFormat])
          .newScanBuilder(CaseInsensitiveStringMap.empty()).build().toBatch
        gs += Group(batch, constType, v)
      }
    }
    groups = gs.result().toArray
    groups.zipWithIndex.flatMap { case (g, i) =>
      g.batch.planInputPartitions().map(p => ChangePart(p, i): InputPartition)
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val vs = Snapshots.versions(tablePath)
    if (vs.isEmpty) Array.empty
    else planRange(startingVersion.map(_ - 1).getOrElse(0L),
      endingVersion.getOrElse(vs.last))
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val fs = groups.map(g =>
      (g.batch.createReaderFactory(), g.constType, g.version))
    val wantType = typeRequested
    val wantVersion = versionRequested
    new PartitionReaderFactory {
      override def supportColumnarReads(p: InputPartition): Boolean = false
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        p match {
          case ChangePart(inner, gi) =>
            val (f, constType, version) = fs(gi)
            val r = f.createReader(inner)
            val consts: Array[Any] =
              (constType match {
                case Some(t) if wantType => Seq[Any](UTF8String.fromString(t))
                case _                   => Seq.empty[Any]
              }).toArray ++ (if (wantVersion) Array[Any](version) else Array.empty[Any])
            if (consts.isEmpty) r
            else {
              val tail = new org.apache.spark.sql.catalyst.expressions
                .GenericInternalRow(consts)
              val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
              new PartitionReader[InternalRow] {
                override def next(): Boolean = r.next()
                override def get(): InternalRow = joined(r.get(), tail)
                override def close(): Unit = r.close()
              }
            }
          case other => throw new IllegalStateException(
            s"changes factory got unknown partition ${other.getClass.getName}")
        }
    }
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftChangelogMicroBatchStream(tablePath, this)
}

private[graft] object GraftChangesScan {
  /** One planned group: its file batch, constant type (None = in
    * file) and commit version. Top-level (no outer reference) so the
    * reader factory's closure ships without the scan. */
  final case class Group(batch: Batch, constType: Option[String], version: Long)

  final case class ChangePart(inner: InputPartition, group: Int) extends InputPartition {
    override def preferredLocations(): Array[String] = inner.preferredLocations()
  }
}

/** Snapshot-version offsets over the changelog — the same offset
  * model as the plain table stream, but each batch serves row-level
  * CHANGES, so the stream crosses DML snapshots instead of refusing
  * them. */
private[graft] class GraftChangelogMicroBatchStream(tablePath: String,
                                                    scan: GraftChangesScan)
  extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  override def initialOffset(): Offset = VersionOffset(0L)

  override def latestOffset(): Offset =
    VersionOffset(Snapshots.versions(tablePath).lastOption.getOrElse(0L))

  @volatile private var availableNowTarget: Option[Offset] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(latestOffset())

  override def getDefaultReadLimit: org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def latestOffset(start: Offset,
                            limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
    availableNowTarget.getOrElse(latestOffset())

  override def reportLatestOffset(): Offset = latestOffset()

  override def deserializeOffset(json: String): Offset =
    VersionOffset("\"version\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(json)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalArgumentException(s"bad offset json: $json")))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    scan.planRange(start.asInstanceOf[VersionOffset].version,
      end.asInstanceOf[VersionOffset].version)

  override def createReaderFactory(): PartitionReaderFactory =
    scan.createReaderFactory()

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
