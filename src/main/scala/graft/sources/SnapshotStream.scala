package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns, SupportsPushDownVariantExtractions, SupportsReportStatistics, VariantExtraction}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScanBuilder, ParquetTable}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Streaming reads of [[GraftCatalog]] tables —
  * `spark.readStream.table("graft.ns.t")` — the Delta/Iceberg
  * table-as-stream pattern over the versioned-parquet store's
  * append-only history:
  *
  *  - the FIRST batch loads the table's current state (the latest
  *    snapshot's read set), exactly like Delta's initial snapshot;
  *  - every subsequent batch reads ONLY the fast-append delta
  *    directories committed since the last processed version —
  *    O(delta) per micro-batch, the metadata (version numbers) is the
  *    offset;
  *  - a non-append snapshot (overwrite / delete / merge / truncate)
  *    inside the unprocessed range fails the stream loudly — the same
  *    contract Delta enforces without `ignoreChanges`: a stream
  *    cannot replay a rewrite as a delta.
  *
  * Offsets are snapshot version numbers (`{"version":N}`), so a
  * restarted stream resumes from its checkpoint with no source-side
  * state. Batches plan through Spark's own `ParquetTable` over the
  * delta directories — stock vectorized scan, column pruning honored
  * (the pruned schema negotiated at scan build is re-applied per
  * batch).
  */
private[graft] case class VersionOffset(version: Long) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

object SnapshotStream {

  private val runCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Driver query: the table-as-stream contract as a deterministic
    * gate row. Builds a catalog table over the daily mart (CTAS ≤
    * 01-10, fast-append (01-10, 01-20]), drains one AvailableNow run
    * (must deliver the FULL current state), appends the remaining
    * dates while the stream is down, drains again from the same
    * checkpoint (must deliver ONLY the delta) — both counts surface,
    * so the DuckDB oracle replays the offset arithmetic from silver.
    * Fresh table + checkpoint per invocation keeps bench repeats
    * honest. */
  def catalogStreamOver(s: SparkSession, daily: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    GraftCatalog.ensureRegistered(s)
    val n = runCounter.incrementAndGet()
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.marts")
    val t = s"graft.marts.daily_st_$n"
    val v = s"__graft_st_src_$n"
    daily.createOrReplaceTempView(v)
    s.sql(s"CREATE TABLE $t AS SELECT * FROM $v WHERE event_date <= DATE '2024-01-10'")
    s.sql(s"INSERT INTO $t SELECT * FROM $v WHERE event_date > DATE '2024-01-10' AND event_date <= DATE '2024-01-20'")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_catstream_").toString
    def drain(): Long = {
      val cnt = new java.util.concurrent.atomic.AtomicLong(0L)
      val q = s.readStream.table(t).writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          cnt.addAndGet(df.count()); () }
        .option("checkpointLocation", s"$ckpt/ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      // awaitTermination(timeout) returns false when the query is STILL
      // RUNNING — proceeding then would read a partial count and leave a
      // live query sharing the checkpoint with the next drain (a
      // misleading data mismatch instead of a clear timeout).
      if (!q.awaitTermination(120000)) {
        q.stop()
        throw new IllegalStateException(
          s"AvailableNow drain of $t did not finish within 120s")
      }
      cnt.get()
    }
    try {
      val initial = drain()
      s.sql(s"INSERT INTO $t SELECT * FROM $v WHERE event_date > DATE '2024-01-20'")
      val delta = drain()
      import s.implicits._
      Seq(("delta", delta), ("initial", initial))
        .toDF("phase", "row_count")
        .orderBy(org.apache.spark.sql.functions.col("phase"))
    } finally {
      val root = new java.io.File(ckpt)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(); ()
      }
      rm(root)
    }
  }

  /** DuckDB oracle: both drains replayed as date predicates. */
  val catalogStreamSql: String = graft.marts.SilverEvents.oracleCte + """
    |, daily AS (SELECT event_date FROM silver GROUP BY event_date)
    |SELECT * FROM (
    |  SELECT 'delta' AS phase,
    |    (SELECT count(*) FROM daily WHERE event_date > DATE '2024-01-20') AS row_count
    |  UNION ALL SELECT 'initial',
    |    (SELECT count(*) FROM daily WHERE event_date <= DATE '2024-01-20')
    |)
    |ORDER BY phase""".stripMargin
}

private[graft] class SnapshotMicroBatchStream(tablePath: String,
                                                fullSchema: StructType,
                                                prunedSchema: StructType)
  extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private def spark: SparkSession = SparkSession.active

  override def initialOffset(): Offset = VersionOffset(0L)

  override def latestOffset(): Offset =
    VersionOffset(Snapshots.versions(tablePath).lastOption.getOrElse(0L))

  // Trigger.AvailableNow: pin the catch-up target when the query
  // starts so late-arriving snapshots don't extend the run
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

  /** Paths for the (start, end] version range: the full current read
    * set on the initial batch, append deltas only afterwards. Bucketed
    * tables expand deltas to explicit files (their version dirs hold
    * layout subdirectories the stream must not partition-discover). */
  private def batchDirs(start: Long, end: Long): Seq[String] =
    if (end <= start) Seq.empty
    else if (start == 0L) {
      // the initial snapshot reads raw data files — live positional
      // delete sidecars cannot merge into a delta stream (same class
      // as the non-append guard below); compaction materializes them
      require(Snapshots.liveDeletes(tablePath, end).isEmpty,
        s"streaming read of $tablePath: live merge-on-read delete files cannot " +
          "replay as deltas — run Snapshots.compact() to materialize them first")
      // same class: pre-rename files carry old physical names the
      // stream's fixed schema would read as NULL — refuse until a
      // compaction rewrites them under current names
      require(!Snapshots.erasActive(tablePath, end,
          Snapshots.renameInfoOf(tablePath), Long.MaxValue),
        s"streaming read of $tablePath: live rename eras cannot replay " +
          "(pre-rename files carry old physical names) — run Snapshots.compact() first")
      require(Snapshots.liveEqDeletes(tablePath, end).isEmpty,
        s"streaming read of $tablePath: live equality-delete entries cannot " +
          "replay as deltas — run Snapshots.compact() first")
      Snapshots.readSet(tablePath, end)
    } else {
      val vs = Snapshots.versions(tablePath).filter(v => v > start && v <= end)
      val nonAppend = vs.filter(v => Snapshots.operationOf(tablePath, v) != "append")
      require(nonAppend.isEmpty,
        s"streaming read of $tablePath found non-append snapshot(s) " +
          s"${nonAppend.map(v => s"$v(${Snapshots.operationOf(tablePath, v)})").mkString(", ")} " +
          "in the unprocessed range — a rewrite cannot replay as a delta; restart " +
          "the stream, or stream row-level CHANGES across DML via " +
          "readStream.table(\"<table>.changes\") (changelog-enabled tables)")
      // a delta that predates a rename boundary carries old physical
      // names — the stream's fixed schema would read them as NULL
      require(vs.isEmpty ||
          vs.min > Snapshots.renameInfoOf(tablePath).maxBoundary,
        s"streaming read of $tablePath: unprocessed pre-rename delta(s) carry old " +
          "physical names — run Snapshots.compact() and restart the stream")
      // an upsert append RETRACTS prior rows — not expressible as a
      // pure insert delta
      require(vs.forall(x =>
          EqDeletes.fromManifest(Snapshots.manifestTextOf(tablePath, x)).isEmpty),
        s"streaming read of $tablePath: an unprocessed upsert (equality-delete) " +
          "snapshot retracts prior rows and cannot replay as a delta — " +
          "run Snapshots.compact() and restart the stream")
      val dirs = vs.map(v => s"$tablePath/v=$v")
      if (!Snapshots.everLaidOut(tablePath)) dirs
      else dirs.flatMap(Snapshots.expandParquet)
    }

  // set by planInputPartitions, read by createReaderFactory — the
  // exec always plans the batch before asking for its reader factory
  @volatile private var currentBatch: Option[Batch] = None

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val dirs = batchDirs(start.asInstanceOf[VersionOffset].version,
      end.asInstanceOf[VersionOffset].version)
    if (dirs.isEmpty) { currentBatch = None; Array.empty }
    else {
      val builder = ParquetTable(s"graft-stream($tablePath)", spark,
        new CaseInsensitiveStringMap(
          java.util.Collections.singletonMap("mergeSchema", "true")),
        dirs, userSpecifiedSchema = Some(fullSchema),
        fallbackFileFormat = classOf[ParquetFileFormat])
        .newScanBuilder(CaseInsensitiveStringMap.empty())
      builder.pruneColumns(prunedSchema)
      val batch = builder.build().toBatch
      currentBatch = Some(batch)
      batch.planInputPartitions()
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    currentBatch.map(_.createReaderFactory()).getOrElse(
      new PartitionReaderFactory {
        override def createReader(p: InputPartition): PartitionReader[org.apache.spark.sql.catalyst.InternalRow] =
          throw new IllegalStateException("empty micro-batch planned no partitions")
      })

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** The scan-rebuild seam for manifest-stats file skipping: answers
  * which files of the read set survive the pushed filters, and hands
  * out a fresh builder over exactly those files. */
private[sources] trait GraftPruneRebuild {
  def prunedFiles(filters: Seq[Expression]): Option[Seq[String]]
  def builderOver(files: Seq[String]): ParquetScanBuilder
}

/** The scan behind a manifest-answered aggregation: one constant row
  * already holding the FINAL aggregate values — no data files, no
  * tasks over data, the whole answer was KB manifest arithmetic. */
private[sources] class GraftManifestAggScan(schema: StructType, values: Array[Any])
  extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String = "graft-manifest-aggregate"
  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftSingletonPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    GraftConstRowFactory(values)
}

private[sources] case object GraftSingletonPartition extends InputPartition

private[sources] final case class GraftConstRowFactory(values: Array[Any])
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[org.apache.spark.sql.catalyst.InternalRow] =
    new PartitionReader[org.apache.spark.sql.catalyst.InternalRow] {
      private var done = false
      override def next(): Boolean = if (done) false else { done = true; true }
      override def get(): org.apache.spark.sql.catalyst.InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values.clone())
      override def close(): Unit = ()
    }
}

/** Fully-delegating wrapper around the stock parquet scan builder
  * whose built scan additionally answers `toMicroBatchStream` —
  * every pushdown surface (columns, catalyst filters, aggregates,
  * variant extractions) forwards to the delegate so batch plans are
  * bit-identical to the unwrapped path.
  *
  * With a [[GraftPruneRebuild]] attached, `build()` first asks the
  * manifest stats whether the pushed filters prune any data files
  * ([[Snapshots.pruneReadSet]]). If they do, the scan is REBUILT over
  * the surviving file list by replaying the journaled pushdown calls
  * (same order, same arguments) onto a fresh builder — every replayed
  * answer must match the one Spark already consumed, else the pruned
  * plan could disagree with the negotiated contract and we fall back
  * to the unpruned delegate. Zero files surviving yields an empty
  * batch with the negotiated read schema. Streaming is untouched:
  * `toMicroBatchStream` reads version directories itself. */
private[sources] class GraftStreamableScanBuilder(delegate: ParquetScanBuilder,
                                                  tablePath: String,
                                                  fullSchema: StructType,
                                                  pruneRebuild: Option[GraftPruneRebuild] = None,
                                                  layout: Option[GraftLayout] = None,
                                                  manifestAggVersion: Option[Long] = None)
  extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
    with SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit
    with SupportsPushDownVariantExtractions {

  // journaled pushdown calls; each replay closure answers "did the
  // fresh builder give the same answer the delegate gave Spark?"
  private val journal = scala.collection.mutable.Buffer.empty[ParquetScanBuilder => Boolean]
  private val filterExprs = scala.collection.mutable.Buffer.empty[Expression]
  // the file-ref metadata column is served by this wrapper (per-file
  // partitions + appended ref), never by the parquet delegate
  private var includeFileRef = false

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // the in-file-position column exists for row-level DML scans only:
    // this path pushes filters into parquet (row-group skipping), so a
    // counted position here would NOT be the physical file position
    require(!requiredSchema.fieldNames.contains(GraftPosColumn.name()),
      s"${GraftPosColumn.name()} is served only on row-level DML scans " +
        "(plain reads push filters into parquet, which breaks position " +
        "counting) — use _metadata.row_index for plain reads")
    includeFileRef = requiredSchema.fieldNames.contains(GraftGroupColumn.name())
    val dataOnly = StructType(
      requiredSchema.fields.filterNot(_.name == GraftGroupColumn.name()))
    delegate.pruneColumns(dataOnly)
    journal += { b => b.pruneColumns(dataOnly); true }
  }
  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    val leftover = delegate.pushFilters(filters)
    filterExprs ++= filters
    journal += { b => b.pushFilters(filters) == leftover }
    leftover
  }
  override def pushedFilters(): Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    delegate.pushedFilters

  // manifest-complete aggregation: memoized per Aggregation instance
  // (supportCompletePushDown and pushAggregation both consult it)
  private var aggAnswer: Option[(StructType, Array[Any])] = None
  private var aggAnswerFor: Aggregation = _
  private def manifestAnswer(aggregation: Aggregation): Option[(StructType, Array[Any])] = {
    if (!(aggregation eq aggAnswerFor)) {
      aggAnswerFor = aggregation
      // only a FILTERLESS aggregation is manifest-answerable: bounds
      // cannot split rows, and the delegate saw no filters either way
      aggAnswer =
        if (filterExprs.nonEmpty) None
        else manifestAggVersion.flatMap(v =>
          ManifestAgg.answer(tablePath, v, aggregation, fullSchema))
    }
    aggAnswer
  }

  /** Limit-aware FILE planning: an unfiltered `LIMIT n` needs only
    * the shortest file prefix whose manifest row counts cover n —
    * `LIMIT 10` over a 100 TB table reads one file instead of
    * planning every file. Always returns false (whole files come
    * back, Spark keeps its own Limit on top); sound only with no
    * pushed filters — a predicate could make a covering prefix come
    * up short. */
  private var limitFiles: Option[Seq[String]] = None
  override def pushLimit(limit: Int): Boolean = {
    if (filterExprs.isEmpty && limit >= 0)
      limitFiles = manifestAggVersion.flatMap { v =>
        val comps = Snapshots.stateComponents(tablePath, v)
        if (comps.exists(_.isLeft)) None // statless component: rows unknown
        else {
          val stated = comps.collect { case Right(x) => x }
          val cum = stated.map(_._2.rows).scanLeft(0L)(_ + _).tail
          val k = cum.indexWhere(_ >= limit) // shortest covering prefix
          // only worth a rebuild if files actually drop
          if (k >= 0 && k + 1 < stated.size) Some(stated.take(k + 1).map(_._1))
          else None
        }
      }
    false
  }

  override def pushAggregation(aggregation: Aggregation): Boolean =
    if (manifestAnswer(aggregation).isDefined) true
    else {
      val accepted = delegate.pushAggregation(aggregation)
      journal += { b => b.pushAggregation(aggregation) == accepted }
      accepted
    }
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    manifestAnswer(aggregation).isDefined ||
      delegate.supportCompletePushDown(aggregation)
  override def pushVariantExtractions(extractions: Array[VariantExtraction]): Array[Boolean] = {
    val answers = delegate.pushVariantExtractions(extractions)
    journal += { b => b.pushVariantExtractions(extractions).sameElements(answers) }
    answers
  }

  override def build(): Scan = {
    // a manifest-answered aggregate needs no data scan at all: one
    // constant row, zero input files, zero tasks over data
    aggAnswer match {
      case Some((schema, values)) => return new GraftManifestAggScan(schema, values)
      case None =>
    }
    // rebuild the scan over the files surviving (static ∪ runtime)
    // filters; None = pruning can't help / replay answers diverged
    val rebuildFn: Option[Seq[Expression] => Option[Scan]] = pruneRebuild.map { r =>
      (extra: Seq[Expression]) =>
        r.prunedFiles(filterExprs.toSeq ++ extra).flatMap { files =>
          if (files.isEmpty) Some(emptyScanLike(delegate.build().readSchema()))
          else {
            val b = r.builderOver(files)
            if (journal.forall(_(b))) Some(b.build()) else None
          }
        }
    }
    // unfiltered LIMIT: rebuild over the covering file prefix (same
    // journal-replay contract as the bounds prune)
    val limited: Option[Scan] = limitFiles.flatMap { files =>
      pruneRebuild.flatMap { r =>
        val b = r.builderOver(files)
        if (journal.forall(_(b))) Some(b.build()) else None
      }
    }
    val statiPruned = limited.orElse(rebuildFn.flatMap(f => f(Seq.empty)))
    new GraftStreamableScan(statiPruned.getOrElse(delegate.build()),
      tablePath, fullSchema, rebuildFn, includeFileRef, layout)
  }

  /** All files of the read set provably excluded by the filters: an
    * empty batch carrying the negotiated pruned read schema. */
  private def emptyScanLike(rs: StructType): Scan = new Scan with Batch {
    override def readSchema(): StructType = rs
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] = Array.empty
    override def createReaderFactory(): PartitionReaderFactory =
      new PartitionReaderFactory {
        override def createReader(p: InputPartition)
            : PartitionReader[org.apache.spark.sql.catalyst.InternalRow] =
          throw new IllegalStateException("fully-pruned scan planned no partitions")
      }
  }
}

private[graft] class GraftStreamableScan(initialInner: Scan, tablePath: String,
                                           fullSchema: StructType,
                                           rebuild: Option[Seq[Expression] => Option[Scan]] = None,
                                           includeFileRef: Boolean = false,
                                           layout: Option[GraftLayout] = None)
  extends Scan with SupportsReportStatistics
    with org.apache.spark.sql.internal.connector.SupportsMetadata
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning {

  // swapped by filter() when runtime predicates prune further —
  // BatchScanExec applies runtime filters before (re)planning input
  // partitions, so the exec always reads the post-filter scan
  @volatile private var inner: Scan = initialInner

  /** Runtime filtering (the Iceberg `SupportsRuntimeV2Filtering`
    * behavior): Spark's dynamic-pruning machinery feeds the join's
    * build-side key set back as IN/EQ predicates; files whose manifest
    * bounds exclude every key drop out before tasks launch. Only
    * columns the bounds algebra can evaluate AND that survived column
    * pruning are advertised — `PartitionPruning.getFilterableTableScan`
    * resolves these against the relation OUTPUT and throws (rather
    * than skipping) on a column the scan no longer reads. */
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    if (rebuild.isEmpty) Array.empty
    else {
      val visible = inner.readSchema().fieldNames.toSet
      fullSchema.fields
        .filter(f => visible.contains(f.name) && FileStats.runtimeFilterable(f.dataType))
        .map(f => org.apache.spark.sql.connector.expressions.Expressions.column(f.name))
    }

  override def filter(predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    val exprs = predicates.toSeq.flatMap(FileStats.fromV2Predicate(_, fullSchema))
    if (exprs.nonEmpty)
      rebuild.foreach { f => f(exprs).foreach { s => inner = s } }
  }

  /** Files the CURRENT inner scan reads (post static+runtime pruning);
    * empty for a fully-pruned scan. Test/observability seam. */
  private[graft] def scannedFileList: Seq[String] = inner match {
    case fs: org.apache.spark.sql.execution.datasources.v2.FileScan =>
      fs.fileIndex.inputFiles.toSeq
    case _ => Seq.empty
  }

  override def readSchema(): StructType =
    if (includeFileRef)
      inner.readSchema().add(GraftGroupColumn.name(),
        org.apache.spark.sql.types.StringType, nullable = false)
    else inner.readSchema()

  /** The layout report, pinned at first consultation (the planner
    * reads `outputPartitioning` once; `toBatch` must honor the SAME
    * decision even after a runtime-filter swap — a narrowed file set
    * is a subset of an aligned one, so regrouping stays valid). Only a
    * fully layout-aligned, non-empty, file-backed scan reports; a CoW
    * rewrite that broke alignment (or the file-ref metadata column,
    * which needs per-file partitions of its own) degrades to unknown
    * partitioning — never to a wrong plan. Bucket layouts report all
    * n buckets (empties included); days layouts report the observed
    * day set (both sides of one date domain expose the same days). */
  private lazy val alignedKeys: Option[Seq[Int]] = layout.flatMap { spec =>
    if (includeFileRef) None
    else {
      val fs = scannedFileList
      val keys = fs.map(f => GraftBucketed.keyOf(spec.partCol, f))
      if (fs.isEmpty || keys.exists(_.isEmpty)) None
      else spec match {
        case GraftLayout.Bucket(n, _) => Some(0 until n)
        case _ => Some(keys.flatten.distinct.sorted)
      }
    }
  }

  override def outputPartitioning(): org.apache.spark.sql.connector.read.partitioning.Partitioning =
    alignedKeys match {
      case Some(keys) =>
        val transform = layout.get match {
          case GraftLayout.Bucket(n, c) =>
            org.apache.spark.sql.connector.expressions.Expressions.bucket(n, c)
          case GraftLayout.Days(c, _) =>
            org.apache.spark.sql.connector.expressions.Expressions.days(c)
        }
        new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
          Array(transform), keys.size)
      case None =>
        new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(0)
    }

  override def toBatch: Batch = {
    val base = inner.toBatch
    alignedKeys match {
      case Some(keys) =>
        GraftBucketed.group(base, layout.get.partCol, keys).getOrElse(base)
      case None => if (includeFileRef) GraftFileTag.tag(base) else base
    }
  }

  override def description(): String = inner.description()

  /** Size from the delegate (file bytes), row count from the
    * manifests when the scan is unpruned — an EXACT cardinality
    * (vs parquet's size-only guess) that Catalyst's join sizing and
    * AQE read for free. Pruned scans keep the delegate's estimate:
    * the manifest total would overcount. */
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics = {
    val base = inner match {
      case s: SupportsReportStatistics => Some(s.estimateStatistics())
      case _ => None
    }
    val manifestRows: Option[Long] =
      if (rebuild.isEmpty) None // builder without a prune seam: no version pin
      else scala.util.Try {
        val vs = Snapshots.versions(tablePath)
        if (vs.isEmpty) None
        else {
          val comps = Snapshots.stateComponents(tablePath, vs.last)
          val stated = comps.collect { case Right(x) => x }
          // exact only when every component has stats AND the scan
          // reads exactly that file set (root-relative comparison —
          // a pruned or staler scan keeps the delegate's estimate)
          val scanRefs = scannedFileList.map(GraftFileTag.ref).toSet
          if (stated.size == comps.size &&
            stated.map(p => Snapshots.rootRel(tablePath, p._1)).toSet == scanRefs)
            Some(stated.map(_._2.rows).sum)
          else None
        }
      }.toOption.flatten
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes() =
        base.map(_.sizeInBytes()).getOrElse(java.util.OptionalLong.empty())
      override def numRows() = manifestRows match {
        case Some(r) => java.util.OptionalLong.of(r)
        case None =>
          base.map(_.numRows()).getOrElse(java.util.OptionalLong.empty())
      }
    }
  }

  override def getMetaData(): Map[String, String] = inner match {
    case m: org.apache.spark.sql.internal.connector.SupportsMetadata => m.getMetaData()
    case _ => Map.empty
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SnapshotMicroBatchStream(tablePath, fullSchema, inner.readSchema())
}
