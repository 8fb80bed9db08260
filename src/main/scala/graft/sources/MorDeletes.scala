package graft.sources

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ArrayNode
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Merge-on-read POSITIONAL DELETE files over the versioned-parquet
  * store — the Iceberg format-version-2 capability the reference
  * declares (`/root/reference/spark/jobs/bronze_ingestion.py:117`
  * sets `format-version = 2`, whose hallmark is delete files merged
  * at read time), re-expressed without Iceberg jars.
  *
  * Shape: a `DELETE` in merge-on-read mode
  * (`spark.graft.delete.mode = merge-on-read`) never rewrites a
  * straddled data file. It runs one read-only job over the affected
  * files to find the POSITIONS of matching rows
  * (`_metadata.row_index` — Spark's parquet reader produces the true
  * in-file row index even under row-group skipping), writes them as a
  * tiny `(file, pos)` parquet sidecar under the new version's hidden
  * `v=N/_deletes/` directory, and commits a manifest that carries
  * EVERY data file by reference plus a `deletes` entry naming the
  * sidecar and its target files. Readers merge: a data file with
  * recorded positions is read whole (no parquet-side filter pushdown,
  * so physical row order is exact) and its deleted positions are
  * skipped row-by-row; untouched files keep the stock vectorized
  * pushdown path. `compact()` materializes (reads merge, writes a
  * clean full-state snapshot, the sidecars age out with retention).
  *
  * Why it matters at 100 TB: a GDPR point-delete under copy-on-write
  * rewrites the whole 512 MB file that holds the row; under
  * merge-on-read it writes a KB sidecar. The read-time cost is
  * confined to the affected files (vectorization and file skipping
  * survive everywhere else) and is bounded by compaction cadence —
  * exactly Iceberg's v2 amortization.
  *
  * Policy: merge-on-read is for SMALL deletes (the sidecar rides into
  * scan planning driver-side); a delete expected to touch a large row
  * fraction should run in the default copy-on-write mode, which
  * already file-prunes. Carried stats of affected files stay sound:
  * deletes only remove rows, so manifest [min,max]/row bounds remain
  * valid OVER-approximations — `mayMatch`/`mustMatch` pruning keeps
  * working, while exact-count surfaces (manifest-answered aggregates,
  * limit-aware planning, exact scan statistics) are disabled until
  * compaction by construction (the merge scan simply does not
  * implement them). */
object MorDeletes {

  /** One target data file of a sidecar: root-relative ref + how many
    * positions the sidecar holds for it (the row-count arithmetic
    * behind live `row_count` in manifests). */
  final case class Target(f: String, r: Long)

  /** One delete sidecar: the hidden directory holding its `(file,
    * pos)` parquet plus its targets. `dir` is table-root-relative
    * (`v=N/_deletes`). */
  final case class DeleteFile(dir: String, targets: Seq[Target])

  private val mapper = new ObjectMapper()

  /** The `"deletes":[...]` manifest fragment (valid JSON array text). */
  def toJson(dels: Seq[DeleteFile]): String = {
    val arr = mapper.createArrayNode()
    dels.foreach { d =>
      val o = arr.addObject()
      o.put("dir", d.dir)
      val ts = o.putArray("targets")
      d.targets.foreach { t =>
        val to = ts.addObject(); to.put("f", t.f); to.put("r", t.r); ()
      }
    }
    mapper.writeValueAsString(arr)
  }

  /** Live delete sidecars recorded in a manifest (empty when the
    * field is absent — every pre-MoR manifest). */
  def fromManifest(manifestText: String): Seq[DeleteFile] =
    try {
      val root = mapper.readTree(manifestText)
      Option(root.get("deletes")).collect { case arr: ArrayNode =>
        arr.elements().asScala.map { e =>
          DeleteFile(e.get("dir").asText(),
            Option(e.get("targets")).collect { case ts: ArrayNode =>
              ts.elements().asScala.map(t =>
                Target(t.get("f").asText(), t.get("r").asLong())).toSeq
            }.getOrElse(Seq.empty))
        }.toSeq
      }.getOrElse(Seq.empty)
    } catch { case NonFatal(_) => Seq.empty }

  /** Entries surviving a new commit: each entry's targets restricted
    * to refs still in the live state (a dropped or rewritten file
    * takes its recorded positions with it); entries with no surviving
    * target disappear. */
  def retarget(prior: Seq[DeleteFile], liveRefs: Set[String]): Seq[DeleteFile] =
    prior.flatMap { d =>
      val kept = d.targets.filter(t => liveRefs.contains(t.f))
      if (kept.isEmpty) None else Some(d.copy(targets = kept))
    }

  /** Total recorded delete positions across entries (the live
    * `row_count` subtrahend). */
  def deletedRows(dels: Seq[DeleteFile]): Long =
    dels.iterator.flatMap(_.targets).map(_.r).sum

  /** Refs of every data file any entry targets. */
  def targetRefs(dels: Seq[DeleteFile]): Set[String] =
    dels.iterator.flatMap(_.targets).map(_.f).toSet

  // ---- sidecar IO ---------------------------------------------------

  /** Positions-to-skip per target ref, loaded from the sidecar parquet
    * files and cached (version directories are immutable, so a
    * sidecar's content never changes). Sidecars are KB–MB by policy —
    * the one deliberately driver-sized piece of the merge path; the
    * DataFrame-level merge ([[Snapshots.applyDeletes]]) stays fully
    * distributed. Arrays are sorted ascending and de-duplicated.
    *
    * `stateKey` is the manifest-recorded commit identity
    * ([[Snapshots.deleteStateKey]]) — ZERO filesystem round-trips per
    * read (on an object store, no listing RPC), and a dropped-and-
    * recreated table can never hit the old table's entry (fresh
    * uuid). Pre-uuid manifests (empty key) fall back to a sidecar
    * file-listing fingerprint. The cache is a bounded LRU
    * (`spark.graft.mor.positionCacheSize`, default 64 states) so a
    * long-lived session iterating DML across many tables cannot
    * accumulate forever, and loads run OUTSIDE the map lock — a slow
    * Spark job warming one entry never blocks readers of others. */
  def positions(spark: SparkSession, table: String,
                dels: Seq[DeleteFile], stateKey: String = ""): Map[String, Array[Long]] = {
    if (dels.isEmpty) return Map.empty
    val key = if (stateKey.nonEmpty) stateKey else {
      // pre-uuid fallback: fingerprint the sidecar FILE LISTING
      // (names + sizes) so recreated tables can't alias
      table + "|" + dels.map(_.dir).sorted.map { d =>
        val root = java.nio.file.Paths.get(s"$table/$d")
        val listing =
          if (!java.nio.file.Files.isDirectory(root)) ""
          else scala.util.Using.resource(java.nio.file.Files.walk(root)) { w =>
            w.iterator().asScala
              .filter(p => java.nio.file.Files.isRegularFile(p) &&
                p.getFileName.toString.endsWith(".parquet"))
              .map(p => s"${root.relativize(p)}:${java.nio.file.Files.size(p)}")
              .toVector.sorted.mkString(",")
          }
        s"$d[$listing]"
      }.mkString(";")
    }
    val cached = positionCache.synchronized(Option(positionCache.get(key)))
    cached.getOrElse {
      maxCacheEntries = spark.conf.get(
        "spark.graft.mor.positionCacheSize", "64").toInt
      sidecarLoads.incrementAndGet()
      val rows = spark.read.schema(SidecarSchema)
        .parquet(dels.map(d => s"$table/${d.dir}"): _*)
        .select("file", "pos").collect()
      val loaded = rows.groupBy(_.getString(0))
        .map { case (f, rs) => f -> rs.map(_.getLong(1)).distinct.sorted }
      positionCache.synchronized {
        Option(positionCache.get(key)).getOrElse {
          positionCache.put(key, loaded)
          // trim to the cap (access order: eldest = least recently used);
          // a lowered cap takes effect on the next insert
          val it = positionCache.entrySet().iterator()
          while (positionCache.size() > maxCacheEntries && it.hasNext) {
            it.next(); it.remove()
          }
          loaded
        }
      }
    }
  }

  @volatile private var maxCacheEntries = 64

  /** Cache misses that ran a sidecar-load job — spec instrumentation
    * (one load per delete state, not per read). */
  private[graft] val sidecarLoads = new java.util.concurrent.atomic.AtomicLong(0)

  /** Current cache entry count — spec instrumentation for the bound. */
  private[graft] def cachedStates: Int =
    positionCache.synchronized(positionCache.size())

  /** Access-ordered LRU, trimmed past [[maxCacheEntries]] at insert;
    * guarded by its own monitor (all access sites synchronize on the
    * map). */
  private val positionCache =
    new java.util.LinkedHashMap[String, Map[String, Array[Long]]](16, 0.75f, true)

  /** The sidecar's fixed schema: target data file ref + in-file row
    * position. Always read with it specified — a sidecar written from
    * an EMPTY deletion set may hold zero part files, where schema
    * inference would error instead of answering "no targets". */
  private[sources] val SidecarSchema =
    StructType.fromDDL("file STRING, pos BIGINT")

  /** Per-target position counts of a just-written sidecar directory,
    * read back from the sidecar itself (single source of truth — the
    * manifest can never disagree with the parquet). */
  def sidecarTargets(spark: SparkSession, table: String, dir: String): Seq[Target] =
    spark.read.schema(SidecarSchema).parquet(s"$table/$dir")
      .groupBy("file").count().collect()
      .map(r => Target(r.getString(0), r.getLong(1)))
      .sortBy(_.f).toSeq

  /** Regroup a file-based batch's (possibly split) pieces into exactly
    * one `FilePartition` per data file, pieces in offset order and
    * proven to tile the file — the precondition for position-exact
    * row counting. Throws on non-file partitions or gaps (a silent
    * gap would shift every later position). */
  private[sources] def wholeFileGroups(parts: Array[InputPartition])
      : Array[(String, org.apache.spark.sql.execution.datasources.FilePartition)] = {
    val pieces = parts.flatMap {
      case fp: org.apache.spark.sql.execution.datasources.FilePartition => fp.files
      case other => throw new IllegalStateException(
        s"position-exact reads need file partitions, got ${other.getClass.getName}")
    }
    pieces.groupBy(_.filePath.toString).toArray.sortBy(_._1).zipWithIndex
      .map { case ((path, ps), i) =>
        val sorted = ps.sortBy(_.start)
        val tiled = sorted.length == 1 ||
          sorted.tail.map(_.start).zip(
            sorted.init.map(p => p.start + p.length)).forall { case (s, e) => s == e }
        require(tiled && sorted.head.start == 0L &&
          sorted.map(_.length).sum == sorted.head.fileSize,
          s"file $path split pieces do not tile the file")
        (GraftFileTag.ref(path),
          org.apache.spark.sql.execution.datasources.FilePartition(i, sorted))
      }
  }

  /** A filterless, ungrouped `COUNT(*)` over a delete-bearing snapshot
    * is still manifest-answerable: the live `row_count` is exact
    * arithmetic (physical rows minus recorded positions). Anything
    * else bails to the merge scan. */
  private[sources] def countStarAnswer(liveRows: Long,
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[(StructType, Array[Any])] = {
    import org.apache.spark.sql.connector.expressions.aggregate.CountStar
    import org.apache.spark.sql.types.{LongType, StructField}
    if (agg.groupByExpressions().nonEmpty) return None
    val answered = agg.aggregateExpressions().map {
      case _: CountStar =>
        (StructField("count(*)", LongType, nullable = false),
          java.lang.Long.valueOf(liveRows): Any)
      case _ => return None
    }
    Some((StructType(answered.map(_._1)), answered.map(_._2)))
  }
}

/** Scan builder for a snapshot with live merge-on-read deletes: clean
  * files keep the stock parquet pushdown path (columns AND filters —
  * row-group skipping intact); affected files get a column-pruned,
  * FILTER-FREE scan so their physical row order is exact for position
  * skipping. All filters report as post-scan, so Spark keeps the
  * predicate in the plan and both halves stay row-exact.
  *
  * Manifest planner surfaces that stay LIVE under sidecars (recovered
  * in r15 — refusal was sound but stronger than necessary):
  *   - a filterless `COUNT(*)` answers from the manifest's live
  *     `row_count` (exact arithmetic: physical rows − positions);
  *   - min/max FILE PRUNING: carried bounds are OVER-approximations
  *     of the live rows (deletes only remove rows), so a file whose
  *     bounds cannot satisfy the filters is safely dropped — a date
  *     probe over a delete-bearing table still scans only its band;
  *   - LIMIT-aware planning: live rows per file =
  *     `stat.rows − |positions|` is manifest arithmetic, so a LIMIT
  *     plans the shortest covering file prefix.
  * Exact ANSWERING surfaces (min/max aggregate pushdown, exact scan
  * statistics) and bucket grouping stay refused — a deleted row could
  * hold the extremum; compaction restores them. */
private[sources] class GraftMorScanBuilder(
    table: GraftSnapshotTable,
    cleanFiles: Seq[String],
    affected: Seq[(String, Array[Long])],
    options: CaseInsensitiveStringMap,
    liveRows: Long,
    unifiedSchema: StructType,
    stats: Map[String, FileStats.FileStat] = Map.empty)
  extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
    with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit {

  // a filterless COUNT(*) is exact from the live row_count even with
  // sidecars live — `SELECT count(*)` stays a KB metadata read
  private var sawFilters = false
  private var filterExprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression] = Seq.empty
  private var aggAnswer: Option[(StructType, Array[Any])] = None
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    !sawFilters && MorDeletes.countStarAnswer(liveRows, agg).isDefined
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    if (sawFilters) false
    else {
      aggAnswer = MorDeletes.countStarAnswer(liveRows, agg)
      aggAnswer.isDefined
    }
  }

  /** Live (post-delete) rows of a data file — manifest arithmetic. */
  private def liveRowsOf(path: String, st: FileStats.FileStat): Long =
    st.rows - affected.collectFirst { case (p, s) if p == path => s.length.toLong }
      .getOrElse(0L)

  // LIMIT planning on live-row arithmetic: only without filters (a
  // filtered limit cannot bound rows per file), only when EVERY file
  // has stats, and only if files actually drop. Spark keeps the
  // limit operator (we return false), so over-planning is just waste,
  // never wrong — and the prefix covers the limit by construction.
  private var limitPrefix: Option[Set[String]] = None
  override def pushLimit(limit: Int): Boolean = {
    val all = cleanFiles ++ affected.map(_._1)
    if (!sawFilters && limit >= 0 && all.forall(stats.contains)) {
      val cum = all.map(p => liveRowsOf(p, stats(p))).scanLeft(0L)(_ + _).tail
      val k = cum.indexWhere(_ >= limit)
      if (k >= 0 && k + 1 < all.size)
        limitPrefix = Some(all.take(k + 1).toSet)
    }
    false
  }

  // the file-ref metadata column (`_graft_file`) is served by this
  // wrapper's per-file tagging, never by the parquet delegates — the
  // row-level runtime group filtering subquery reads it through the
  // PLAIN scan path, so the merge scan must serve it too
  private var includeFileRef = false
  private var dataOnlySchema: Option[StructType] = None

  override def pruneColumns(requiredSchema: StructType): Unit = {
    require(!requiredSchema.fieldNames.contains(GraftPosColumn.name()),
      s"${GraftPosColumn.name()} is served only on row-level DML scans — " +
        "use _metadata.row_index for plain reads")
    includeFileRef = requiredSchema.fieldNames.contains(GraftGroupColumn.name())
    dataOnlySchema = Some(StructType(
      requiredSchema.fields.filterNot(_.name == GraftGroupColumn.name())))
  }

  override def pushFilters(filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = {
    if (filters.nonEmpty) sawFilters = true
    filterExprs = filters
    filters // everything stays post-scan: Spark re-evaluates above the merge
  }

  override def pushedFilters: Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    Array.empty

  /** A file survives planning iff its carried bounds MAY satisfy the
    * filters (missing stats keep the file — sound) and it is inside
    * any limit prefix. */
  private def keep(path: String): Boolean =
    stats.get(path).forall(st => FileStats.mayMatch(st, filterExprs)) &&
      limitPrefix.forall(_.contains(path))

  /** Builders are constructed at BUILD time, over only the surviving
    * files, with the negotiated pruning/pushdown replayed: columns to
    * both halves, filters to the clean half only (affected files MUST
    * NOT row-group-skip — their reader's row sequence is the position
    * space). */
  override def build(): Scan = aggAnswer match {
    case Some((schema, values)) => new GraftManifestAggScan(schema, values)
    case None =>
      val boundsClean = cleanFiles.filter(keep)
      val boundsAffected = affected.filter(t => keep(t._1))
      // bloom layer: point lookups on bloom-opted columns drop files
      // whose bloom proves the value absent — sound for affected files
      // too (their rows would all be filtered above the merge)
      val absent = BloomSkip.provablyAbsent(table.tableRoot,
        boundsClean ++ boundsAffected.map(_._1), filterExprs)
      val cleanKept = boundsClean.filterNot(absent.contains)
      val affectedKept = boundsAffected.filterNot(t => absent.contains(t._1))
      def mk(files: Seq[String], pushFilt: Boolean): Option[Scan] =
        if (files.isEmpty) None
        else {
          val b = table.builderOverFilesAs(files, options, unifiedSchema)
          dataOnlySchema.foreach { s =>
            b match {
              case p: org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns =>
                p.pruneColumns(s)
              case _ =>
            }
          }
          if (pushFilt) b match {
            case f: org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters =>
              f.pushFilters(filterExprs); ()
            case _ =>
          }
          Some(b.build())
        }
      new GraftMorScan(mk(cleanKept, pushFilt = true), mk(affectedKept.map(_._1), pushFilt = false),
        // keyed by root-relative REF — partition planning sees URI paths,
        // not the raw paths this builder was constructed over
        affectedKept.map { case (p, s) => (GraftFileTag.ref(p), s) }.toMap,
        table.tableRoot, includeFileRef,
        fallbackSchema = dataOnlySchema.getOrElse(unifiedSchema))
  }
}

/** The read-time merge scan: clean-file partitions pass through to the
  * stock parquet reader (columnar, pushdown); each affected file plans
  * as ONE partition covering the whole file in offset order, read
  * row-based with its recorded delete positions skipped. */
private[sources] class GraftMorScan(clean: Option[Scan], affectedScan: Option[Scan],
                                    skips: Map[String, Array[Long]],
                                    tablePath: String,
                                    includeFileRef: Boolean = false,
                                    fallbackSchema: StructType = new StructType())
  extends Scan with Batch {

  private def dataSchema: StructType =
    clean.orElse(affectedScan).map(_.readSchema()).getOrElse(fallbackSchema)

  override def readSchema(): StructType =
    if (includeFileRef)
      dataSchema.add(GraftGroupColumn.name(),
        org.apache.spark.sql.types.StringType, nullable = false)
    else dataSchema

  override def toBatch: Batch = this
  override def description(): String =
    s"graft-mor-merge(clean=${clean.map(_.description()).getOrElse("none")})"

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    throw new UnsupportedOperationException(
      s"streaming read of $tablePath: live merge-on-read delete files cannot replay " +
        "as deltas — run Snapshots.compact() to materialize them first")

  import GraftMorScan.{CleanPart, CleanTagPart, MorPart}

  private lazy val cleanBatch = clean.map(_.toBatch)
  private lazy val affectedBatch = affectedScan.map(_.toBatch)

  override def planInputPartitions(): Array[InputPartition] = {
    // clean files pass through untouched unless the plan asked for the
    // file-ref column — then they too regroup per file for tagging
    val cleanParts: Array[InputPartition] =
      if (includeFileRef)
        MorDeletes.wholeFileGroups(
          cleanBatch.map(_.planInputPartitions()).getOrElse(Array.empty))
          .map { case (ref, fp) => CleanTagPart(fp, ref): InputPartition }
      else
        cleanBatch.map(_.planInputPartitions().map(CleanPart(_): InputPartition))
          .getOrElse(Array.empty)
    // regroup the affected scan's (possibly split) file pieces into
    // exactly one partition per file, pieces in offset order — the
    // reader then yields the file's rows in physical order and the
    // row counter IS the file position
    val morParts: Array[InputPartition] = MorDeletes.wholeFileGroups(
      affectedBatch.map(_.planInputPartitions()).getOrElse(Array.empty))
      .map { case (ref, fp) =>
        MorPart(fp, ref, skips.getOrElse(ref, Array.empty)): InputPartition
      }
    cleanParts ++ morParts
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val cf = cleanBatch.map(_.createReaderFactory())
    val af = affectedBatch.map(_.createReaderFactory())
    val withRef = includeFileRef
    new PartitionReaderFactory {
      // BatchScanExec refuses to MIX columnar and row-based partitions
      // in one scan, and the position-skipping reader is row-based by
      // construction — so the whole merge scan reads rows. Clean files
      // still keep pushdown/row-group skipping; full vectorization
      // returns when compaction materializes the sidecars.
      override def supportColumnarReads(p: InputPartition): Boolean = false
      private def skipTag(r: PartitionReader[InternalRow], ref: String,
                          skip: Array[Long]): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
          private val tag = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString(ref)))
          private var pos = -1L
          private var si = 0
          override def next(): Boolean = {
            while (r.next()) {
              pos += 1
              if (si < skip.length && skip(si) == pos) si += 1
              else return true
            }
            false
          }
          override def get(): InternalRow =
            if (withRef) joined(r.get(), tag) else r.get()
          override def close(): Unit = r.close()
        }
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = p match {
        case CleanPart(inner) => cf.get.createReader(inner)
        case CleanTagPart(fp, ref) => skipTag(cf.get.createReader(fp), ref, Array.empty)
        case MorPart(fp, ref, skip) => skipTag(af.get.createReader(fp), ref, skip)
        case other => throw new IllegalStateException(
          s"merge factory got unknown partition ${other.getClass.getName}")
      }
    }
  }
}

private[graft] object GraftMorScan {
  /** A pass-through partition of the clean (no recorded deletes) half
    * — top-level so task serialization never drags the scan along. */
  final case class CleanPart(inner: InputPartition) extends InputPartition {
    override def preferredLocations(): Array[String] = inner.preferredLocations()
  }

  /** One whole clean file regrouped for file-ref tagging. */
  final case class CleanTagPart(
      inner: org.apache.spark.sql.execution.datasources.FilePartition,
      ref: String) extends InputPartition {
    override def preferredLocations(): Array[String] = inner.preferredLocations()
  }

  /** One whole affected file (its split pieces regrouped in offset
    * order) + the sorted positions to skip. */
  final case class MorPart(
      inner: org.apache.spark.sql.execution.datasources.FilePartition,
      ref: String, skip: Array[Long]) extends InputPartition {
    override def preferredLocations(): Array[String] = inner.preferredLocations()
  }
}
