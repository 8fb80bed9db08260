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

/** EQUALITY delete files — the second Iceberg format-version-2 delete
  * flavor (the reference declares `format-version = 2`,
  * `/root/reference/spark/jobs/bronze_ingestion.py:117`; equality
  * deletes are what Flink-style streaming upsert ingest writes):
  * a keyed retraction is a tiny parquet of KEY VALUES, not positions —
  * the writer never reads a data file (no position scan at all), so a
  * CDC upsert delivery against a 100 TB table commits O(batch) blind
  * writes. Readers merge by key: an equality delete at commit bound B
  * removes every matching-key row from files of ORIGIN VERSION ≤ B —
  * later appends (origin > B) are immune, which is exactly what makes
  * upsert semantics composable: each delivery retracts its keys from
  * the PAST and appends its own rows above the bound.
  *
  * Shape here: [[Snapshots.upsertBatch]] commits one fast-append
  * snapshot whose manifest carries an `eqdeletes` entry
  * `{dir, cols, bound}` naming the key sidecar under the version's
  * hidden `v=N/_eqdeletes/` directory; entries accumulate down the
  * append chain and die at any full-state write (compaction
  * materializes). Scan-side merge loads the key sets driver-side
  * (small by the same policy as positional sidecars) and filters rows
  * per file by origin-version applicability; the DataFrame-level
  * merge is one broadcast anti-join with the bound as a join
  * condition. Manifest `row_count` stays PHYSICAL while entries live
  * (matches are unknown without scanning), so the manifest-answered
  * COUNT(*) and limit planning refuse — min/max FILE PRUNING stays on
  * (bounds over-approximate live rows). Row-level DML, rename, MoR
  * positional deletes and streaming reads refuse while equality
  * deletes live (and the upsert writer refuses their live states) —
  * the two delete flavors and the era machinery each compose with
  * APPENDS, and `compact()` clears any of them. */
object EqDeletes {

  /** One equality-delete entry: sidecar dir (table-root-relative),
    * the key columns, the origin-version bound it applies to, and the
    * sidecar's key-tuple count (`rows`; -1 for entries committed
    * before the count rode the manifest — [[entryRows]] recovers it
    * from the sidecar footers). */
  final case class EqDelete(dir: String, cols: Seq[String], bound: Long,
                            rows: Long = -1L)

  private val mapper = new ObjectMapper()

  /** The `"eqdeletes":[...]` manifest fragment. */
  def toJson(dels: Seq[EqDelete]): String = {
    val arr = mapper.createArrayNode()
    dels.foreach { d =>
      val o = arr.addObject()
      o.put("dir", d.dir)
      o.put("bound", d.bound)
      if (d.rows >= 0) o.put("rows", d.rows)
      val cs = o.putArray("cols")
      d.cols.foreach(cs.add)
      ()
    }
    mapper.writeValueAsString(arr)
  }

  def fromManifest(manifestText: String): Seq[EqDelete] =
    try {
      val root = mapper.readTree(manifestText)
      Option(root.get("eqdeletes")).collect { case arr: ArrayNode =>
        arr.elements().asScala.map { e =>
          EqDelete(e.get("dir").asText(),
            Option(e.get("cols")).collect { case cs: ArrayNode =>
              cs.elements().asScala.map(_.asText()).toSeq
            }.getOrElse(Seq.empty),
            e.get("bound").asLong(),
            Option(e.get("rows")).map(_.asLong()).getOrElse(-1L))
        }.toSeq
      }.getOrElse(Seq.empty)
    } catch { case NonFatal(_) => Seq.empty }

  /** An entry's key-tuple count: the manifest-recorded value when it
    * rode the commit, else KB footer arithmetic over the sidecar
    * (driver-side metadata read — no data scan, no Spark job). */
  def entryRows(table: String, entry: EqDelete): Long =
    if (entry.rows >= 0) entry.rows
    else FileStats.footerRowCount(java.nio.file.Paths.get(s"$table/${entry.dir}"))
      .getOrElse(throw new IllegalStateException(
        s"cannot count keys of equality-delete sidecar $table/${entry.dir} " +
          "(missing or corrupt parquet footer) — the volume guard would silently " +
          "under-count; the entry is unreadable by the merge scan too, so run " +
          "Snapshots.compact() only after restoring the sidecar, or restore from " +
          "a snapshot that predates it"))

  /** Key types equality deletes accept: types whose Spark internal
    * values have well-defined equality/hashing (floats would make
    * retraction a bitwise footgun). */
  def supportedKeyType(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType | BooleanType |
           StringType | DateType | TimestampType => true
      case _ => false
    }
  }

  /** Key tuples of one sidecar, loaded driver-side as INTERNAL values
    * (UTF8String for strings, days-int for dates, micros for
    * timestamps) — the representation the scan reader compares
    * against. NULL-bearing key rows are dropped: SQL equality never
    * matches NULL, so they could retract nothing. Cached per commit
    * identity like the positional cache. */
  def keySet(spark: SparkSession, table: String, entry: EqDelete,
             stateKey: String): Set[Seq[Any]] = {
    val key = s"$stateKey|${entry.dir}"
    val cached = keyCache.synchronized(Option(keyCache.get(key)))
    cached.getOrElse {
      val df = spark.read.parquet(s"$table/${entry.dir}")
        .select(entry.cols.map(org.apache.spark.sql.functions.col): _*)
        .na.drop("any")
      val types = df.schema.fields.map(_.dataType)
      val loaded: Set[Seq[Any]] = df.queryExecution.toRdd.map(
        r => r.copy()).collect()
        .map(r => types.indices.map(i => r.get(i, types(i))).toSeq: Seq[Any]).toSet
      keyCache.synchronized {
        Option(keyCache.get(key)).getOrElse {
          keyCache.put(key, loaded)
          val it = keyCache.entrySet().iterator()
          while (keyCache.size() > 64 && it.hasNext) { it.next(); it.remove() }
          loaded
        }
      }
    }
  }

  private val keyCache =
    new java.util.LinkedHashMap[String, Set[Seq[Any]]](16, 0.75f, true)
}

/** Scan builder for a snapshot with live equality deletes — and,
  * COMPOSED, any live positional sidecars (`skips`, the Iceberg
  * format-v2 single-scan merge of both delete file kinds): files with
  * no applicable entry and no recorded positions (origin above every
  * bound — the post-upsert appends) keep the stock pushdown path;
  * affected files read WHOLE, unpruned, with recorded positions
  * skipped, matching-key rows dropped, and the requested columns
  * projected out. All filters report post-scan; manifest bounds still
  * prune files (sound over-approximations under both flavors). */
private[sources] class GraftEqScanBuilder(
    table: GraftSnapshotTable,
    files: Seq[String], // full read set, paths
    entries: Seq[EqDeletes.EqDelete], // sorted by bound ascending
    suffixKeys: Array[Set[Seq[Any]]], // suffixKeys(i) = keys of entries(i..)
    options: CaseInsensitiveStringMap,
    unifiedSchema: StructType,
    stats: Map[String, FileStats.FileStat],
    tablePath: String,
    skips: Map[String, Array[Long]] = Map.empty) // positional, by ref
  extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
    with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters {

  private var dataOnly: StructType = unifiedSchema
  private var includeFileRef = false
  private var filterExprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression] = Seq.empty

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // the file-ref column IS served (row-level DML's runtime group
    // filtering reads it through the plain scan path — composition
    // needs it); the position column is not a plain-read surface
    require(!requiredSchema.fieldNames.contains(GraftPosColumn.name()),
      s"${GraftPosColumn.name()} is served only on row-level DML scans — " +
        "use _metadata.row_index for plain reads")
    includeFileRef = requiredSchema.fieldNames.contains(GraftGroupColumn.name())
    dataOnly = StructType(
      requiredSchema.fields.filterNot(_.name == GraftGroupColumn.name()))
  }

  override def pushFilters(filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = {
    filterExprs = filters
    filters // post-scan: Spark re-evaluates above the merge
  }

  override def pushedFilters: Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    Array.empty

  /** First applicable entry index for a file (entries sorted by bound
    * ascending): the suffix from the first bound ≥ origin; -1 = none
    * (clean file). */
  private def suffixOf(path: String): Int = {
    val origin = RenameEras.fileVersionOf(Snapshots.rootRel(tablePath, path))
    val i = entries.indexWhere(_.bound >= origin)
    i
  }

  override def build(): Scan = {
    val boundsKept = files.filter(f =>
      stats.get(f).forall(st => FileStats.mayMatch(st, filterExprs)))
    // bloom layer: point lookups on bloom-opted columns drop files
    // whose bloom proves the value absent (rows of a skipped file
    // would all be filtered above the equality merge — sound)
    val absent = BloomSkip.provablyAbsent(tablePath, boundsKept, filterExprs)
    val kept = boundsKept.filterNot(absent.contains)
    val (affected, clean) = kept.partition(f =>
      suffixOf(f) >= 0 || skips.contains(GraftFileTag.ref(f)))
    val cleanScan =
      if (clean.isEmpty) None
      else {
        val b = table.builderOverFilesAs(clean, options, unifiedSchema)
        b match {
          case p: org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns =>
            p.pruneColumns(dataOnly)
          case _ =>
        }
        b match {
          case f: org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters =>
            f.pushFilters(filterExprs); ()
          case _ =>
        }
        Some(b.build())
      }
    // affected files read the FULL unified schema (the key columns
    // must be present to evaluate membership) with NO pushed filters;
    // the reader projects the requested columns back out
    val affectedScan =
      if (affected.isEmpty) None
      else Some(table.builderOverFilesAs(affected, options, unifiedSchema).build())
    new GraftEqScan(cleanScan, affectedScan,
      affected.map(f => GraftFileTag.ref(f) -> suffixOf(f)).toMap,
      suffixKeys,
      keyIdx = entries.headOption.map(_.cols.map(unifiedSchema.fieldIndex).toArray)
        .getOrElse(Array.empty),
      projIdx = dataOnly.fieldNames.map(unifiedSchema.fieldIndex),
      output = dataOnly, tablePath, skips, includeFileRef)
  }
}

/** The composed merge scan: clean partitions pass through; each
  * affected file reads whole (full schema) in physical row order,
  * skips its recorded delete positions, drops rows whose key tuple is
  * in its applicable suffix key set, and projects the requested
  * columns. The two per-row predicates are independent (a row dies if
  * EITHER flavor kills it); positions are counted over PHYSICAL rows,
  * before the key check, so sidecar coordinates stay exact. */
private[sources] class GraftEqScan(clean: Option[Scan], affectedScan: Option[Scan],
                                   suffixByRef: Map[String, Int],
                                   suffixKeys: Array[Set[Seq[Any]]],
                                   keyIdx: Array[Int],
                                   projIdx: Array[Int],
                                   output: StructType,
                                   tablePath: String,
                                   skips: Map[String, Array[Long]] = Map.empty,
                                   includeFileRef: Boolean = false)
  extends Scan with Batch {

  override def readSchema(): StructType =
    if (includeFileRef)
      output.add(GraftGroupColumn.name(),
        org.apache.spark.sql.types.StringType, nullable = false)
    else output
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-eq-merge(clean=${clean.map(_.description()).getOrElse("none")})"

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    throw new UnsupportedOperationException(
      s"streaming read of $tablePath: live equality-delete files cannot replay " +
        "as deltas — run Snapshots.compact() to materialize them first, or " +
        "stream row-level CHANGES via readStream.table(\"<table>.changes\") " +
        "(changelog-enabled tables)")

  import GraftEqScan.{CleanPart, CleanTagPart, EqPart}

  private lazy val cleanBatch = clean.map(_.toBatch)
  private lazy val affectedBatch = affectedScan.map(_.toBatch)

  override def planInputPartitions(): Array[InputPartition] = {
    // clean files pass through untouched unless the plan asked for
    // the file-ref column — then they too regroup per file for tagging
    val cleanParts: Array[InputPartition] =
      if (includeFileRef)
        MorDeletes.wholeFileGroups(
          cleanBatch.map(_.planInputPartitions()).getOrElse(Array.empty))
          .map { case (ref, fp) => CleanTagPart(fp, ref): InputPartition }
      else
        cleanBatch.map(_.planInputPartitions().map(CleanPart(_): InputPartition))
          .getOrElse(Array.empty)
    // per-file partitions so each carries its applicability suffix
    // and its position-skip set; whole-file grouping (pieces tiling
    // the file in offset order) is what makes the reader's row
    // counter the physical position space
    val eqParts: Array[InputPartition] = MorDeletes.wholeFileGroups(
      affectedBatch.map(_.planInputPartitions()).getOrElse(Array.empty))
      .map { case (ref, fp) =>
        EqPart(fp, suffixByRef(ref),
          skips.getOrElse(ref, Array.empty), ref): InputPartition
      }
    cleanParts ++ eqParts
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val cf = cleanBatch.map(_.createReaderFactory())
    val af = affectedBatch.map(_.createReaderFactory())
    val keys = suffixKeys
    val ki = keyIdx
    val pi = projIdx
    val types = output.fields.map(_.dataType)
    val withRef = includeFileRef
    new PartitionReaderFactory {
      override def supportColumnarReads(p: InputPartition): Boolean = false
      private def tagged(r: PartitionReader[InternalRow], ref: String)
          : PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
          private val tag = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString(ref)))
          override def next(): Boolean = r.next()
          override def get(): InternalRow = joined(r.get(), tag)
          override def close(): Unit = r.close()
        }
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = p match {
        case CleanPart(inner) => cf.get.createReader(inner)
        case CleanTagPart(fp, ref) => tagged(cf.get.createReader(fp), ref)
        case EqPart(fp, suffix, skip, ref) =>
          val r = af.get.createReader(fp)
          // suffix -1: the file has recorded positions but sits above
          // every equality bound — position-skip only
          val keySet = if (suffix >= 0) keys(suffix) else null
          val merged = new PartitionReader[InternalRow] {
            private val out =
              new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(pi.length)
            private var current: InternalRow = _
            private var pos = -1L
            private var si = 0
            override def next(): Boolean = {
              while (r.next()) {
                pos += 1
                if (si < skip.length && skip(si) == pos) si += 1
                else {
                  val row = r.get()
                  val key = if (keySet == null) null
                    else GraftEqScan.keyOf(row, ki, keySet.headOption)
                  if (key == null || !keySet.contains(key)) { current = row; return true }
                }
              }
              false
            }
            override def get(): InternalRow = {
              var i = 0
              while (i < pi.length) {
                out.update(i, if (current.isNullAt(pi(i))) null
                  else current.get(pi(i), types(i)))
                i += 1
              }
              out
            }
            override def close(): Unit = r.close()
          }
          if (withRef) tagged(merged, ref) else merged
        case other => throw new IllegalStateException(
          s"eq factory got unknown partition ${other.getClass.getName}")
      }
    }
  }
}

private[graft] object GraftEqScan {
  final case class CleanPart(inner: InputPartition) extends InputPartition {
    override def preferredLocations(): Array[String] = inner.preferredLocations()
  }
  final case class EqPart(
      inner: org.apache.spark.sql.execution.datasources.FilePartition,
      suffix: Int, skip: Array[Long] = Array.empty,
      ref: String = "") extends InputPartition {
    override def preferredLocations(): Array[String] = inner.preferredLocations()
  }

  /** One whole clean file regrouped for file-ref tagging. */
  final case class CleanTagPart(
      inner: org.apache.spark.sql.execution.datasources.FilePartition,
      ref: String) extends InputPartition {
    override def preferredLocations(): Array[String] = inner.preferredLocations()
  }

  /** Key tuple of a row in internal values, null when any key column
    * is NULL (equality never matches NULL — the row survives). The
    * sample tuple supplies the per-position runtime classes the
    * untyped getters need. */
  private[sources] def keyOf(row: InternalRow, idx: Array[Int],
                             sample: Option[Seq[Any]]): Seq[Any] = {
    val s = sample.getOrElse(return null)
    val b = new Array[Any](idx.length)
    var i = 0
    while (i < idx.length) {
      if (row.isNullAt(idx(i))) return null
      b(i) = s(i) match {
        case _: java.lang.Long => row.getLong(idx(i))
        case _: java.lang.Integer => row.getInt(idx(i))
        case _: java.lang.Short => row.getShort(idx(i))
        case _: java.lang.Byte => row.getByte(idx(i))
        case _: java.lang.Boolean => row.getBoolean(idx(i))
        case _: org.apache.spark.unsafe.types.UTF8String => row.getUTF8String(idx(i))
        case other => throw new IllegalStateException(
          s"unsupported equality-delete key class ${other.getClass.getName}")
      }
      i += 1
    }
    b.toSeq
  }
}
