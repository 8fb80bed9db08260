package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The era-split scan behind metadata-only RENAME COLUMN
  * ([[RenameEras]]): the read set groups by each file's
  * `output name → physical name` mapping, one stock parquet scan per
  * era — SAME column order and types, per-era names — and the groups
  * union as disjoint partition sets. Column pruning and filter
  * pushdown translate per era (`AttributeReference.withName`), and
  * manifest-stats file skipping stays live with per-era translated
  * bounds, so a date probe over a rename-spanning table still scans
  * only its band. Filters additionally report post-scan, so Spark
  * re-evaluates above the union and a translation gap can never
  * produce wrong rows.
  *
  * Deliberately absent while eras are live (sound by refusal, same
  * class as the merge-on-read scan): manifest-complete aggregate
  * pushdown, limit-aware planning, streaming reads, bucket grouping,
  * and columnar reads (the union forces row-based uniformity).
  * `compact()` rewrites under current names, which deactivates every
  * era for current reads and restores all of them. */
private[sources] class GraftEraScanBuilder(
    table: GraftSnapshotTable,
    groups: Seq[(Map[String, String], Seq[String])],
    output: StructType,
    stats: Map[String, FileStats.FileStat],
    options: CaseInsensitiveStringMap)
  extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
    with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters {

  private var includeFileRef = false
  private var dataOnly: StructType = output
  private var filterExprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression] = Seq.empty

  override def pruneColumns(requiredSchema: StructType): Unit = {
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
    filters // all post-scan: Spark re-evaluates above the era union
  }

  override def pushedFilters: Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    Array.empty

  override def build(): Scan = {
    val scans = groups.flatMap { case (mapping, files) =>
      val translated = RenameEras.translate(filterExprs, mapping)
      // manifest bounds prune per era with the FILE's own names —
      // missing lookups keep the file (sound)
      val kept = files.filter(f =>
        stats.get(f).forall(st => FileStats.mayMatch(st, translated)))
      if (kept.isEmpty) None
      else {
        val b = table.builderOverFilesAs(kept, options,
          RenameEras.physicalSchema(output, mapping))
        b match {
          case p: org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns =>
            p.pruneColumns(RenameEras.physicalSchema(dataOnly, mapping))
          case _ =>
        }
        b match {
          case f: org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters =>
            f.pushFilters(translated); () // parquet row-group skipping per era
          case _ =>
        }
        Some(b.build())
      }
    }
    new GraftEraScan(scans, dataOnly, includeFileRef, table.tableRoot)
  }
}

/** The union of the per-era scans: row-based (uniform by
  * construction), partitions wrapped with their era index, the
  * file-ref metadata column served by per-file tagging when the plan
  * asks (runtime group filtering reads it through this path). */
private[sources] class GraftEraScan(scans: Seq[Scan], dataOnly: StructType,
                                    includeFileRef: Boolean, tablePath: String)
  extends Scan with Batch {

  override def readSchema(): StructType =
    if (includeFileRef)
      dataOnly.add(GraftGroupColumn.name(),
        org.apache.spark.sql.types.StringType, nullable = false)
    else dataOnly

  override def toBatch: Batch = this
  override def description(): String = s"graft-era-union(${scans.size} eras)"

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    throw new UnsupportedOperationException(
      s"streaming read of $tablePath: live rename eras cannot replay " +
        "(pre-rename files carry old physical names) — run Snapshots.compact() first")

  import GraftEraScan.EraPart

  private lazy val batches: Seq[Batch] = scans.map { s =>
    val b = s.toBatch
    if (includeFileRef) GraftFileTag.tag(b) else b
  }

  override def planInputPartitions(): Array[InputPartition] =
    batches.zipWithIndex.flatMap { case (b, i) =>
      b.planInputPartitions().map(EraPart(_, i): InputPartition)
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val factories = batches.map(_.createReaderFactory())
    new PartitionReaderFactory {
      // mixed columnar/row partitions are illegal in one scan and the
      // tagged readers are row-based — force uniform row reads
      override def supportColumnarReads(p: InputPartition): Boolean = false
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = p match {
        case EraPart(inner, i) => factories(i).createReader(inner)
        case other => throw new IllegalStateException(
          s"era factory got unknown partition ${other.getClass.getName}")
      }
    }
  }
}

private[graft] object GraftEraScan {
  /** One inner partition + the index of the era scan that owns it —
    * top-level so task serialization never drags the scan along. */
  final case class EraPart(inner: InputPartition, era: Int) extends InputPartition {
    override def preferredLocations(): Array[String] = inner.preferredLocations()
  }
}

/** Union of already-uniform (row-based) batches — the era-split
  * shape of the row-level DML group scan. */
private[sources] object GraftBatchUnion {
  import GraftEraScan.EraPart

  def apply(batches: Seq[Batch]): Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      batches.zipWithIndex.flatMap { case (b, i) =>
        b.planInputPartitions().map(EraPart(_, i): InputPartition)
      }.toArray

    override def createReaderFactory(): PartitionReaderFactory = {
      val factories = batches.map(_.createReaderFactory())
      new PartitionReaderFactory {
        override def supportColumnarReads(p: InputPartition): Boolean = false
        override def createReader(p: InputPartition): PartitionReader[InternalRow] = p match {
          case EraPart(inner, i) => factories(i).createReader(inner)
          case other => throw new IllegalStateException(
            s"union factory got unknown partition ${other.getClass.getName}")
        }
      }
    }
  }
}
