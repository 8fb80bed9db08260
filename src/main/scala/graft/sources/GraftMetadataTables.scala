package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style METADATA TABLES: `SELECT * FROM graft.ns.t.<kind>`
  * resolves (via [[GraftCatalog.loadTable]]'s suffix fallback) to a
  * read-only relation over the table's commit metadata —
  *
  *   - `t.snapshots` — (version, committed_at_ms, operation,
  *     row_count): the full manifest chain, the audit surface the
  *     reference's schema jobs poll
  *     (`/root/reference/spark/jobs/schema_check.py:33`)
  *   - `t.history`   — (version, committed_at_ms, is_current)
  *   - `t.refs`      — (name, type, version): named tags
  *   - `t.files`     — (file, version, row_count, bytes): every LIVE
  *     data file of the current state with its manifest row count
  *     (NULL for files whose manifest predates per-file stats) and
  *     filesystem size
  *
  * All four are served as a `LocalScan` over driver-side manifest
  * reads — the same metadata plane every planner surface already
  * walks (no data file is opened; `files` sizes come from directory
  * metadata). `files` is |live files|-sized: fine through the
  * hundreds of thousands of files a 100 TB table holds at healthy
  * file sizes; a corpus pathologically beyond that should list
  * per-partition-slice (the manifests are per-version, so a
  * distributed variant is a mapPartitions over manifest names — not
  * needed at any tested scale). */
private[sources] object GraftMetadataTables {

  val kinds: Set[String] = Set("snapshots", "history", "refs", "files")

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  private val schemas: Map[String, StructType] = Map(
    "snapshots" -> StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("committed_at_ms", LongType, nullable = false),
      StructField("operation", StringType, nullable = false),
      StructField("row_count", LongType, nullable = false))),
    "history" -> StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("committed_at_ms", LongType, nullable = false),
      StructField("is_current", BooleanType, nullable = false))),
    "refs" -> StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("type", StringType, nullable = false),
      StructField("version", LongType, nullable = false))),
    "files" -> StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("version", LongType, nullable = false),
      StructField("row_count", LongType, nullable = true),
      StructField("bytes", LongType, nullable = false))))

  private def rowsOf(kind: String, table: String): Array[InternalRow] = kind match {
    case "snapshots" =>
      val times = Snapshots.commitTimes(table).toMap
      Snapshots.versions(table).map { v =>
        val text = Snapshots.manifestTextOf(table, v)
        val op = "\"operation\":\"([^\"]*)\"".r.findFirstMatchIn(text)
          .map(_.group(1)).getOrElse("")
        val rows = "\"row_count\":(\\d+)".r.findFirstMatchIn(text)
          .map(_.group(1).toLong).getOrElse(0L)
        new GenericInternalRow(Array[Any](v, times(v), utf8(op), rows)): InternalRow
      }.toArray
    case "history" =>
      val vs = Snapshots.versions(table)
      val times = Snapshots.commitTimes(table).toMap
      vs.map(v => new GenericInternalRow(
        Array[Any](v, times(v), v == vs.last)): InternalRow).toArray
    case "refs" =>
      (Snapshots.tagsOf(table).toSeq.sortBy(_._1).map { case (n, v) =>
        new GenericInternalRow(Array[Any](utf8(n), utf8("tag"), v)): InternalRow
      } ++
        // a branch ref's version is its FORK BASE (the main version its
        // reads anchor on); its own chain lists via branchVersions
        Snapshots.branchesOf(table).toSeq.sortBy(_._1).map { case (n, b) =>
          new GenericInternalRow(Array[Any](utf8(n), utf8("branch"), b)): InternalRow
        }).toArray
    case "files" =>
      val vs = Snapshots.versions(table)
      if (vs.isEmpty) Array.empty
      else Snapshots.stateComponents(table, vs.last).flatMap {
        case Right((p, st)) =>
          Seq(new GenericInternalRow(Array[Any](
            utf8(Snapshots.rootRel(table, p)),
            RenameEras.fileVersionOf(Snapshots.rootRel(table, p)),
            st.rows, Files.size(Paths.get(p)))): InternalRow)
        case Left(dir) => Snapshots.expandParquet(dir).map { p =>
          new GenericInternalRow(Array[Any](
            utf8(Snapshots.rootRel(table, p)),
            RenameEras.fileVersionOf(Snapshots.rootRel(table, p)),
            null, Files.size(Paths.get(p)))): InternalRow
        }
      }.sortBy(_.getUTF8String(0).toString).toArray
    case other => throw new IllegalArgumentException(s"no metadata table $other")
  }

  final class MetadataTable(kind: String, tablePath: String, qualifiedName: String)
    extends Table with SupportsRead {
    override def name(): String = qualifiedName
    override def schema(): StructType = schemas(kind)
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new ScanBuilder {
        // rows materialize at build() time — the listing is current as
        // of query planning, like every other manifest read
        override def build(): Scan = new LocalScan {
          private val data = rowsOf(kind, tablePath)
          override def rows(): Array[InternalRow] = data
          override def readSchema(): StructType = schemas(kind)
        }
      }
  }
}
