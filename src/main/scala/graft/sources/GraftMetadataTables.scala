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
  *   - `t.partitions` — per-layout-partition file/record/size rollup
  *     of the current state (r16; plain files group under
  *     '<unpartitioned>')
  *   - `t.manifests` — one row per commit manifest: operation, time,
  *     own/carried file counts, both delete-entry kinds (r16)
  *   - `t.entries`   — every (version, data file) pair across the
  *     chain, 'added' vs 'carried', with the file's origin version —
  *     the provenance walk (r16)
  *
  * All are served as a `LocalScan` over driver-side manifest
  * reads — the same metadata plane every planner surface already
  * walks (no data file is opened; `files` sizes come from directory
  * metadata). `files` is |live files|-sized: fine through the
  * hundreds of thousands of files a 100 TB table holds at healthy
  * file sizes; a corpus pathologically beyond that should list
  * per-partition-slice (the manifests are per-version, so a
  * distributed variant is a mapPartitions over manifest names — not
  * needed at any tested scale). */
private[sources] object GraftMetadataTables {

  val kinds: Set[String] =
    Set("snapshots", "history", "refs", "files", "partitions", "manifests",
      "entries")

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
      StructField("bytes", LongType, nullable = false))),
    "partitions" -> StructType(Seq(
      StructField("partition", StringType, nullable = false),
      StructField("file_count", LongType, nullable = false),
      StructField("record_count", LongType, nullable = true),
      StructField("total_size_bytes", LongType, nullable = false))),
    "manifests" -> StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("operation", StringType, nullable = false),
      StructField("committed_at_ms", LongType, nullable = false),
      StructField("own_files", LongType, nullable = true),
      StructField("carried_files", LongType, nullable = false),
      StructField("pos_delete_entries", LongType, nullable = false),
      StructField("eq_delete_entries", LongType, nullable = false),
      StructField("path", StringType, nullable = false))),
    "entries" -> StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("status", StringType, nullable = false),
      StructField("file", StringType, nullable = false),
      StructField("row_count", LongType, nullable = false),
      StructField("origin_version", LongType, nullable = false))))

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
    case "partitions" =>
      // per-LAYOUT-partition rollup (Iceberg `t.partitions`): pure
      // manifest + directory-metadata arithmetic — zero data files
      // opened. Partition = the file's `key=value` layout segment
      // (between the version dir and the basename); plain files
      // group under '<unpartitioned>'. Record counts are manifest
      // (physical) rows — NULL when any contributing file predates
      // per-file stats.
      val vs = Snapshots.versions(table)
      if (vs.isEmpty) Array.empty
      else {
        def partOf(rel: String): String = {
          val segs = rel.split('/')
          segs.slice(1, segs.length - 1).find(_.contains("="))
            .getOrElse("<unpartitioned>")
        }
        val files: Seq[(String, Option[Long], Long)] =
          Snapshots.stateComponents(table, vs.last).flatMap {
            case Right((p, st)) =>
              Seq((partOf(Snapshots.rootRel(table, p)), Some(st.rows),
                Files.size(Paths.get(p))))
            case Left(dir) => Snapshots.expandParquet(dir).map { p =>
              (partOf(Snapshots.rootRel(table, p)), None: Option[Long],
                Files.size(Paths.get(p)))
            }
          }
        files.groupBy(_._1).toSeq.sortBy(_._1).map { case (part, fs) =>
          val recs: Any =
            if (fs.exists(_._2.isEmpty)) null
            else java.lang.Long.valueOf(fs.flatMap(_._2).sum)
          new GenericInternalRow(Array[Any](
            utf8(part), fs.size.toLong, recs, fs.map(_._3).sum)): InternalRow
        }.toArray
      }
    case "manifests" =>
      // one row per commit manifest (Iceberg `t.manifests`): own file
      // count (NULL for pre-stats manifests), carried refs, and both
      // delete-entry kinds — the audit surface for the commit chain
      val times = Snapshots.commitTimes(table).toMap
      Snapshots.versions(table).map { v =>
        val text = Snapshots.manifestTextOf(table, v)
        val op = "\"operation\":\"([^\"]*)\"".r.findFirstMatchIn(text)
          .map(_.group(1)).getOrElse("")
        val own: Any = FileStats.fromManifest(text)
          .map(fs => java.lang.Long.valueOf(fs.size.toLong)).orNull
        new GenericInternalRow(Array[Any](
          v, utf8(op), times(v), own,
          FileStats.carriedFromManifest(text).size.toLong,
          MorDeletes.fromManifest(text).size.toLong,
          EqDeletes.fromManifest(text).size.toLong,
          utf8(s"_meta/$v.json"))): InternalRow
      }.toArray
    case "entries" =>
      // per-manifest FILE ENTRIES (Iceberg `t.entries`): every
      // (version, data file) pair across the whole chain — 'added'
      // for files the manifest's own version directory holds,
      // 'carried' for refs a CoW commit kept; origin_version is the
      // file's physical home (= version for added entries). The
      // manifest-plane provenance walk: which commit added a file,
      // which commits still reference it.
      Snapshots.versions(table).flatMap { v =>
        val text = Snapshots.manifestTextOf(table, v)
        val added = FileStats.fromManifest(text).getOrElse(Seq.empty).map { f =>
          new GenericInternalRow(Array[Any](
            v, utf8("added"), utf8(s"v=$v/${f.name}"), f.rows, v)): InternalRow
        }
        val carried = FileStats.carriedFromManifest(text).map { f =>
          new GenericInternalRow(Array[Any](
            v, utf8("carried"), utf8(f.name), f.rows,
            RenameEras.fileVersionOf(f.name))): InternalRow
        }
        added ++ carried
      }.toArray
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
