package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.unsafe.types.UTF8String

/** Per-data-file column statistics carried in the snapshot manifest —
  * the Iceberg manifest-stats idea (format spec "Manifests": per-file
  * `lower_bounds`/`upper_bounds`) re-expressed over the versioned-
  * parquet store. Collected DRIVER-SIDE from parquet FOOTERS at commit
  * time (KB-sized tail reads — never a data scan), evaluated at scan
  * PLANNING time against pushed filters so a selective predicate
  * prunes whole files before the `ParquetTable` is even constructed:
  * at 100 TB that is the difference between launching tasks for every
  * file of the read set and launching them only for files whose
  * [min,max] can match.
  *
  * Conservative by construction: any file without a usable stat for a
  * referenced column, any predicate shape we don't model, and any
  * manifest written before this field existed keeps the file (or the
  * whole directory). Row-group-level skipping inside surviving files
  * still happens in the parquet reader as before — this layer removes
  * the per-file task/listing cost, not the row-group logic.
  */
object FileStats {

  /** One column's merged min/max over a file. `tag` pins the semantic
    * comparison class; a filter is only evaluated when the attribute's
    * catalyst type maps to the SAME tag (type confusion keeps the
    * file). Bounds are stored JSON-native: integer-like as longs,
    * floating as doubles, strings as (escaped) strings. `nulls` is the
    * file's null count for the column, -1 when any block didn't record
    * one — [[mustMatch]] (the all-rows prover behind metadata-only
    * deletes) needs it, because a NULL row never satisfies a
    * comparison and must survive the delete. */
  final case class ColStat(tag: String, minL: Long, maxL: Long,
                           minD: Double, maxD: Double,
                           minS: String, maxS: String,
                           nulls: Long = -1L)

  /** One data file: path RELATIVE to its version directory, exact row
    * count, and per-top-level-column stats. */
  final case class FileStat(name: String, rows: Long, stats: Map[String, ColStat])

  // ---- collection (commit time) -----------------------------------

  /** Files the DRIVER footer-read serially, one `ParquetFileReader
    * .open` at a time. The distributed path never touches it — the
    * counter is the observable behind the "a large commit performs
    * O(1) driver footer opens" contract (at 100 TB a compaction's
    * ~200k files footer-read serially on the driver is hours of
    * commit-plane time; footer-read in a Spark job it is one short
    * stage). Monotone; tests and the driver query read deltas. */
  val driverFooterOpens = new java.util.concurrent.atomic.AtomicLong(0L)

  /** A commit whose version directory holds at most this many files
    * footer-walks on the driver (cheaper than a job round-trip for
    * O(delta) fast appends); anything larger collects its stats in a
    * distributed Spark job over the file list — the Iceberg stance
    * that per-file stats are produced where the files are written,
    * never by a post-hoc driver scan. Override per session with
    * `spark.graft.stats.driverFooterMax`. */
  private val DefaultDriverFooterMax = 8

  private def driverFooterMax(spark: org.apache.spark.sql.SparkSession): Int =
    try spark.conf.get("spark.graft.stats.driverFooterMax", DefaultDriverFooterMax.toString).toInt
    catch { case NonFatal(_) => DefaultDriverFooterMax }

  /** One file's footer → FileStat (KB tail read, never a data scan).
    * Shared by the serial and distributed collection paths, so both
    * produce bit-identical manifests. */
  private def statOf(conf: org.apache.hadoop.conf.Configuration,
                     uri: java.net.URI, name: String): FileStat = {
    val reader = ParquetFileReader.open(conf, new org.apache.hadoop.fs.Path(uri))
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      FileStat(name, blocks.map(_.getRowCount).sum, mergeBlocks(blocks))
    } finally reader.close()
  }

  /** True when a path SEGMENT is hidden under Spark's own listing
    * convention (`InMemoryFileIndex`): `_`/`.` prefixed, EXCEPT
    * `key=value` partition segments (`__graft_bucket=N/` is data
    * layout, `_deletes/` is a metadata sidecar). */
  private[sources] def hiddenSegment(seg: String): Boolean =
    (seg.startsWith("_") || seg.startsWith(".")) && !seg.contains("=")

  /** Data files under `dir` (recursive, sorted), as (uri,
    * dir-relative-name) pairs. Hidden segments (relative to `dir`)
    * are skipped — mirroring Spark's listing — so metadata sidecars
    * (e.g. merge-on-read `_deletes/`) never masquerade as data. */
  private def dataFiles(dir: Path): Vector[(java.net.URI, String)] =
    scala.util.Using.resource(Files.walk(dir)) { w =>
      w.iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
        .map(p => (p.toUri, dir.relativize(p).toString))
        .filterNot { case (_, rel) => rel.split('/').exists(hiddenSegment) }
        .toVector.sortBy(_._2)
    }

  /** Footer-walk every `*.parquet` under `dir` SERIALLY ON THE DRIVER
    * (recursive — flat for our writers, but cheap to be general).
    * Returns None if anything goes wrong: the manifest then simply
    * carries no file list and readers keep the whole-directory read
    * set. Correct at any size but O(files) driver time — commit paths
    * go through [[collectFor]], which routes large file sets to the
    * distributed job and reserves this walk for O(delta) appends. */
  def collect(dir: Path): Option[Seq[FileStat]] =
    try {
      val conf = new org.apache.hadoop.conf.Configuration()
      Some(dataFiles(dir).map { case (uri, name) =>
        driverFooterOpens.incrementAndGet()
        statOf(conf, uri, name)
      })
    } catch { case NonFatal(_) => None }

  /** Total parquet rows under `dir` from FOOTER arithmetic alone (KB
    * tail reads on the driver, no Spark job) — the emptiness/volume
    * probe sidecar writers use. None when the walk fails. */
  def footerRowCount(dir: Path): Option[Long] =
    collect(dir).map(_.map(_.rows).sum)

  /** Commit-time collection: the serial driver walk for small file
    * sets (≤ `spark.graft.stats.driverFooterMax`, default 8 — the
    * fast-append shape), a distributed footer-read job for everything
    * larger (the CTAS / INSERT OVERWRITE / compact / z-order / large
    * CoW shape: at 100 TB those write O(table) files and a serial
    * driver walk would append hours to the job). The job ships only
    * (uri, name) pairs out and KB-sized [[FileStat]]s back — listing
    * stays a single driver-side directory walk either way. Both paths
    * share [[statOf]], so manifests are bit-identical regardless of
    * route. Returns None on any failure (manifest then carries no
    * file list — readers keep the whole-directory read set). */
  def collectFor(spark: org.apache.spark.sql.SparkSession, dir: Path): Option[Seq[FileStat]] =
    try {
      val files = dataFiles(dir)
      if (files.size <= driverFooterMax(spark)) collect(dir)
      else {
        val slices = math.min(files.size, spark.sparkContext.defaultParallelism).max(1)
        Some(spark.sparkContext.parallelize(files, slices)
          .mapPartitions { it =>
            val conf = new org.apache.hadoop.conf.Configuration()
            it.map { case (uri, name) => statOf(conf, uri, name) }
          }
          .collect().toVector.sortBy(_.name))
      }
    } catch { case NonFatal(_) => None }

  private def tagOf(pt: PrimitiveType): Option[String] = {
    val logical = pt.getLogicalTypeAnnotation
    pt.getPrimitiveTypeName match {
      case PrimitiveTypeName.INT64 => logical match {
        case null => Some("i64")
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          t.getUnit match {
            case LogicalTypeAnnotation.TimeUnit.MICROS => Some("tsu")
            // NANOS reads as LongType in this engine (nanosAsLong)
            case LogicalTypeAnnotation.TimeUnit.NANOS => Some("i64")
            case _ => None
          }
        case t: LogicalTypeAnnotation.IntLogicalTypeAnnotation
          if t.getBitWidth == 64 && t.isSigned => Some("i64")
        case _ => None
      }
      case PrimitiveTypeName.INT32 => logical match {
        case null => Some("i32")
        case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation => Some("date")
        case t: LogicalTypeAnnotation.IntLogicalTypeAnnotation if t.isSigned =>
          t.getBitWidth match {
            case 32 => Some("i32"); case 16 => Some("i16"); case 8 => Some("i8")
            case _ => None
          }
        case _ => None
      }
      case PrimitiveTypeName.DOUBLE => Some("f64")
      case PrimitiveTypeName.FLOAT  => Some("f32")
      case PrimitiveTypeName.BINARY => logical match {
        case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation => Some("str")
        case _ => None
      }
      case _ => None // BOOLEAN, INT96, FIXED_LEN (decimals): not modeled
    }
  }

  private val longTags = Set("i64", "i32", "i16", "i8", "date", "tsu")

  /** Merge per-block stats into per-file bounds; a column survives only
    * if EVERY block has a usable non-null-value stat for it. */
  private def mergeBlocks(
      blocks: Seq[org.apache.parquet.hadoop.metadata.BlockMetaData])
      : Map[String, ColStat] = {
    if (blocks.isEmpty) return Map.empty
    val perBlock: Seq[Map[String, ColStat]] = blocks.map { b =>
      b.getColumns.asScala.flatMap { c =>
        val path = c.getPath.toArray
        val st = c.getStatistics
        if (path.length != 1 || st == null || st.isEmpty || !st.hasNonNullValue) None
        else tagOf(c.getPrimitiveType).flatMap { tag =>
          val mn: AnyRef = st.genericGetMin.asInstanceOf[AnyRef]
          val mx: AnyRef = st.genericGetMax.asInstanceOf[AnyRef]
          val nl = if (st.isNumNullsSet) st.getNumNulls else -1L
          tag match {
            case t if longTags(t) =>
              val (a, z) = (asLong(mn), asLong(mx))
              Some(path(0) -> ColStat(t, a, z, 0, 0, null, null, nl))
            case "f64" | "f32" =>
              val (a, z) = (asDouble(mn), asDouble(mx))
              if (a.isNaN || z.isNaN || a.isInfinite || z.isInfinite) None
              // parquet ±0 normalization: widen so 0.0-vs-negative-zero
              // ordering can never skip a file that holds the other zero
              else Some(path(0) -> ColStat(tag,
                0, 0, if (a == 0.0d) -0.0d else a, if (z == -0.0d) 0.0d else z,
                null, null, nl))
            case "str" =>
              val (a, z) = (mn.asInstanceOf[Binary], mx.asInstanceOf[Binary])
              if (a.length > 96 || z.length > 96) None // truncation unsafe
              else Some(path(0) -> ColStat(tag, 0, 0, 0, 0,
                a.toStringUsingUTF8, z.toStringUsingUTF8, nl))
            case _ => None
          }
        }
      }.toMap
    }
    // intersect columns; merge bounds; null counts sum (unknown taints)
    perBlock.reduce { (x, y) =>
      x.keySet.intersect(y.keySet).iterator.flatMap { k =>
        val (a, b) = (x(k), y(k))
        val nl = if (a.nulls < 0 || b.nulls < 0) -1L else a.nulls + b.nulls
        if (a.tag != b.tag) None
        else Some(k -> (a.tag match {
          case t if longTags(t) =>
            a.copy(minL = math.min(a.minL, b.minL), maxL = math.max(a.maxL, b.maxL),
              nulls = nl)
          case "f64" | "f32" =>
            a.copy(minD = math.min(a.minD, b.minD), maxD = math.max(a.maxD, b.maxD),
              nulls = nl)
          case _ =>
            a.copy(
              minS = if (utf8Cmp(a.minS, b.minS) <= 0) a.minS else b.minS,
              maxS = if (utf8Cmp(a.maxS, b.maxS) >= 0) a.maxS else b.maxS,
              nulls = nl)
        }))
      }.toMap
    }
  }

  private def asLong(v: AnyRef): Long = v match {
    case l: java.lang.Long => l.longValue()
    case i: java.lang.Integer => i.longValue()
    case o => o.toString.toLong
  }
  private def asDouble(v: AnyRef): Double = v match {
    case d: java.lang.Double => d.doubleValue()
    case f: java.lang.Float => f.doubleValue()
    case o => o.toString.toDouble
  }
  // parquet string stats order = unsigned byte order = UTF8String order
  private def utf8Cmp(a: String, b: String): Int =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b))

  // ---- manifest (de)serialization ----------------------------------

  private val mapper = new ObjectMapper()

  /** The `"files":[...]` manifest fragment (valid JSON array text). */
  def toJson(files: Seq[FileStat]): String = {
    val arr = mapper.createArrayNode()
    files.foreach { f =>
      val o = arr.addObject()
      o.put("n", f.name); o.put("r", f.rows)
      val s = o.putObject("s")
      f.stats.foreach { case (col, cs) =>
        val c = s.putObject(col)
        c.put("t", cs.tag)
        cs.tag match {
          case t if longTags(t) => c.put("mn", cs.minL); c.put("mx", cs.maxL)
          case "f64" | "f32"    => c.put("mn", cs.minD); c.put("mx", cs.maxD)
          case _                => c.put("mn", cs.minS); c.put("mx", cs.maxS)
        }
        if (cs.nulls >= 0) { c.put("nl", cs.nulls); () }
      }
    }
    mapper.writeValueAsString(arr)
  }

  /** File list from a manifest, None when the manifest predates stats
    * (readers then keep the whole directory). */
  def fromManifest(manifestText: String): Option[Seq[FileStat]] =
    fromManifestField(manifestText, "files")

  /** Carried-forward file references of a copy-on-write manifest
    * (names are TABLE-ROOT-relative, e.g. `v=3/part-x.parquet`).
    * Empty for full-state / append manifests. */
  def carriedFromManifest(manifestText: String): Seq[FileStat] =
    fromManifestField(manifestText, "carried").getOrElse(Seq.empty)

  private def fromManifestField(manifestText: String, field: String): Option[Seq[FileStat]] =
    try {
      val root = mapper.readTree(manifestText)
      Option(root.get(field)).collect { case arr: ArrayNode =>
        arr.elements().asScala.map { e =>
          val stats = Option(e.get("s")).collect { case o: ObjectNode =>
            o.properties().asScala.flatMap { ent =>
              val v = ent.getValue
              val tag = v.get("t").asText()
              val nl = Option(v.get("nl")).map(_.asLong()).getOrElse(-1L)
              val cs =
                if (longTags(tag))
                  ColStat(tag, v.get("mn").asLong(), v.get("mx").asLong(), 0, 0, null, null, nl)
                else if (tag == "f64" || tag == "f32")
                  ColStat(tag, 0, 0, v.get("mn").asDouble(), v.get("mx").asDouble(), null, null, nl)
                else
                  ColStat(tag, 0, 0, 0, 0, v.get("mn").asText(), v.get("mx").asText(), nl)
              Some(ent.getKey -> cs)
            }.toMap
          }.getOrElse(Map.empty[String, ColStat])
          FileStat(e.get("n").asText(), e.get("r").asLong(), stats)
        }.toSeq
      }
    } catch { case NonFatal(_) => None }

  // ---- planning-time evaluation ------------------------------------

  /** Expected tag for an attribute's catalyst type — evaluation only
    * proceeds on an exact match (anything else keeps the file). */
  private def expectedTag(dt: org.apache.spark.sql.types.DataType): Option[String] = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType => Some("i64"); case IntegerType => Some("i32")
      case ShortType => Some("i16"); case ByteType => Some("i8")
      case DateType => Some("date")
      case TimestampType | TimestampNTZType => Some("tsu")
      case DoubleType => Some("f64"); case FloatType => Some("f32")
      case StringType => Some("str")
      case _ => None
    }
  }

  /** Can runtime filters on a column of this type be evaluated by the
    * bounds algebra? (Advertised via `filterAttributes`.) */
  def runtimeFilterable(dt: org.apache.spark.sql.types.DataType): Boolean =
    expectedTag(dt).isDefined

  /** The comparison-class tag a catalyst type maps to (the
    * [[ManifestAgg]] seam). */
  private[sources] def expectedTagOf(dt: org.apache.spark.sql.types.DataType): Option[String] =
    expectedTag(dt)

  /** Translate a connector-level runtime `Predicate` (what Spark's
    * dynamic pruning feeds `SupportsRuntimeV2Filtering.filter`) into
    * the catalyst shape [[mayMatch]] evaluates. Unmodeled shapes →
    * None (no extra pruning — never wrong, just less skipped). */
  def fromV2Predicate(p: org.apache.spark.sql.connector.expressions.filter.Predicate,
                      schema: org.apache.spark.sql.types.StructType): Option[Expression] = {
    import org.apache.spark.sql.connector.{expressions => v2}
    def attrOf(e: v2.Expression): Option[AttributeReference] = e match {
      case f: v2.NamedReference if f.fieldNames.length == 1 =>
        schema.fields.find(_.name == f.fieldNames()(0))
          .map(fd => AttributeReference(fd.name, fd.dataType)())
      case _ => None
    }
    def litOf(e: v2.Expression): Option[Literal] = e match {
      case l: v2.Literal[_] => Some(Literal(l.value, l.dataType))
      case _ => None
    }
    def binary(mk: (Expression, Expression) => Expression): Option[Expression] = {
      val kids = p.children()
      if (kids.length != 2) None
      else (attrOf(kids(0)), litOf(kids(1)), litOf(kids(0)), attrOf(kids(1))) match {
        case (Some(a), Some(l), _, _) => Some(mk(a, l))
        case (_, _, Some(l), Some(a)) => Some(mk(l, a))
        case _ => None
      }
    }
    p.name() match {
      case "IN" =>
        val kids = p.children()
        if (kids.length < 2) None
        else attrOf(kids(0)).flatMap { a =>
          val lits = kids.drop(1).flatMap(litOf)
          if (lits.length == kids.length - 1) Some(In(a, lits.toSeq)) else None
        }
      case "="  => binary(EqualTo(_, _))
      case ">"  => binary(GreaterThan(_, _))
      case ">=" => binary(GreaterThanOrEqual(_, _))
      case "<"  => binary(LessThan(_, _))
      case "<=" => binary(LessThanOrEqual(_, _))
      case "AND" => p match {
        case a: org.apache.spark.sql.connector.expressions.filter.And =>
          (fromV2Predicate(a.left(), schema), fromV2Predicate(a.right(), schema)) match {
            case (Some(l), Some(r)) => Some(And(l, r))
            case (one, other) => one.orElse(other) // AND: either side alone is sound
          }
        case _ => None
      }
      case "OR" => p match {
        case o: org.apache.spark.sql.connector.expressions.filter.Or =>
          for {
            l <- fromV2Predicate(o.left(), schema)
            r <- fromV2Predicate(o.right(), schema)
          } yield Or(l, r) // OR needs BOTH sides modeled to stay sound
        case _ => None
      }
      case _ => None
    }
  }

  private def litLong(v: Any): Option[Long] = v match {
    case l: Long => Some(l); case i: Int => Some(i.toLong)
    case s: Short => Some(s.toLong); case b: Byte => Some(b.toLong)
    case _ => None
  }
  private def litDouble(v: Any): Option[Double] = v match {
    case d: Double => Some(d); case f: Float => Some(f.toDouble)
    case _ => None
  }

  /** true = the file MAY contain matching rows (keep); false = provably
    * no row of the file satisfies `expr` (skip). Every unmodeled shape
    * answers true. */
  def mayMatch(file: FileStat, filters: Seq[Expression]): Boolean =
    // a zero-row file can satisfy nothing (empty task outputs — e.g. a
    // sparse small append — record r:0 with no column stats, which
    // would otherwise defeat every bound)
    file.rows > 0 && filters.forall(e => eval(file.stats, e))

  private def eval(stats: Map[String, ColStat], e: Expression): Boolean = e match {
    case And(l, r) => eval(stats, l) && eval(stats, r)
    case Or(l, r)  => eval(stats, l) || eval(stats, r)
    case EqualTo(a: AttributeReference, Literal(v, _)) => cmp(stats, a, v, "eq")
    case EqualTo(Literal(v, _), a: AttributeReference) => cmp(stats, a, v, "eq")
    case EqualNullSafe(a: AttributeReference, Literal(v, _)) if v != null => cmp(stats, a, v, "eq")
    case EqualNullSafe(Literal(v, _), a: AttributeReference) if v != null => cmp(stats, a, v, "eq")
    case GreaterThan(a: AttributeReference, Literal(v, _)) => cmp(stats, a, v, "gt")
    case GreaterThan(Literal(v, _), a: AttributeReference) => cmp(stats, a, v, "lt")
    case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) => cmp(stats, a, v, "ge")
    case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) => cmp(stats, a, v, "le")
    case LessThan(a: AttributeReference, Literal(v, _)) => cmp(stats, a, v, "lt")
    case LessThan(Literal(v, _), a: AttributeReference) => cmp(stats, a, v, "gt")
    case LessThanOrEqual(a: AttributeReference, Literal(v, _)) => cmp(stats, a, v, "le")
    case LessThanOrEqual(Literal(v, _), a: AttributeReference) => cmp(stats, a, v, "ge")
    case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists { case Literal(v, _) => cmp(stats, a, v, "eq") }
    case InSet(a: AttributeReference, hset) =>
      hset.exists(v => cmp(stats, a, v, "eq"))
    // a recorded ColStat implies ≥1 non-null value (hasNonNullValue
    // gates collection); a KNOWN-zero null count proves no row is NULL
    case IsNull(a: AttributeReference) =>
      stats.get(a.name).forall(_.nulls != 0)
    case _ => true // IsNotNull / StartsWith / functions / ...
  }

  /** true = PROVABLY every row of the file satisfies all `filters` —
    * the prover behind metadata-only deletes (a file whose rows ALL
    * match a DELETE predicate is dropped from the next snapshot
    * without ever being read). Sound under NULLs: comparison proofs
    * additionally require a KNOWN-ZERO null count for the column,
    * because a NULL row never satisfies a comparison and must survive
    * the delete. Every unmodeled shape answers false — the file is
    * then rewritten instead of dropped (never wrong, just less
    * skipped). */
  def mustMatch(file: FileStat, filters: Seq[Expression]): Boolean =
    filters.forall(e => evalMust(file.stats, e))

  private def evalMust(stats: Map[String, ColStat], e: Expression): Boolean = e match {
    case And(l, r) => evalMust(stats, l) && evalMust(stats, r)
    // all rows match one side ⇒ all rows match the disjunction
    case Or(l, r)  => evalMust(stats, l) || evalMust(stats, r)
    case EqualTo(a: AttributeReference, Literal(v, _)) => cmpMust(stats, a, v, "eq")
    case EqualTo(Literal(v, _), a: AttributeReference) => cmpMust(stats, a, v, "eq")
    case GreaterThan(a: AttributeReference, Literal(v, _)) => cmpMust(stats, a, v, "gt")
    case GreaterThan(Literal(v, _), a: AttributeReference) => cmpMust(stats, a, v, "lt")
    case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) => cmpMust(stats, a, v, "ge")
    case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) => cmpMust(stats, a, v, "le")
    case LessThan(a: AttributeReference, Literal(v, _)) => cmpMust(stats, a, v, "lt")
    case LessThan(Literal(v, _), a: AttributeReference) => cmpMust(stats, a, v, "gt")
    case LessThanOrEqual(a: AttributeReference, Literal(v, _)) => cmpMust(stats, a, v, "le")
    case LessThanOrEqual(Literal(v, _), a: AttributeReference) => cmpMust(stats, a, v, "ge")
    // min == max == v covers every row, and that value is in the set
    case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists { case Literal(v, _) => cmpMust(stats, a, v, "eq") }
    case IsNotNull(a: AttributeReference) =>
      stats.get(a.name).exists(_.nulls == 0)
    case _ => false // IsNull (all-null files record no stat) / Not / ...
  }

  /** All-rows variant of [[cmp]]: every row of the file provably
    * relates to `v` per `op`. Requires a recorded stat with a
    * known-zero null count; anything else answers false. */
  private def cmpMust(stats: Map[String, ColStat], a: AttributeReference,
                      v: Any, op: String): Boolean = {
    if (v == null) return false
    val cs = stats.getOrElse(a.name, return false)
    if (cs.nulls != 0) return false
    expectedTag(a.dataType) match {
      case Some(tag) if tag == cs.tag =>
        // signum of (value - bound), same convention as cmp
        def test(cmpMin: Int, cmpMax: Int): Boolean = op match {
          case "eq" => cmpMin == 0 && cmpMax == 0 // min == v == max
          case "gt" => cmpMin < 0                 // all rows > v ⇔ min > v
          case "ge" => cmpMin <= 0
          case "lt" => cmpMax > 0                 // all rows < v ⇔ max < v
          case "le" => cmpMax >= 0
          case _ => false
        }
        tag match {
          case t if longTags(t) =>
            litLong(v).exists(l => test(java.lang.Long.compare(l, cs.minL),
              java.lang.Long.compare(l, cs.maxL)))
          case "f64" | "f32" =>
            litDouble(v).exists { d =>
              if (d.isNaN) false // NaN ordering not modeled in bounds
              else test(java.lang.Double.compare(d, cs.minD),
                java.lang.Double.compare(d, cs.maxD))
            }
          case _ =>
            val u = v match {
              case s: UTF8String => s
              case s: String => UTF8String.fromString(s)
              case _ => return false
            }
            test(u.compareTo(UTF8String.fromString(cs.minS)),
              u.compareTo(UTF8String.fromString(cs.maxS)))
        }
      case _ => false
    }
  }

  /** DSv1 source-filter → catalyst translation for the
    * [[mayMatch]]/[[mustMatch]] algebra (the `SupportsDelete` path
    * hands filters in v1 shape). Literal values arrive as EXTERNAL
    * types (java.sql.Date, String, …) — `Literal.apply` converts to
    * the internal representation the bounds comparison expects.
    * Unmodeled shapes → None (the caller then rewrites the file —
    * never wrong, just less skipped). */
  def fromV1Filter(f: org.apache.spark.sql.sources.Filter,
                   schema: org.apache.spark.sql.types.StructType): Option[Expression] = {
    import org.apache.spark.sql.{sources => v1}
    def attr(name: String): Option[AttributeReference] =
      schema.fields.find(_.name == name)
        .map(fd => AttributeReference(fd.name, fd.dataType)())
    f match {
      case v1.EqualTo(a, v)                      => attr(a).map(EqualTo(_, Literal(v)))
      case v1.EqualNullSafe(a, v) if v != null   => attr(a).map(EqualNullSafe(_, Literal(v)))
      case v1.GreaterThan(a, v)                  => attr(a).map(GreaterThan(_, Literal(v)))
      case v1.GreaterThanOrEqual(a, v)           => attr(a).map(GreaterThanOrEqual(_, Literal(v)))
      case v1.LessThan(a, v)                     => attr(a).map(LessThan(_, Literal(v)))
      case v1.LessThanOrEqual(a, v)              => attr(a).map(LessThanOrEqual(_, Literal(v)))
      case v1.In(a, vs) if vs.forall(_ != null)  =>
        attr(a).map(x => In(x, vs.toIndexedSeq.map(Literal(_))))
      case v1.IsNull(a)                          => attr(a).map(IsNull(_))
      case v1.IsNotNull(a)                       => attr(a).map(IsNotNull(_))
      case v1.And(l, r) =>
        for { lc <- fromV1Filter(l, schema); rc <- fromV1Filter(r, schema) } yield And(lc, rc)
      case v1.Or(l, r) =>
        for { lc <- fromV1Filter(l, schema); rc <- fromV1Filter(r, schema) } yield Or(lc, rc)
      case _ => None // Not / StringStartsWith / AlwaysTrue / ...
    }
  }

  /** Range test of `v` against the column's [min,max]; `op` is the
    * predicate direction on the ATTRIBUTE side. Missing stat, null
    * literal, or tag mismatch → true (keep). */
  private def cmp(stats: Map[String, ColStat], a: AttributeReference,
                  v: Any, op: String): Boolean = {
    if (v == null) return true
    val cs = stats.getOrElse(a.name,
      return true) // evolved/missing column: rows may be NULL — never skip here
    expectedTag(a.dataType) match {
      case Some(tag) if tag == cs.tag =>
        // signum of (value - bound) for the tag's comparison class
        def test(cmpMin: Int, cmpMax: Int): Boolean = op match {
          case "eq" => cmpMin >= 0 && cmpMax <= 0 // min <= v <= max
          case "gt" => cmpMax < 0                 // some row > v  ⇔ max > v
          case "ge" => cmpMax <= 0
          case "lt" => cmpMin > 0                 // some row < v  ⇔ min < v
          case "le" => cmpMin >= 0
          case _ => true
        }
        tag match {
          case t if longTags(t) =>
            litLong(v).forall(l => test(java.lang.Long.compare(l, cs.minL),
              java.lang.Long.compare(l, cs.maxL)))
          case "f64" | "f32" =>
            litDouble(v).forall { d =>
              if (d.isNaN) true // NaN ordering not modeled in bounds
              else test(java.lang.Double.compare(d, cs.minD),
                java.lang.Double.compare(d, cs.maxD))
            }
          case _ =>
            val u = v match {
              case s: UTF8String => s
              case s: String => UTF8String.fromString(s)
              case _ => return true
            }
            test(u.compareTo(UTF8String.fromString(cs.minS)),
              u.compareTo(UTF8String.fromString(cs.maxS)))
        }
      case _ => true
    }
  }
}
