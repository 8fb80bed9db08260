package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.parquet.column.values.bloomfilter.BloomFilter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bloom-filter file skipping for POINT predicates — the pruning class
  * min/max bounds cannot serve. Manifest bounds prune range-shaped
  * data (dates, sequence ids) because writes cluster those naturally;
  * a hash-distributed key (uuid / md5 doc ids — the shape every
  * training-data corpus keys on) spans the full value range in EVERY
  * file, so `WHERE doc_id = 'x'` survives bounds pruning everywhere
  * and a point lookup or point DML scans the whole table. Parquet's
  * own column bloom filters (format spec "Bloom filter"; the split
  * block bloom both parquet-mr and Iceberg write) close exactly this
  * gap: Delta calls the idea a bloom filter index, Iceberg reads the
  * same structure in its row-group evaluators.
  *
  * Design, Spark-first:
  *   - WRITE side: a table opted in via `_bloom.json` (ALTER TABLE …
  *     SET TBLPROPERTIES('graft.bloom.columns'='k1,k2')) has every
  *     data-file write pass `parquet.bloom.filter.enabled#<col>`
  *     writer options — the bloom lives INSIDE the data file, sized by
  *     the parquet writer, zero extra artifacts to track, and Spark's
  *     stock parquet reader already uses it for row-group skipping on
  *     pushed point filters (`parquet.filter.bloom.enabled`, on by
  *     default).
  *   - PLAN side (this object): for Eq/In conjuncts on opted-in
  *     columns, candidate files that SURVIVED bounds pruning get their
  *     bloom region tested (a KB-sized footer-offset read per file —
  *     never a data scan). A bloom that proves every lookup value
  *     absent from every row group removes the FILE from the read or
  *     rewrite set: a point SELECT plans one file instead of all, and
  *     a point CoW DML carries everything else by reference instead of
  *     rewriting it.
  *
  * Soundness: skipping only ever happens on a bloom's definitive "not
  * present" for an equality lookup (NULL rows never satisfy equality,
  * so nulls need no care); a missing bloom (pre-enablement file,
  * unmodeled type, dictionary-only chunk) keeps the file; false
  * positives only KEEP files. Floating zeros test both ±0.0 (SQL
  * `0.0 = -0.0` is true, raw-bits hashing is not); NaN lookups keep
  * the file.
  *
  * Scale: the test runs over the candidates LEFT AFTER layout +
  * bounds pruning — serially on the driver up to
  * `spark.graft.bloom.maxPlanningChecks` (default 512), and as ONE
  * small distributed probe job past it (a boolean per file back to
  * the driver), so a 100k-file corpus keeps full pruning coverage.
  * At 100 TB the win is the DML shape: a GDPR point-delete on a
  * bloom'd key column carries every untouched file by reference and
  * rewrites only true hosts.
  */
object BloomSkip {

  /** The opt-in marker: which columns get write-time blooms, and the
    * per-row-group sizing hints passed to the parquet writer. */
  final case class Spec(columns: Seq[String], ndv: Long, fpp: Double)

  private val mapper = new ObjectMapper()

  private def markerPath(table: String): Path = Paths.get(table, "_bloom.json")

  /** Enable write-time bloom filters on `columns` of `table` (from the
    * next commit on — existing files are untouched; their absence of a
    * bloom simply keeps them candidates, and `compact()` rewrites the
    * live set with blooms). `ndv` is the expected distinct count PER
    * ROW GROUP the parquet writer sizes the filter for; `fpp` the
    * false-positive rate (false positives only cost reads). */
  def enable(table: String, columns: Seq[String],
             ndv: Long = 100000L, fpp: Double = 0.01): Unit = {
    require(columns.nonEmpty, s"bloom enablement of $table needs at least one column")
    // names land verbatim in parquet writer conf keys
    // (parquet.bloom.filter.enabled#<col>) and the JSON marker
    columns.foreach(c => require(c.matches("[A-Za-z0-9_]+"),
      s"bloom column must be a plain top-level column name: '$c'"))
    require(ndv > 0 && fpp > 0 && fpp < 1,
      s"bloom enablement of $table: ndv=$ndv fpp=$fpp out of range")
    // floating-point columns are REFUSED, loudly: parquet's own
    // row-group bloom evaluator hashes raw bits, so a file holding
    // -0.0 row-group-skips an eq(0.0) probe INSIDE the stock reader —
    // silently wrong rows the moment the bloom is written, independent
    // of this engine's planning layer (which probes both zero signs).
    // Floats are not equality keys anyway; the supported set matches
    // the equality-delete key types.
    Snapshots.declaredCleanOf(table).foreach { sch =>
      columns.foreach { c =>
        sch.fields.find(_.name == c).map(_.dataType).foreach {
          case FloatType | DoubleType => throw new IllegalArgumentException(
            s"graft.bloom.columns: $c is floating-point — parquet bloom " +
              "equality is unsound across ±0.0; bloom keys must be " +
              "integral/string/date/timestamp")
          case _ =>
        }
      }
    }
    val root = mapper.createObjectNode()
    val arr = root.putArray("columns")
    columns.foreach(arr.add)
    root.put("ndv", ndv)
    root.put("fpp", fpp)
    Files.write(markerPath(table),
      mapper.writeValueAsString(root).getBytes(StandardCharsets.UTF_8))
    ()
  }

  /** The table's bloom spec, None when never enabled (the common case
    * — every layer below then no-ops). */
  def specOf(table: String): Option[Spec] =
    try {
      val p = markerPath(table)
      if (!Files.isRegularFile(p)) None
      else {
        val root = mapper.readTree(Files.readString(p))
        val cols = root.get("columns").elements().asScala.map(_.asText()).toSeq
        Some(Spec(cols, root.get("ndv").asLong(), root.get("fpp").asDouble()))
      }
    } catch { case NonFatal(_) => None }

  /** Writer options for one data-file write of `table` — empty (and
    * free) for tables never opted in. Applied by every committed data
    * write (snapshot, append, branch staging, branch rewrites) so the
    * bloom invariant holds across the whole chain. Takes the WRITE's
    * own schema so the float/double refusal holds even when [[enable]]
    * ran without a declared schema to check against (library marts
    * have no `_schema.json`): a float bloom is never written, from any
    * path — the ±0.0 unsoundness lives in the stock reader, so the
    * only safe place to stop it is the write. */
  def writerOptions(table: String, schema: org.apache.spark.sql.types.StructType): Map[String, String] =
    specOf(table) match {
      case None => Map.empty
      case Some(s) =>
        s.columns.flatMap { c =>
          schema.fields.find(_.name == c).map(_.dataType) match {
            case Some(FloatType | DoubleType) => throw new IllegalArgumentException(
              s"bloom column $c of $table is floating-point — parquet bloom " +
                "equality is unsound across ±0.0; bloom keys must be " +
                "integral/string/date/timestamp (fix the _bloom.json marker)")
            case Some(_) =>
              Seq(s"parquet.bloom.filter.enabled#$c" -> "true",
                s"parquet.bloom.filter.expected.ndv#$c" -> s.ndv.toString,
                s"parquet.bloom.filter.fpp#$c" -> s.fpp.toString)
            case None => Nil
          }
        }.toMap
    }

  // ---- planning-time observables (tests / gate rows read deltas) ----

  /** Files whose bloom regions were read at planning time. */
  val planningReads = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Files removed from a read or rewrite set by a bloom miss. */
  val filesSkipped = new java.util.concurrent.atomic.AtomicLong(0L)

  private def maxPlanningChecks: Int = {
    val d = 512
    SparkSession.getActiveSession.fold(d) { s =>
      try s.conf.get("spark.graft.bloom.maxPlanningChecks", d.toString).toInt
      catch { case NonFatal(_) => d }
    }
  }

  // ---- lookup extraction ---------------------------------------------

  /** Point lookups per column from the TOP-LEVEL conjuncts of pushed
    * filters: `col = lit`, `col IN (lits…)`, `InSet`. NULL values drop
    * (SQL equality never matches them); a conjunct left with no values
    * contributes nothing (bounds algebra owns never-true shapes). Only
    * columns in `cols` participate — blooms exist only where writes
    * were told to put them. */
  private[graft] def pointLookups(filters: Seq[Expression], cols: Set[String])
      : Map[String, Seq[Any]] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    filters.flatMap(conjuncts).flatMap {
      case EqualTo(a: AttributeReference, Literal(v, _)) if v != null => Seq(a -> Seq(v))
      case EqualTo(Literal(v, _), a: AttributeReference) if v != null => Seq(a -> Seq(v))
      case EqualNullSafe(a: AttributeReference, Literal(v, _)) if v != null => Seq(a -> Seq(v))
      case EqualNullSafe(Literal(v, _), a: AttributeReference) if v != null => Seq(a -> Seq(v))
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        val lits = vs.collect { case Literal(v, _) if v != null => v }
        if (lits.nonEmpty) Seq(a -> lits) else Nil
      case InSet(a: AttributeReference, hset) =>
        val vs = hset.toSeq.filter(_ != null)
        if (vs.nonEmpty) Seq(a -> vs) else Nil
      case _ => Nil
    }
      .filter { case (a, _) => cols.contains(a.name) }
      .groupBy(_._1.name)
      // several conjuncts on one column: each is a separate proof
      // opportunity — keep the SMALLEST value set (strongest test)
      .map { case (name, entries) => name -> entries.map(_._2).minBy(_.size) }
  }

  /** The internal catalyst value rendered as the parquet-hash input
    * for the column's physical type; None = unmodeled pairing (keep).
    * Floating zeros expand to both sign variants by the caller. */
  private def hashInput(v: Any, dt: DataType, pt: PrimitiveTypeName): Option[Any] =
    (dt, pt) match {
      case (StringType, PrimitiveTypeName.BINARY) => v match {
        case u: UTF8String => Some(Binary.fromConstantByteArray(u.getBytes))
        case s: String => Some(Binary.fromString(s))
        case _ => None
      }
      case (LongType | TimestampType | TimestampNTZType, PrimitiveTypeName.INT64) => v match {
        case l: Long => Some(java.lang.Long.valueOf(l))
        case i: Int => Some(java.lang.Long.valueOf(i.toLong))
        case _ => None
      }
      case (IntegerType | ShortType | ByteType | DateType, PrimitiveTypeName.INT32) => v match {
        case i: Int => Some(java.lang.Integer.valueOf(i))
        case s: Short => Some(java.lang.Integer.valueOf(s.toInt))
        case b: Byte => Some(java.lang.Integer.valueOf(b.toInt))
        case _ => None
      }
      case (DoubleType, PrimitiveTypeName.DOUBLE) => v match {
        case d: Double if !d.isNaN => Some(java.lang.Double.valueOf(d))
        case _ => None
      }
      case (FloatType, PrimitiveTypeName.FLOAT) => v match {
        case f: Float if !f.isNaN => Some(java.lang.Float.valueOf(f))
        case _ => None
      }
      case _ => None
    }

  private def hashOf(bf: BloomFilter, input: Any): Long = input match {
    case b: Binary => bf.hash(b)
    case l: java.lang.Long => bf.hash(l.longValue())
    case i: java.lang.Integer => bf.hash(i.intValue())
    case d: java.lang.Double => bf.hash(d.doubleValue())
    case f: java.lang.Float => bf.hash(f.floatValue())
    case _ => 0L // unreachable by construction of hashInput
  }

  /** ±0.0 expansion: SQL equality unifies the zeros, raw-bits hashing
    * does not — a 0.0 lookup must also probe -0.0 (and vice versa). */
  private def variants(v: Any): Seq[Any] = v match {
    case d: Double if d == 0.0d => Seq(0.0d, -0.0d)
    case f: Float if f == 0.0f => Seq(0.0f, -0.0f)
    case x => Seq(x)
  }

  // ---- the file test ---------------------------------------------------

  /** Is every data page of the chunk dictionary-encoded? Then the
    * dictionary page is an EXACT membership list for the chunk (no
    * false positives at all) — which matters doubly because parquet-mr
    * deliberately OMITS the bloom filter for fully-dict chunks (the
    * dictionary subsumes it), so low-cardinality columns (dates,
    * categories, enum-ish dims) would otherwise never skip. The
    * encoding-stats check with the encoding-list fallback is the
    * public `DictionaryFilter` contract of parquet-mr itself. */
  private def allDictEncoded(
      chunk: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData): Boolean = {
    val es = chunk.getEncodingStats
    if (es != null) es.hasDictionaryPages && !es.hasNonDictionaryEncodedPages
    else chunk.getDictionaryPageOffset > 0 &&
      !chunk.getEncodings.asScala.exists(_ == org.apache.parquet.column.Encoding.PLAIN)
  }

  /** The chunk's dictionary entries as hash-input-shaped values
    * (Binary / boxed Long / Integer / Double / Float), or None when
    * the dictionary cannot be read. Entry count is bounded by the
    * writer's dictionary page size — KBs by construction. */
  private def dictionaryEntries(reader: ParquetFileReader,
                                block: org.apache.parquet.hadoop.metadata.BlockMetaData,
                                colName: String): Option[Set[Any]] =
    try {
      val desc = reader.getFooter.getFileMetaData.getSchema.getColumns.asScala
        .find(d => d.getPath.length == 1 && d.getPath()(0) == colName)
        .getOrElse(return None)
      val store: org.apache.parquet.column.page.DictionaryPageReadStore =
        reader.getDictionaryReader(block)
      val page = store.readDictionaryPage(desc)
      if (page == null) return None
      val dict = page.getEncoding.initDictionary(desc, page)
      val n = dict.getMaxId + 1
      import PrimitiveTypeName._
      desc.getPrimitiveType.getPrimitiveTypeName match {
        case BINARY | FIXED_LEN_BYTE_ARRAY =>
          Some((0 until n).map(i => dict.decodeToBinary(i): Any).toSet)
        case INT64 => Some((0 until n).map(i => java.lang.Long.valueOf(dict.decodeToLong(i)): Any).toSet)
        case INT32 => Some((0 until n).map(i => java.lang.Integer.valueOf(dict.decodeToInt(i)): Any).toSet)
        case DOUBLE => Some((0 until n).map(i => java.lang.Double.valueOf(dict.decodeToDouble(i)): Any).toSet)
        case FLOAT => Some((0 until n).map(i => java.lang.Float.valueOf(dict.decodeToFloat(i)): Any).toSet)
        case _ => None
      }
    } catch { case NonFatal(_) => None }

  /** True = the file MAY hold a row satisfying every lookup conjunct;
    * false = some conjunct's every value is PROVABLY absent from every
    * row group. Each chunk proves absence through its bloom when one
    * was written, else through its DICTIONARY when every data page is
    * dictionary-encoded (exact membership — see [[allDictEncoded]]).
    * Missing both, missing chunk, unmodeled type, any read failure →
    * true (keep). One footer open per call. Pure function of its
    * arguments — safe to ship into the distributed planning job. */
  private def fileMayContain(path: String, lookups: Map[String, Seq[Any]],
                             types: Map[String, DataType]): Boolean = {
    val conf = new org.apache.hadoop.conf.Configuration()
    try {
      val reader = ParquetFileReader.open(conf,
        new org.apache.hadoop.fs.Path(new java.io.File(path).toURI))
      try {
        planningReads.incrementAndGet()
        val blocks = reader.getFooter.getBlocks.asScala.toSeq
        if (blocks.isEmpty) return true
        lookups.forall { case (colName, values) =>
          // the conjunct may be satisfied iff SOME value may be present
          // in SOME row group. Block-outer/value-inner so each chunk's
          // bloom (or dictionary) region is read ONCE, not once per
          // lookup value.
          blocks.exists { b =>
            b.getColumns.asScala.find(c =>
              c.getPath.size() == 1 && c.getPath.toDotString == colName) match {
              case None => true // column absent in this file: unmodeled here — keep
              case Some(chunk) =>
                val pt = chunk.getPrimitiveType.getPrimitiveTypeName
                val dt = types.getOrElse(colName, NullType)
                val bf = reader.getBloomFilterDataReader(b).readBloomFilter(chunk)
                if (bf != null)
                  values.exists(v => variants(v).exists { vv =>
                    hashInput(vv, dt, pt) match {
                      case Some(in) => bf.findHash(hashOf(bf, in))
                      case None => true // unmodeled pairing: maybe
                    }
                  })
                else if (allDictEncoded(chunk))
                  dictionaryEntries(reader, b, colName) match {
                    case Some(entries) =>
                      values.exists(v => variants(v).exists { vv =>
                        hashInput(vv, dt, pt) match {
                          case Some(in) => entries.contains(in)
                          case None => true
                        }
                      })
                    case None => true // unreadable dictionary: maybe
                  }
                else true // neither bloom nor exact dictionary: maybe
            }
          }
        }
      } finally reader.close()
    } catch { case NonFatal(_) => true }
  }

  /** The planning entry point: of `candidates` (file paths that
    * already survived bounds pruning), return the subset a bloom (or
    * exact dictionary) PROVES cannot satisfy `filters` — the caller
    * drops them from its read or rewrite set. Empty (and O(1)) when
    * the table was never opted in or the filters carry no point
    * lookup on an opted-in column.
    *
    * Candidate lists up to `spark.graft.bloom.maxPlanningChecks`
    * (default 512) probe serially on the driver — a KB footer-region
    * read per file. PAST the cap the probes run as ONE small Spark
    * job over the candidate list (a boolean per file back to the
    * driver — the [[FileStats.collectFor]] shape), so a 100k-file
    * corpus gets full bloom pruning exactly where it matters most
    * instead of a silently-kept tail; the cap is a
    * parallelize-beyond threshold, not a coverage limit. Without an
    * active session the tail is kept unchecked (sound — pruning is an
    * optimization, never a correctness gate). The planning counters
    * are driver-exact in local mode; under a remote cluster the
    * distributed leg's increments stay on executors (observability
    * only, never semantics). */
  def provablyAbsent(table: String, candidates: Seq[String],
                     filters: Seq[Expression]): Set[String] = {
    if (candidates.isEmpty || filters.isEmpty) return Set.empty
    val spec = specOf(table).getOrElse(return Set.empty)
    val lookups = pointLookups(filters, spec.columns.toSet)
    if (lookups.isEmpty) return Set.empty
    val types: Map[String, DataType] = {
      def attrs(e: Expression): Seq[AttributeReference] =
        e.collect { case a: AttributeReference => a }
      filters.flatMap(attrs).map(a => a.name -> a.dataType).toMap
    }
    val cap = maxPlanningChecks
    val absent: Set[String] =
      if (candidates.size <= cap)
        candidates.filterNot(p => fileMayContain(p, lookups, types)).toSet
      else SparkSession.getActiveSession match {
        case Some(s) =>
          // one probe task per ~64 files: each opens its footers and
          // returns only the proven-absent paths
          val slices = math.max(1, math.min(candidates.size / 64 + 1,
            s.sparkContext.defaultParallelism * 2))
          s.sparkContext.parallelize(candidates, slices)
            .filter(p => !fileMayContain(p, lookups, types))
            .collect().toSet
        case None =>
          // no session to distribute with: keep the tail unchecked
          candidates.take(cap).filterNot(p => fileMayContain(p, lookups, types)).toSet
      }
    filesSkipped.addAndGet(absent.size.toLong)
    absent
  }
}
