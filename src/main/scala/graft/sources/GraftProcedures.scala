package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The catalog's SQL-callable maintenance surface — Spark 4's native
  * `ProcedureCatalog` contract (the stored-procedure shape Iceberg
  * pioneered as `CALL cat.system.rewrite_data_files(...)`, which
  * Spark then standardized as the `procedures` connector API):
  *
  * {{{
  *   CALL graft.system.compact(table => 'marts.daily')
  *   CALL graft.system.rewrite_zorder(table => 'marts.fact', columns => 'x,y')
  *   CALL graft.system.expire_snapshots(table => 'marts.daily', keep_last => 3)
  *   CALL graft.system.expire_snapshots(table => 'marts.daily', older_than_ms => ...)
  *   CALL graft.system.remove_orphan_files(table => 'marts.daily')
  *   CALL graft.system.rollback_to_snapshot(table => 'marts.daily', version => 2)
  *   CALL graft.system.create_tag(table => 'marts.daily', tag => 'audit', version => 2)
  *   CALL graft.system.drop_tag(table => 'marts.daily', tag => 'audit')
  * }}}
  *
  * Each procedure is a thin named binding over the corresponding
  * [[Snapshots]] verb — one implementation, two call surfaces (the
  * library API and SQL), same report rows. The analyzer coerces and
  * reorders named arguments against [[ProcedureParameter]] metadata
  * and materializes defaults, so `call` always sees one positionally
  * complete row; results come back as a `LocalScan` relation (the
  * reports are metadata-sized by construction — one row per file
  * tree, snapshot, or verb). Maintenance procedures are
  * side-effecting, hence `isDeterministic = false`. */
private[sources] object GraftProcedures {

  private def p(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def pd(name: String, dt: DataType, default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  private def out(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t, nullable = false) })

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  private final case class Spec(
      name: String,
      description: String,
      params: Seq[ProcedureParameter],
      outSchema: StructType,
      run: (GraftCatalog, SparkSession, InternalRow) => Array[InternalRow])

  private def reportOf(df: org.apache.spark.sql.DataFrame,
                       schema: StructType): Array[InternalRow] =
    // |report| rows — metadata-sized (one per snapshot / orphan tree)
    df.collect().map { r =>
      new GenericInternalRow(schema.fields.indices.map { i =>
        schema.fields(i).dataType match {
          case StringType => utf8(r.get(i).toString)
          case LongType   => r.getLong(i)
          case IntegerType => r.getInt(i)
          case other => throw new IllegalStateException(s"unhandled report type $other")
        }
      }.toArray[Any])
    }

  private val rewriteOut = out(
    "version" -> LongType, "files_before" -> IntegerType, "files_after" -> IntegerType)
  private val expireOut = out(
    "version" -> LongType, "row_count" -> LongType, "status" -> StringType)
  private val orphanOut = out(
    "path" -> StringType, "files" -> LongType, "status" -> StringType)
  private val tagOut = out("tag" -> StringType, "version" -> LongType)

  private val specs: Seq[Spec] = Seq(
    Spec("compact",
      "rewrite the current state as one full-state snapshot of ~target_file_bytes files",
      Seq(p("table", StringType),
        pd("target_file_bytes", LongType, (128L * 1024 * 1024).toString)),
      rewriteOut,
      (cat, s, in) => {
        val (v, b, a) = Snapshots.compact(s, cat.resolveTablePath(in.getUTF8String(0).toString),
          targetFileBytes = in.getLong(1))
        Array(new GenericInternalRow(Array[Any](v, b, a)))
      }),
    Spec("rewrite_zorder",
      "clustered compaction: rewrite the current state z-ordered on the given columns",
      Seq(p("table", StringType), p("columns", StringType),
        pd("target_files", IntegerType, "0")),
      rewriteOut,
      (cat, s, in) => {
        val cols = in.getUTF8String(1).toString.split(',').map(_.trim).filter(_.nonEmpty)
        val (v, b, a) = Snapshots.compactZOrdered(
          s, cat.resolveTablePath(in.getUTF8String(0).toString),
          cols.toIndexedSeq, targetFiles = in.getInt(2))
        Array(new GenericInternalRow(Array[Any](v, b, a)))
      }),
    Spec("expire_snapshots",
      "retention: keep_last window OR older_than_ms age cut (exactly one); tags pin",
      Seq(p("table", StringType),
        pd("keep_last", IntegerType, "-1"), pd("older_than_ms", LongType, "-1")),
      expireOut,
      (cat, s, in) => {
        val table = cat.resolveTablePath(in.getUTF8String(0).toString)
        val keepLast = in.getInt(1)
        val olderThan = in.getLong(2)
        require((keepLast >= 0) != (olderThan >= 0),
          "expire_snapshots takes EXACTLY ONE of keep_last / older_than_ms")
        val rep = if (keepLast >= 0) Snapshots.expireSnapshots(s, table, keepLast)
        else Snapshots.expireSnapshotsOlderThan(s, table, olderThan)
        reportOf(rep, expireOut)
      }),
    Spec("remove_orphan_files",
      "delete unreferenced debris (uncommitted version dirs, _temporary trees)",
      Seq(p("table", StringType),
        pd("older_than_ms", LongType, (24L * 3600 * 1000).toString)),
      orphanOut,
      (cat, s, in) => reportOf(
        Snapshots.removeOrphanFiles(s, cat.resolveTablePath(in.getUTF8String(0).toString),
          olderThanMs = in.getLong(1)),
        orphanOut)),
    Spec("rollback_to_snapshot",
      "commit version's state forward as a new current snapshot (history append-only)",
      Seq(p("table", StringType), p("version", LongType)),
      out("version" -> LongType),
      (cat, s, in) => {
        val v = Snapshots.rollback(s, cat.resolveTablePath(in.getUTF8String(0).toString),
          in.getLong(1))
        Array(new GenericInternalRow(Array[Any](v)))
      }),
    Spec("create_tag",
      "pin a snapshot by name: readable as VERSION AS OF '<tag>', retention-exempt",
      Seq(p("table", StringType), p("tag", StringType), p("version", LongType),
        pd("replace", BooleanType, "false")),
      tagOut,
      (cat, s, in) => {
        val name = in.getUTF8String(1).toString
        Snapshots.createTag(cat.resolveTablePath(in.getUTF8String(0).toString),
          name, in.getLong(2), replace = in.getBoolean(3))
        Array(new GenericInternalRow(Array[Any](utf8(name), in.getLong(2))))
      }),
    Spec("drop_tag",
      "drop a named tag: its versions become ordinary retention candidates",
      Seq(p("table", StringType), p("tag", StringType)),
      tagOut,
      (cat, s, in) => {
        val table = cat.resolveTablePath(in.getUTF8String(0).toString)
        val name = in.getUTF8String(1).toString
        val was = Snapshots.tagsOf(table).getOrElse(name, -1L)
        Snapshots.dropTag(table, name)
        Array(new GenericInternalRow(Array[Any](utf8(name), was)))
      }),
    Spec("create_branch",
      "fork a staging branch at the current version (write-audit-publish)",
      Seq(p("table", StringType), p("branch", StringType)),
      out("branch" -> StringType, "base" -> LongType),
      (cat, s, in) => {
        val name = in.getUTF8String(1).toString
        val base = Snapshots.createBranch(
          cat.resolveTablePath(in.getUTF8String(0).toString), name)
        Array(new GenericInternalRow(Array[Any](utf8(name), base)))
      }),
    Spec("fast_forward",
      "publish the branch state to main as one zero-copy metadata commit",
      Seq(p("table", StringType), p("branch", StringType)),
      out("branch" -> StringType, "version" -> LongType),
      (cat, s, in) => {
        val name = in.getUTF8String(1).toString
        val v = Snapshots.fastForward(s,
          cat.resolveTablePath(in.getUTF8String(0).toString), name)
        Array(new GenericInternalRow(Array[Any](utf8(name), v)))
      }),
    Spec("drop_branch",
      "drop a branch; its unreferenced version directories are deleted",
      Seq(p("table", StringType), p("branch", StringType)),
      out("branch" -> StringType, "status" -> StringType),
      (cat, s, in) => {
        val name = in.getUTF8String(1).toString
        Snapshots.dropBranch(s,
          cat.resolveTablePath(in.getUTF8String(0).toString), name)
        Array(new GenericInternalRow(Array[Any](utf8(name), utf8("dropped"))))
      }),
    Spec("rebase_branch",
      "move the branch's fork base to the main head (append-only histories only)",
      Seq(p("table", StringType), p("branch", StringType)),
      out("branch" -> StringType, "base" -> LongType),
      (cat, s, in) => {
        val name = in.getUTF8String(1).toString
        val base = Snapshots.rebaseBranch(s,
          cat.resolveTablePath(in.getUTF8String(0).toString), name)
        Array(new GenericInternalRow(Array[Any](utf8(name), base)))
      }),
    Spec("delete_from_branch",
      "branch-local copy-on-write DELETE of rows where the condition is true (the WAP audit-fix verb)",
      Seq(p("table", StringType), p("branch", StringType), p("condition", StringType)),
      out("branch" -> StringType, "version" -> LongType),
      (cat, s, in) => {
        val name = in.getUTF8String(1).toString
        val v = Snapshots.deleteFromBranch(s,
          cat.resolveTablePath(in.getUTF8String(0).toString), name,
          in.getUTF8String(2).toString)
        Array(new GenericInternalRow(Array[Any](utf8(name), v)))
      }),
    Spec("update_branch",
      "branch-local copy-on-write UPDATE: set column := expression on rows where the condition is true",
      Seq(p("table", StringType), p("branch", StringType),
        p("set_column", StringType), p("set_expr", StringType),
        p("condition", StringType)),
      out("branch" -> StringType, "version" -> LongType),
      (cat, s, in) => {
        val name = in.getUTF8String(1).toString
        val v = Snapshots.updateBranch(s,
          cat.resolveTablePath(in.getUTF8String(0).toString), name,
          Map(in.getUTF8String(2).toString -> in.getUTF8String(3).toString),
          in.getUTF8String(4).toString)
        Array(new GenericInternalRow(Array[Any](utf8(name), v)))
      }),
    Spec("merge_into_branch",
      "branch-local copy-on-write MERGE: keyed restatement from a source table/view (matched rows take the source row, unmatched source rows insert)",
      Seq(p("table", StringType), p("branch", StringType),
        p("source", StringType), p("keys", StringType)),
      out("branch" -> StringType, "version" -> LongType),
      (cat, s, in) => {
        val name = in.getUTF8String(1).toString
        val v = Snapshots.mergeIntoBranch(s,
          cat.resolveTablePath(in.getUTF8String(0).toString), name,
          s.table(in.getUTF8String(2).toString),
          in.getUTF8String(3).toString.split(',').map(_.trim).toSeq)
        Array(new GenericInternalRow(Array[Any](utf8(name), v)))
      }),
    Spec("init_mart",
      "build an incremental count/sum mart over a changelog-enabled base table (dims/sums are comma lists; bloom_dims additionally blooms the mart's dim columns for point-fix pruning)",
      Seq(p("base", StringType), p("mart", StringType),
        p("dims", StringType), p("sums", StringType),
        pd("band_files", IntegerType, "8"),
        pd("bloom_dims", BooleanType, "false")),
      out("mart" -> StringType, "version" -> LongType),
      (cat, s, in) => {
        val martName = in.getUTF8String(1).toString
        val martPath = cat.resolveNewTablePath(martName)
        val dims = in.getUTF8String(2).toString.split(',').map(_.trim).filter(_.nonEmpty).toSeq
        if (in.getBoolean(5)) {
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(martPath))
          BloomSkip.enable(martPath, dims)
        }
        val v = IncrementalMart.initialize(s,
          cat.resolveTablePath(in.getUTF8String(0).toString), martPath,
          dims,
          in.getUTF8String(3).toString.split(',').map(_.trim).filter(_.nonEmpty).toSeq,
          bandFiles = in.getInt(4))
        Array(new GenericInternalRow(Array[Any](utf8(martName), v)))
      }),
    Spec("refresh_mart",
      "fold base commits since the mart's recorded version into the mart — O(delta) changelog read, bounds+bloom-pruned band rewrite; -1 = base unchanged (marker read, no commit)",
      Seq(p("mart", StringType)),
      out("mart" -> StringType, "version" -> LongType),
      (cat, s, in) => {
        val martName = in.getUTF8String(0).toString
        val v = IncrementalMart.refresh(s, cat.resolveTablePath(martName))
        Array(new GenericInternalRow(Array[Any](utf8(martName), v)))
      }))

  private val byName: Map[String, Spec] = specs.map(s => s.name -> s).toMap

  def names: Seq[String] = specs.map(_.name)

  private final case class ReportScan(schema: StructType, data: Array[InternalRow])
    extends LocalScan {
    override def rows(): Array[InternalRow] = data
    override def readSchema(): StructType = schema
  }

  def load(cat: GraftCatalog, name: String): UnboundProcedure = {
    val spec = byName.getOrElse(name, throw new IllegalArgumentException(
      s"no such procedure $name (procedures: ${names.mkString(", ")})"))
    new UnboundProcedure {
      override def name(): String = spec.name
      override def description(): String = spec.description
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = spec.name
        override def description(): String = spec.description
        override def parameters(): Array[ProcedureParameter] = spec.params.toArray
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[Scan] =
          java.util.Collections.singletonList[Scan](
            ReportScan(spec.outSchema,
              spec.run(cat, SparkSession.active, input))).iterator()
      }
    }
  }
}
