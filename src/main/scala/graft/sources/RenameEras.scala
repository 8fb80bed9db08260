package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ArrayNode
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** Metadata-only `ALTER TABLE … RENAME COLUMN` over the versioned-
  * parquet store — the last schema-evolution verb (reference
  * `spark/jobs/schema_add_column.py:24-28` establishes evolution as a
  * first-class user surface; Iceberg's rename is metadata-only via
  * field IDs). This store has no field IDs, so field identity is
  * carried as a PHYSICAL-NAME HISTORY in the schema marker itself:
  * renaming `a → b` when the table's last data version is R appends
  * `{"n":"a","v":R}` to field b's `graft.names` metadata — "files of
  * origin version ≤ R call this field `a`". A file's origin version
  * parses from its path (`v=N/…`), so resolution never needs expired
  * manifests, and a compaction (full-state rewrite under CURRENT
  * names) naturally deactivates every entry for current reads while
  * time travel keeps resolving historical files forever.
  *
  * Readers apply the mapping per ERA: the read set groups by the
  * per-file `output name → physical name` signature, each group scans
  * with the SAME column order and types under its own era's names,
  * and the groups union — no row alignment needed across groups (the
  * file sets are disjoint), so this is a plain distributed union of
  * stock parquet scans, not a shuffle.
  *
  * Invariants that keep the mapping sound:
  *   - a name is never REUSED: ADD COLUMN and RENAME refuse any name
  *     some field ever used (live history or the retirement ledger
  *     `_names.json` written when a renamed field is dropped) — two
  *     fields claiming one physical column would be ambiguous;
  *   - the layout source column refuses rename (the layout marker
  *     carries the name);
  *   - rename refuses while merge-on-read delete sidecars are live
  *     and the merge-on-read DML modes refuse while rename eras are
  *     live (the positional merge scan is era-unaware by design —
  *     compaction clears either state). */
private[graft] object RenameEras {

  /** One rename step: files of origin version ≤ `lastV` carry
    * `oldName`. */
  final case class Entry(oldName: String, lastV: Long)

  /** A table's rename state: per-CURRENT-field history (entries
    * ascending by lastV) plus the retired physical names of dropped
    * renamed fields. */
  final case class Info(history: Map[String, Seq[Entry]], retired: Set[String]) {
    def isEmpty: Boolean = history.isEmpty
    def nonEmpty: Boolean = history.nonEmpty

    /** Physical name the field currently called `current` carries in
      * files of origin version `v`. */
    def nameAsOf(current: String, v: Long): String =
      history.getOrElse(current, Nil).find(v <= _.lastV)
        .map(_.oldName).getOrElse(current)

    /** The newest data version any entry covers — files above it are
      * current-named under every field. */
    def maxBoundary: Long =
      history.valuesIterator.flatten.map(_.lastV).maxOption.getOrElse(Long.MinValue)

    /** `output name → physical name` for a file of origin version
      * `fileV`, under output names as of version `outV`
      * (`Long.MaxValue` = current names). Empty = the file already
      * carries the output names. */
    def mapping(fileV: Long, outV: Long): Map[String, String] =
      history.keysIterator.flatMap { cur =>
        val out = nameAsOf(cur, outV)
        val phys = nameAsOf(cur, fileV)
        if (out == phys) None else Some(out -> phys)
      }.toMap

    /** Every physical name any field has EVER used (historical or
      * retired) — the reuse blacklist for ADD/RENAME. */
    def allHistorical: Set[String] =
      history.valuesIterator.flatten.map(_.oldName).toSet ++ retired
  }

  val Empty: Info = Info(Map.empty, Set.empty)

  private val mapper = new ObjectMapper()
  private val MetaKey = "graft.names"

  /** Parse the rename state out of a RAW (metadata-bearing) schema
    * marker plus the table's retirement ledger. */
  def fromSchema(schema: StructType, retired: Set[String]): Info = {
    val hist = schema.fields.iterator.flatMap { f =>
      if (!f.metadata.contains(MetaKey)) None
      else {
        val entries = mapper.readTree(f.metadata.getString(MetaKey)) match {
          case arr: ArrayNode =>
            arr.elements().asScala.map(e =>
              Entry(e.get("n").asText(), e.get("v").asLong())).toSeq
          case _ => Seq.empty
        }
        if (entries.isEmpty) None else Some(f.name -> entries.sortBy(_.lastV))
      }
    }.toMap
    Info(hist, retired)
  }

  /** Apply `from → to` at boundary `lastV` to a RAW schema: the field
    * renames and its history gains the entry (no entry when the table
    * has no data versions yet — no file can carry the old name). */
  def withRename(schema: StructType, from: String, to: String,
                 lastV: Option[Long]): StructType =
    StructType(schema.fields.map { f =>
      if (f.name != from) f
      else {
        val meta = lastV match {
          case None => f.metadata
          case Some(v) =>
            val prior = if (f.metadata.contains(MetaKey)) {
              mapper.readTree(f.metadata.getString(MetaKey)) match {
                case arr: ArrayNode => arr.elements().asScala.toSeq
                case _ => Seq.empty
              }
            } else Seq.empty
            val arr = mapper.createArrayNode()
            prior.foreach(arr.add)
            val e = arr.addObject(); e.put("n", from); e.put("v", v); ()
            new MetadataBuilder().withMetadata(f.metadata)
              .putString(MetaKey, mapper.writeValueAsString(arr)).build()
        }
        StructField(to, f.dataType, f.nullable, meta)
      }
    })

  /** Historical entries of one RAW field (empty for never-renamed). */
  def entriesOf(f: StructField): Seq[String] =
    if (!f.metadata.contains(MetaKey)) Seq.empty
    else mapper.readTree(f.metadata.getString(MetaKey)) match {
      case arr: ArrayNode => arr.elements().asScala.map(_.get("n").asText()).toSeq
      case _ => Seq.empty
    }

  /** Origin version of a data file path — the LAST `v=N` segment
    * (data files live inside their version directory; carried refs
    * keep the segment). */
  def fileVersionOf(path: String): Long = {
    val m = "/v=(\\d+)/".r.findAllMatchIn("/" + path + "/").toSeq
    require(m.nonEmpty, s"not a versioned data file path: $path")
    m.last.group(1).toLong
  }

  // ---- the retirement ledger (`_names.json`) ------------------------

  private def ledger(table: String) = Paths.get(table, "_names.json")

  def retiredOf(table: String): Set[String] = {
    val p = ledger(table)
    if (!Files.isRegularFile(p)) Set.empty
    else mapper.readTree(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
      .get("retired") match {
      case arr: ArrayNode => arr.elements().asScala.map(_.asText()).toSet
      case _ => Set.empty
    }
  }

  /** Permanently retire physical names (a dropped renamed field's
    * whole name lineage): old files still carry those columns, so a
    * future field reusing one would silently resurrect dead values. */
  def retire(table: String, names: Set[String]): Unit = {
    if (names.isEmpty) return
    val all = retiredOf(table) ++ names
    val root = mapper.createObjectNode()
    val arr = root.putArray("retired")
    all.toSeq.sorted.foreach(arr.add)
    Files.write(ledger(table),
      mapper.writeValueAsString(root).getBytes(StandardCharsets.UTF_8))
    ()
  }

  /** Translate filter/pruning expressions into a file's era: every
    * attribute renamed to the name the file physically carries.
    * Missing-column lookups in the stats algebra stay conservative,
    * so translation only ever IMPROVES pruning exactness. */
  def translate(exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
                mapping: Map[String, String])
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
    if (mapping.isEmpty) exprs
    else exprs.map(_.transform {
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference
        if mapping.contains(a.name) => a.withName(mapping(a.name))
    })

  /** A schema's fields renamed into an era (same order, same types —
    * the positional contract every era union relies on). */
  def physicalSchema(output: StructType, mapping: Map[String, String]): StructType =
    if (mapping.isEmpty) output
    else StructType(output.fields.map(f =>
      f.copy(name = mapping.getOrElse(f.name, f.name))))
}
