package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTAL VIEW MAINTENANCE off the changelog — the materialized-
  * view refresh loop every serving mart wants at 100 TB: instead of
  * rebuilding `SELECT dims…, count(*), sum(m)… GROUP BY dims` from the
  * full base table on every pipeline run, `refresh` folds only the
  * base commits SINCE the mart's recorded version through the additive
  * delta algebra (INSERT/UPDATE_post add a row's weight, DELETE/
  * UPDATE_pre subtract it — the classic counting algebra of
  * self-maintainable aggregate views) and merges the touched groups
  * into the mart with a bounds+bloom-pruned copy-on-write commit.
  * Delta CDF + MERGE pipelines and Materialize-style IVM are the
  * public shapes; here the whole loop is one library verb over the
  * versioned store's own changelog ([[Changelog]]).
  *
  * Cost model, by construction: the changelog read is O(changed rows
  * in range) — the base table is NEVER rescanned (plain appends serve
  * their delta directory as constant-INSERT, zero capture cost); the
  * mart commit rewrites only files that can host a touched group
  * (manifest bounds + bloom file skipping — a mart banded or bloom'd
  * on its dims carries everything else by reference). A no-change
  * refresh is a marker read: no Spark job, no commit.
  *
  * Maintainable aggregates: `count(*)` plus `sum` of integral
  * measures (additive, sign-invertible). Each sum travels with a
  * `nn_<m>` non-null count — the additive algebra alone cannot tell
  * "sums to 0" from "no non-null values" (SQL sum of an all-NULL
  * group is NULL), so the companion keeps sums NULL-exact under any
  * retraction history. `min/max` are NOT self-maintainable under
  * deletes (a retracted extremum needs a rescan of its group) —
  * refused at [[initialize]] by taking only sum columns. Groups whose
  * count reaches zero DROP from the mart (never a count-0 tombstone
  * row).
  *
  * Correctness spine: the mart after any refresh sequence is
  * bit-identical to a full rebuild at the same base version — the
  * oracle row replays exactly that from the lakehouse's source
  * tables, and the no-resurrection/pairing guarantees come from the
  * changelog's own invariants (ChangelogSpec's replay pin). */
object IncrementalMart {

  /** The mart's maintenance state: which base table and version it
    * reflects, and its group/measure shape. */
  final case class State(baseTable: String, baseVersion: Long,
                         dims: Seq[String], sums: Seq[String])

  private def marker(mart: String) = Paths.get(mart, "_ivm.json")

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** The mart's CRASH-SAFE reflected base version: the higher of the
    * marker and the manifest stream-batch ledger. Every refresh commit
    * carries `(ivm.<base-id>, foldedBaseVersion)` in the mart manifest
    * itself — the same exactly-once ledger the streaming writers use —
    * so a crash AFTER the commit but BEFORE the marker write cannot
    * make the next refresh re-fold (and double-apply) the same range:
    * the ledger already says the commit reflects `head`. */
  def stateOf(mart: String): Option[State] = {
    val p = marker(mart)
    // None means exactly "never initialized". An UNREADABLE marker or
    // ledger throws instead — mapping it to None would make refresh
    // say "run initialize first", and re-initializing over a live
    // mart (bypassing the crash ledger) is the one wrong remedy.
    if (!Files.isRegularFile(p)) return None
    val root =
      try mapper.readTree(Files.readString(p))
      catch { case NonFatal(e) => throw new IllegalStateException(
        s"unreadable incremental-mart marker $p — fix or remove it " +
          "(do NOT re-initialize over a live mart)", e) }
    import scala.jdk.CollectionConverters._
    def arr(f: String) = root.get(f).elements().asScala.map(_.asText()).toSeq
    val st = State(root.get("base").asText(), root.get("base_version").asLong(),
      arr("dims"), arr("sums"))
    val ledger = Snapshots.committedStreamBatch(mart, streamId(st.baseTable))
      .getOrElse(-1L)
    Some(if (ledger > st.baseVersion) st.copy(baseVersion = ledger) else st)
  }

  /** Stable per-base stream id for the mart's manifest ledger. */
  private def streamId(base: String): String =
    "ivm." + org.apache.commons.codec.digest.DigestUtils
      .md5Hex(Paths.get(base).toAbsolutePath.toString).take(12)

  private def writeState(mart: String, st: State): Unit = {
    val root = mapper.createObjectNode()
    root.put("base", st.baseTable)
    root.put("base_version", st.baseVersion)
    val d = root.putArray("dims"); st.dims.foreach(d.add)
    val s = root.putArray("sums"); st.sums.foreach(s.add)
    Files.write(marker(mart),
      mapper.writeValueAsString(root).getBytes(StandardCharsets.UTF_8))
    ()
  }

  /** Mart column names: dims…, row_count, sum_<m>… */
  private def sumCol(m: String) = s"sum_$m"

  /** Run `body` with AQE partition coalescing off: the mart's band
    * files ARE the pruning unit, so an explicit `repartition(n, dim)`
    * must land as n files even when each band is tiny (at production
    * scale bands exceed the advisory size and AQE wouldn't merge them
    * — this pins the same layout at any size). Restores the prior
    * setting afterwards. */
  private def withExactBanding[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try body
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Per-measure NON-NULL count column — the maintenance companion
    * every sum needs: the additive algebra cannot distinguish "sums
    * to 0" from "no non-null values" (SQL sum of an all-NULL group is
    * NULL), so the mart carries `nn_<m>` and surfaces `sum_<m>` as
    * NULL exactly when its non-null count is zero — bit-identical to
    * a rebuild under any retraction history. */
  private def nnCol(m: String) = s"nn_$m"

  /** The full rebuild shape AT A PINNED VERSION (never `readLatest`:
    * a base commit racing initialize would bake data the marker does
    * not account for, double-applying it on the first refresh). */
  private def fullAggregate(spark: SparkSession, base: String, v: Long,
                            dims: Seq[String], sums: Seq[String]): DataFrame =
    Snapshots.readAsOf(spark, base, v)
      .groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as("row_count"),
        sums.flatMap(m => Seq(sum(col(m)).as(sumCol(m)),
          count(col(m)).as(nnCol(m)))): _*)

  /** Build the mart from scratch at the base's current version and
    * record the maintenance state. `bandFiles` hash-clusters the mart
    * by its first dim into that many files so later refreshes can
    * carry untouched bands by reference; pair it with
    * `BloomSkip.enable(mart, dims)` when the dims are hash-shaped.
    * Returns the mart's snapshot version. */
  def initialize(spark: SparkSession, base: String, mart: String,
                 dims: Seq[String], sums: Seq[String],
                 bandFiles: Int = 8): Long = {
    require(dims.nonEmpty, "incremental mart needs at least one group column")
    require(Changelog.keysOf(base).nonEmpty,
      s"incremental mart over $base: the base table is not changelog-enabled " +
        "(Changelog.enableChangelog / TBLPROPERTIES 'graft.changelog.keys') — " +
        "refresh() folds t.changes, which must capture every DML from here on")
    val head = Snapshots.versions(base).lastOption.getOrElse(
      throw new IllegalArgumentException(s"incremental mart over $base: no snapshots"))
    val full = fullAggregate(spark, base, head, dims, sums)
      .repartition(bandFiles, col(dims.head))
    val v = withExactBanding(spark) {
      Snapshots.writeSnapshot(full, mart, operation = "overwrite")
    }
    writeState(mart, State(base, head, dims, sums))
    v
  }

  /** Fold base commits `(recorded, head]` into the mart. Returns the
    * new mart version, or -1 when the base has not advanced (a marker
    * read — no job, no commit). */
  def refresh(spark: SparkSession, mart: String): Long = {
    val st = stateOf(mart).getOrElse(throw new IllegalStateException(
      s"$mart is not an incremental mart — run IncrementalMart.initialize first"))
    val head = Snapshots.versions(st.baseTable).lastOption.getOrElse(
      throw new IllegalStateException(s"base table ${st.baseTable} has no snapshots"))
    require(head >= st.baseVersion,
      s"base table ${st.baseTable} went backwards (marker v${st.baseVersion}, head v$head)")
    if (head == st.baseVersion) return -1L
    val ch = Changelog.readRange(spark, st.baseTable, st.baseVersion, head)
    // compact-only / zero-change ranges: advance the marker, commit
    // nothing (a refresh over a quiet base stays a metadata read)
    if (ch.limit(1).count() == 0) {
      writeState(mart, st.copy(baseVersion = head)); return -1L
    }
    // the additive delta algebra: +1 weight for arriving rows, -1 for
    // retracted pre-images; identical pre/post pairs were already
    // netted out by the capture, so every change row carries signal.
    // The grouped delta is CACHED for the refresh: the null probe, the
    // key envelope, its gated collect, and the merge all consume it —
    // without the cache each would re-read the capture files and
    // re-shuffle the same aggregation.
    val w = when(col(Changelog.TypeCol).isin("INSERT", "UPDATE_post"), 1L)
      .otherwise(-1L)
    val delta = ch.groupBy(st.dims.map(col): _*)
      .agg(sum(w).as("__dcnt"),
        st.sums.flatMap(m => Seq(
          sum(col(m) * w).as(s"__d_$m"),
          sum(when(col(m).isNotNull, w).otherwise(0L)).as(s"__dnn_$m"))): _*)
      .persist()
    try refreshWith(spark, mart, st, head, delta)
    finally { delta.unpersist(); () }
  }

  private def refreshWith(spark: SparkSession, mart: String, st: State,
                          head: Long, delta: DataFrame): Long = {
    // merge: touched groups take (old + delta), zero-count groups drop
    val martSchema = Snapshots.declaredCleanOf(mart).getOrElse(
      Snapshots.readLatest(spark, mart).schema)
    val martHead = Snapshots.versions(mart).last
    val priorDels = Snapshots.liveDeletes(mart, martHead)
    val priorEqs = Snapshots.liveEqDeletes(mart, martHead)
    val touchedKeys = delta.select(st.dims.map(col): _*)
    // a NULL dim value is a REAL group (groupBy keeps it) that the
    // bounds algebra cannot see (comparisons never match NULL rows) —
    // pruning would carry the NULL group's host file while the merge
    // rewrites the group elsewhere, duplicating it. Conservative: any
    // NULL touched dim disables pruning for this refresh (rare — dims
    // are usually derived non-null).
    val nullTouched = touchedKeys
      .filter(st.dims.map(col(_).isNull).reduceLeft(_ or _))
      .limit(1).count() > 0
    val envelope =
      if (nullTouched) Nil
      else Snapshots.keyEnvelope(touchedKeys, st.dims, martSchema)
    val comps = Snapshots.stateComponents(mart, martHead)
    val statless = comps.collect { case Left(d) => d }.flatMap(Snapshots.expandParquet)
    val stated = comps.collect { case Right(x) => x }
    // bounds + bloom: only files that can host a touched group rewrite
    val bloomAbsent = BloomSkip.provablyAbsent(mart, stated.collect {
      case (p, fs) if envelope.isEmpty || FileStats.mayMatch(fs, envelope) => p
    }, envelope)
    val carried = stated.collect {
      case (p, fs) if (envelope.nonEmpty && !FileStats.mayMatch(fs, envelope)) ||
        bloomAbsent.contains(p) =>
        fs.copy(name = Snapshots.rootRel(mart, p))
    }
    val rewrite = statless ++ stated.collect {
      case (p, fs) if !bloomAbsent.contains(p) &&
        (envelope.isEmpty || FileStats.mayMatch(fs, envelope)) => p
    }
    val outCols = martSchema.fieldNames.toSeq
    val current =
      if (rewrite.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], martSchema)
      else {
        val reader = spark.read.option("mergeSchema", "true")
        Snapshots.applyAllDeletes(
          reader.schema(martSchema).parquet(rewrite: _*),
          mart, priorDels, priorEqs).select(outCols.map(col): _*)
      }
    // groups in the rewrite set but untouched carry through unchanged;
    // touched groups merge additively (a group absent from the mart
    // starts at 0); groups whose count lands on 0 drop. NULL-SAFE
    // group pairing: a NULL dim group must pair with itself (plain
    // SQL equality would keep both sides, duplicating the group).
    val cur = current.alias("c")
    val del = delta.alias("d")
    val pairCond = st.dims.map(d0 => col(s"c.$d0") <=> col(s"d.$d0"))
      .reduceLeft(_ && _)
    val merged = cur.join(del, pairCond, "full_outer")
      .select((st.dims.map(d0 => coalesce(col(s"c.$d0"), col(s"d.$d0")).as(d0)) ++ Seq(
        (coalesce(col("c.row_count"), lit(0L)) + coalesce(col("d.__dcnt"), lit(0L)))
          .as("row_count")) ++
        st.sums.flatMap { m =>
          // a sum is NULL exactly when its non-null count is zero — the
          // nn companion is what lets "retracted back to all-NULL"
          // surface as NULL like a rebuild would, not as 0
          val nn = coalesce(col(s"c.${nnCol(m)}"), lit(0L)) +
            coalesce(col(s"d.__dnn_$m"), lit(0L))
          Seq(
            when(nn > 0,
              coalesce(col(s"c.${sumCol(m)}"), lit(0L)) +
                coalesce(col(s"d.__d_$m"), lit(0L))).as(sumCol(m)),
            nn.as(nnCol(m)))
        }): _*)
      .filter(col("row_count") > 0)
      .select(outCols.map(col): _*)
    val v = Snapshots.reserveVersion(mart)
    try {
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      withExactBanding(spark) {
        merged.repartition(math.max(1, rewrite.size + 1), col(st.dims.head))
          .write.mode("append").option("compression", "snappy")
          .options(BloomSkip.writerOptions(mart, merged.schema))
          .parquet(s"$mart/v=$v")
      }
      Snapshots.commitCow(spark, mart, v, "merge", carried,
        deletes = MorDeletes.retarget(priorDels, carried.map(_.name).toSet),
        eqDeletes = Snapshots.survivingEqEntries(priorEqs, carried),
        basedOn = Some(martHead),
        // the folded base version rides the mart manifest (crash-safe
        // marker — see stateOf)
        streamTag = Some((streamId(st.baseTable), head)))
      writeState(mart, st.copy(baseVersion = head))
      v
    } catch {
      case NonFatal(e) => Snapshots.releaseVersion(mart, v); throw e
    }
  }
}
