package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.util.control.NonFatal

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, StructType}

/** INCREMENTAL VIEW MAINTENANCE off the changelog — the materialized-
  * view refresh loop every serving mart wants at 100 TB: instead of
  * rebuilding `SELECT dims…, count(*), sum(e)…, count(distinct e)…
  * GROUP BY dims` from the full base table on every pipeline run,
  * `refresh` folds only the base commits SINCE the mart's recorded
  * version through the additive delta algebra (INSERT/UPDATE_post add
  * a row's weight, DELETE/UPDATE_pre subtract it — the classic
  * counting algebra of self-maintainable aggregate views) and merges
  * the touched groups into the mart with a bounds+bloom-pruned
  * copy-on-write commit. Delta CDF + MERGE pipelines and
  * Materialize-style IVM are the public shapes; here the whole loop is
  * one library verb over the versioned store's own changelog
  * ([[Changelog]]).
  *
  * Measures are SQL EXPRESSIONS over the base row, not just columns —
  * `SUM(CASE WHEN event_type = 'purchase' THEN price ELSE 0 END)` and
  * `COUNT(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id
  * END)` are the shapes the reference's own gold models lean on
  * (reference `dbt/models/gold/core/gold_daily_sales_summary.sql:17,30`,
  * `gold/core/gold_category_performance.sql:18-21`), and a
  * [[MartDef.filter]] pins the model's WHERE clause (filters are
  * trivially maintainable: each change row passes or not with its own
  * weight, so an UPDATE moving a row across the filter boundary folds
  * as a one-sided insert or delete).
  *
  * Cost model, by construction: the changelog read is O(changed rows
  * in range) — the base table is NEVER rescanned (plain appends serve
  * their delta directory as constant-INSERT, zero capture cost); the
  * mart commit rewrites only files that can host a touched group
  * (manifest bounds + bloom file skipping — a mart banded or bloom'd
  * on its dims carries everything else by reference). A no-change
  * refresh is a marker read: no Spark job, no commit.
  *
  * Maintainable aggregates:
  *  - `count(*)` — the group's weight sum.
  *  - `sum(expr)` of EXACT types (integral / DECIMAL — additive,
  *    sign-invertible). Float/Double sums are REFUSED at
  *    [[initialize]]: FP addition is not associative, so `+x` then
  *    `-x` need not restore the prior sum and a refresh would drift
  *    from the rebuild silently — cast the measure to DECIMAL
  *    instead (exact, and bit-identical to the rebuild's own DECIMAL
  *    sum). Each sum travels with an `nn_<m>` non-null count — the
  *    additive algebra alone cannot tell "sums to 0" from "no
  *    non-null values" (SQL sum of an all-NULL group is NULL), so the
  *    companion keeps sums NULL-exact under any retraction history.
  *  - `count(distinct expr)` — NOT additively maintainable from the
  *    mart row alone (retracting one of two occurrences must not
  *    decrement), but exactly maintainable with per-(group, value)
  *    multiplicity side state: the standard counting-algebra
  *    extension. Each distinct measure keeps a versioned side table
  *    under `<mart>/_dstate/<name>` holding (dims…, value,
  *    row_count); a refresh folds the change rows' (group, value)
  *    weights into it, and the mart's `cd_<name>` moves by the number
  *    of values whose multiplicity crossed 0 upward minus those that
  *    crossed to 0 (NULL values are ignored, matching SQL
  *    `COUNT(DISTINCT …)`). The side state is O(distinct (group,
  *    value) pairs) — the same magnitude a rebuild's distinct
  *    aggregation shuffles EVERY night, paid once here and then
  *    maintained by touched bands.
  *  - `min/max` are NOT self-maintainable under deletes (a retracted
  *    extremum needs a rescan of its group) — not offered; derive
  *    order statistics at serve time from a maintained finer-grained
  *    mart (the decomposition [[graftRef gold_category_performance]]'s
  *    top-brand window takes: maintain the (dims, brand) revenue
  *    mart, argmax over mart-sized data at read).
  *
  * Groups whose count reaches zero DROP from the mart (never a
  * count-0 tombstone row), and side-state values at multiplicity zero
  * drop the same way.
  *
  * Crash model: a refresh targets ONE base version `target` and
  * commits, in order, each distinct side table (manifest stream-ledger
  * tag `(ivm.<base-id>, target)`), then the mart (same tag), then the
  * `_ivm.json` marker. Every surface is a versioned table whose
  * commit carries the ledger tag, so any crash point is recoverable:
  * a surface whose ledger already reads `target` is SKIPPED on
  * replay, and the transitions a skipped side commit would have
  * produced are recomputed from its pre-commit version (time travel —
  * the side table is a snapshot table like any other). When ledgers
  * are ahead of the marker, [[refresh]] first COMPLETES the in-flight
  * target before advancing toward the head, so a crashed refresh can
  * never smear two ranges into one fold.
  *
  * Correctness spine: the mart after any refresh sequence is
  * bit-identical to a full rebuild at the same base version — the
  * oracle rows replay exactly that from the lakehouse's source
  * tables, and the no-resurrection/pairing guarantees come from the
  * changelog's own invariants (ChangelogSpec's replay pin). */
object IncrementalMart {

  /** One named measure: `expr` is a SQL expression over the base
    * table's columns, `name` the mart column suffix (`sum_<name>` /
    * `nn_<name>` for sums, `cd_<name>` for distincts). */
  final case class Measure(name: String, expr: String)

  /** The mart's definition: group columns, sum measures, distinct
    * measures, and an optional SQL filter over the base rows. */
  final case class MartDef(dims: Seq[String], sums: Seq[Measure] = Nil,
                           distincts: Seq[Measure] = Nil,
                           filter: Option[String] = None)

  /** The mart's maintenance state: which base table and version it
    * reflects, and its definition. */
  final case class State(baseTable: String, baseVersion: Long, defn: MartDef)

  private def marker(mart: String) = Paths.get(mart, "_ivm.json")

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** The mart's CRASH-SAFE reflected base version: the highest of the
    * marker and the manifest stream-batch ledgers of the mart and its
    * distinct side tables (see the crash model above — the marker is
    * written last, so a ledger ahead of it marks an in-flight refresh
    * whose committed surfaces must not re-fold). */
  def stateOf(mart: String): Option[State] = rawStateOf(mart).map { st =>
    val ledgers = surfaceLedgers(mart, st)
    val v = (ledgers.flatten :+ st.baseVersion).max
    st.copy(baseVersion = v)
  }

  /** Ledger positions of every committed surface: the mart itself,
    * then one per distinct side table (order = definition order). */
  private def surfaceLedgers(mart: String, st: State): Seq[Option[Long]] =
    Snapshots.committedStreamBatch(mart, streamId(st.baseTable)) +:
      st.defn.distincts.map(d =>
        Snapshots.committedStreamBatch(sidePath(mart, d.name), streamId(st.baseTable)))

  /** The marker exactly as written (no ledger folding) — refresh's
    * recovery logic needs marker and ledgers separately. */
  private def rawStateOf(mart: String): Option[State] = {
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
    def strs(f: String): Seq[String] =
      Option(root.get(f)).toSeq.flatMap(_.elements().asScala.map(_.asText()).toSeq)
    // measures serialize as {name, expr} objects; a plain string (the
    // pre-r18 marker shape) is a column measure (name = expr = column)
    def measures(f: String): Seq[Measure] =
      Option(root.get(f)).toSeq.flatMap(_.elements().asScala.map { n =>
        if (n.isTextual) Measure(n.asText(), n.asText())
        else Measure(n.get("name").asText(), n.get("expr").asText())
      }.toSeq)
    val filter = Option(root.get("filter")).filterNot(_.isNull).map(_.asText())
    Some(State(root.get("base").asText(), root.get("base_version").asLong(),
      MartDef(strs("dims"), measures("sums"), measures("distincts"), filter)))
  }

  /** Stable per-base stream id for the refresh ledger tags. */
  private def streamId(base: String): String =
    "ivm." + org.apache.commons.codec.digest.DigestUtils
      .md5Hex(Paths.get(base).toAbsolutePath.toString).take(12)

  private def writeState(mart: String, st: State): Unit = {
    val root = mapper.createObjectNode()
    root.put("base", st.baseTable)
    root.put("base_version", st.baseVersion)
    val d = root.putArray("dims"); st.defn.dims.foreach(d.add)
    def measureArr(f: String, ms: Seq[Measure]): Unit = {
      val a = root.putArray(f)
      ms.foreach { m =>
        val o = a.addObject(); o.put("name", m.name); o.put("expr", m.expr); ()
      }
    }
    measureArr("sums", st.defn.sums)
    measureArr("distincts", st.defn.distincts)
    st.defn.filter.foreach(root.put("filter", _))
    Files.write(marker(mart),
      mapper.writeValueAsString(root).getBytes(StandardCharsets.UTF_8))
    ()
  }

  /** Mart column names: dims…, row_count, sum_<m>/nn_<m>…, cd_<d>… */
  private def sumCol(m: String) = s"sum_$m"

  /** Per-measure NON-NULL count column — the maintenance companion
    * every sum needs (see the NULL-exactness contract above). */
  private def nnCol(m: String) = s"nn_$m"

  /** Distinct-count column of measure `d`. */
  private def cdCol(d: String) = s"cd_$d"

  /** Side-state table of distinct measure `name` — a versioned
    * snapshot table under the mart's own directory (invisible to the
    * mart's data plane: readers list `v=N` directories and manifests,
    * orphan cleanup touches only version/staging trees). */
  private def sidePath(mart: String, name: String): String =
    Paths.get(mart, "_dstate", name).toString

  /** The side table's value column (the distinct expression's value —
    * a fixed internal name so any expression shape fits the schema). */
  private val DValCol = "__dval"

  /** Delta row cap under which the merge broadcasts the delta side
    * instead of shuffling (the stats job counts the delta exactly, so
    * the choice is measurement-driven, not estimate-driven). Grouped
    * delta rows are narrow; the default keeps broadcasts in the
    * low-MB range. */
  private def broadcastDeltaRows(spark: SparkSession): Long =
    spark.conf.get("spark.graft.ivm.broadcastDeltaRows", "100000").toLong

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

  private def filtered(df: DataFrame, defn: MartDef): DataFrame =
    defn.filter.map(f => df.filter(expr(f))).getOrElse(df)

  /** Column-measure convenience (the pre-r18 surface): each `sums`
    * entry is a plain base column summed as `sum_<col>`. */
  def initialize(spark: SparkSession, base: String, mart: String,
                 dims: Seq[String], sums: Seq[String],
                 bandFiles: Int = 8): Long =
    initialize(spark, base, mart, MartDef(dims, sums.map(c => Measure(c, c))),
      bandFiles)

  /** Build the mart (and the side table of every distinct measure)
    * from scratch at the base's current version and record the
    * maintenance state. `bandFiles` hash-clusters the mart by its
    * first dim into that many files so later refreshes can carry
    * untouched bands by reference; pair it with
    * `BloomSkip.enable(mart, dims)` when the dims are hash-shaped.
    * Returns the mart's snapshot version. */
  def initialize(spark: SparkSession, base: String, mart: String,
                 defn: MartDef, bandFiles: Int): Long = {
    require(defn.dims.nonEmpty, "incremental mart needs at least one group column")
    require(Changelog.keysOf(base).nonEmpty,
      s"incremental mart over $base: the base table is not changelog-enabled " +
        "(Changelog.enableChangelog / TBLPROPERTIES 'graft.changelog.keys') — " +
        "refresh() folds t.changes, which must capture every DML from here on")
    val names = defn.sums.map(m => sumCol(m.name)) ++
      defn.sums.map(m => nnCol(m.name)) ++ defn.distincts.map(d => cdCol(d.name))
    (defn.sums ++ defn.distincts).foreach(m =>
      require(m.name.matches("[A-Za-z0-9_]+"),
        s"measure name must be a plain identifier: '${m.name}'"))
    require((defn.dims ++ names :+ "row_count").distinct.size ==
      defn.dims.size + names.size + 1,
      s"mart columns collide: dims=${defn.dims.mkString(",")} measures=" +
        (defn.sums ++ defn.distincts).map(_.name).mkString(","))
    val head = Snapshots.versions(base).lastOption.getOrElse(
      throw new IllegalArgumentException(s"incremental mart over $base: no snapshots"))
    // read AT THE PINNED head version (never `readLatest`: a base
    // commit racing initialize would bake data the marker does not
    // account for, double-applying it on the first refresh); one base
    // scan serves every side-state build AND the full aggregate (r19,
    // guide §1.2: was one scan per distinct measure plus one for the
    // mart) — unpersisted before returning
    val baseRows = filtered(Snapshots.readAsOf(spark, base, head), defn).persist()
    // float/double sums refused LOUDLY at definition time: the whole
    // contract is "bit-identical to a rebuild", and FP addition breaks
    // it silently (non-associative; +x then -x need not restore)
    defn.sums.foreach { m =>
      baseRows.select(expr(m.expr).as("x")).schema.head.dataType match {
        case FloatType | DoubleType => throw new IllegalArgumentException(
          s"incremental mart sum measure '${m.name}' (${m.expr}) resolves to a " +
            "floating-point type — FP addition is not associative, so a refresh " +
            "would drift from a full rebuild silently. Cast the measure to " +
            "DECIMAL (exact, sign-invertible) or an integral type.")
        case _ => ()
      }
    }
    // side state first, mart second, marker last (the marker is the
    // "initialize completed" commit point — a crash in between leaves
    // re-runnable overwrites and no marker)
    //
    // the mart's bloom spec PROPAGATES to side tables on the shared
    // dim columns: a side table is keyed (dims…, value) and its merge
    // prunes exactly like the mart's, so the same point-fix refresh
    // that rewrites one mart band should rewrite one side band too
    val martBloomDims = BloomSkip.specOf(mart).toSeq
      .flatMap(_.columns).filter(defn.dims.contains)
    try {
      defn.distincts.foreach { d =>
        if (martBloomDims.nonEmpty) {
          Files.createDirectories(Paths.get(sidePath(mart, d.name)))
          BloomSkip.enable(sidePath(mart, d.name), martBloomDims)
        }
        val sd = baseRows
          .select(defn.dims.map(col) :+ expr(d.expr).as(DValCol): _*)
          .filter(col(DValCol).isNotNull)
          .groupBy((defn.dims :+ DValCol).map(col): _*)
          .agg(count(lit(1)).as("row_count"))
          .repartition(bandFiles, col(defn.dims.head))
        withExactBanding(spark) {
          Snapshots.writeSnapshot(sd, sidePath(mart, d.name), operation = "overwrite")
        }
      }
      val full = baseRows.groupBy(defn.dims.map(col): _*)
        .agg(count(lit(1)).as("row_count"),
          defn.sums.flatMap(m => Seq(sum(expr(m.expr)).as(sumCol(m.name)),
            count(expr(m.expr)).as(nnCol(m.name)))) ++
            defn.distincts.map(d =>
              countDistinct(expr(d.expr)).as(cdCol(d.name))): _*)
        .repartition(bandFiles, col(defn.dims.head))
      val v = withExactBanding(spark) {
        Snapshots.writeSnapshot(full, mart, operation = "overwrite")
      }
      writeState(mart, State(base, head, defn))
      v
    } finally { baseRows.unpersist(); () }
  }

  /** Fold base commits `(recorded, head]` into the mart (completing
    * any crashed in-flight refresh first — see the crash model).
    * Returns the newest mart version committed, or -1 when the base
    * has not advanced (a marker read — no job, no commit). */
  def refresh(spark: SparkSession, mart: String): Long = {
    var last = -1L
    var go = true
    while (go) {
      val (v, finished) = refreshStep(spark, mart)
      if (v >= 0) last = v
      go = !finished
    }
    last
  }

  /** One refresh step toward the head: picks the target version (an
    * in-flight crashed target if any ledger is ahead of the marker,
    * else the base head), folds exactly `(marker, target]`, and
    * reports whether the head is reached. */
  private def refreshStep(spark: SparkSession, mart: String): (Long, Boolean) = {
    val st = rawStateOf(mart).getOrElse(throw new IllegalStateException(
      s"$mart is not an incremental mart — run IncrementalMart.initialize first"))
    val head = Snapshots.versions(st.baseTable).lastOption.getOrElse(
      throw new IllegalStateException(s"base table ${st.baseTable} has no snapshots"))
    require(head >= st.baseVersion,
      s"base table ${st.baseTable} went backwards (marker v${st.baseVersion}, head v$head)")
    val ledgers = surfaceLedgers(mart, st).flatten
    ledgers.foreach(l => require(l <= head,
      s"$mart ledger reflects base v$l beyond head v$head — base went backwards"))
    val pending = ledgers.filter(_ > st.baseVersion)
    val target = if (pending.nonEmpty) pending.max else head
    if (target == st.baseVersion) return (-1L, true)
    val v = foldRange(spark, mart, st, target)
    (v, target == head)
  }

  /** Fold `(st.baseVersion, target]` into every surface, skipping
    * surfaces whose ledger already reads `target`, then advance the
    * marker. Returns the mart version committed (-1 for marker-only
    * advances). */
  private def foldRange(spark: SparkSession, mart: String, st: State,
                        target: Long): Long = {
    val defn = st.defn
    val sid = streamId(st.baseTable)
    val ch = filtered(
      Changelog.readRange(spark, st.baseTable, st.baseVersion, target), defn)
      .persist()
    try {
      // r19 (guide §1.2): no separate changelog emptiness probe — a
      // compact-only / zero-change range surfaces as an empty mart
      // delta in the ONE stats job below (marker advances, nothing
      // commits, exactly as before)
      // the additive delta algebra: +1 weight for arriving rows, -1
      // for retracted pre-images; identical pre/post pairs were
      // already netted out by the capture
      val w = when(col(Changelog.TypeCol).isin("INSERT", "UPDATE_post"), 1L)
        .otherwise(-1L)
      // distinct measures first: each side table folds its (group,
      // value) multiplicity delta, and the multiplicity transitions
      // across zero become the mart's distinct-count delta
      val dcdFrames = defn.distincts.map(d => distinctDelta(
        spark, mart, st, d, ch, w, sid, target))
      val martDelta0 = ch.groupBy(defn.dims.map(col): _*)
        .agg(sum(w).as("__dcnt"),
          defn.sums.flatMap(m => Seq(
            sum(expr(m.expr) * w).as(s"__d_${m.name}"),
            sum(when(expr(m.expr).isNotNull, w).otherwise(0L))
              .as(s"__dnn_${m.name}"))): _*)
      // graft the per-distinct deltas on (null-safe: a NULL dim is a
      // real group). Every dcd group also has a martDelta0 group (its
      // transition rows came from the same change rows), so LEFT is
      // exact.
      val mdelta0 = dcdFrames.foldLeft(martDelta0) { (acc, f) =>
        val a = acc.alias("a"); val b = f.alias("b")
        val cond = defn.dims.map(k => col(s"a.$k") <=> col(s"b.$k"))
          .reduceLeft(_ && _)
        a.join(b, cond, "left").select(
          acc.columns.map(c => col(s"a.$c")) :+
            col("b." + f.columns.last): _*)
      }
      // net-zero groups (an UPDATE that left every measure unchanged)
      // would force band rewrites for nothing — drop them
      val nonzero = (col("__dcnt") =!= 0L) +:
        (defn.sums.flatMap(m => Seq(
          coalesce(col(s"__d_${m.name}"), lit(0)) =!= 0,
          col(s"__dnn_${m.name}") =!= 0L)) ++
          defn.distincts.map(d => coalesce(col(s"__dcd_${d.name}"), lit(0L)) =!= 0L))
      val mdelta = mdelta0.filter(nonzero.reduceLeft(_ or _)).persist()
      try {
        val already = Snapshots.committedStreamBatch(mart, sid).exists(_ >= target)
        // r19: ONE stats job (count + null-dim flags + envelope)
        // replaces the delta emptiness probe and the merge's own
        // null-probe + envelope aggregations (guide §1.2)
        val stats =
          if (already) None else Some(Snapshots.keyStats(mdelta, defn.dims))
        val v =
          if (already || stats.exists(_.count == 0L)) -1L
          else mergeAdditive(spark, mart, defn.dims,
            defn.sums.map(_.name), defn.distincts.map(_.name), mdelta,
            (sid, target), stats)
        writeState(mart, st.copy(baseVersion = target))
        v
      } finally { mdelta.unpersist(); () }
    } finally { ch.unpersist(); () }
  }

  /** Maintain distinct measure `d` for this fold: compute the (dims,
    * value) multiplicity delta from the change rows, read the side
    * table's PRE-fold state (current state normally; the version
    * before the tagged commit when a crashed run already committed
    * it), merge the delta in (unless already committed), and return
    * the mart's per-group distinct-count delta `(dims…,
    * __dcd_<name>)` from the multiplicity transitions across zero. */
  private def distinctDelta(spark: SparkSession, mart: String, st: State,
                            d: Measure, ch: DataFrame, w: Column,
                            sid: String, target: Long): DataFrame = {
    val dims = st.defn.dims
    val side = sidePath(mart, d.name)
    val dDelta = ch
      .select(dims.map(col) :+ expr(d.expr).as(DValCol) :+ w.as("__w"): _*)
      .filter(col(DValCol).isNotNull) // COUNT(DISTINCT) ignores NULLs
      .groupBy((dims :+ DValCol).map(col): _*)
      .agg(sum(col("__w")).as("__dcnt"))
      .filter(col("__dcnt") =!= 0L)
      .persist()
    try {
      val keyCols = dims :+ DValCol
      // r19: ONE stats job serves the emptiness probe, the null-key
      // probe and BOTH envelope uses (the pruned pre-state read and
      // the side merge prune over the same delta keys) — guide §1.2
      val stats = Snapshots.keyStats(dDelta, keyCols)
      // an empty multiplicity delta (this fold never touched the
      // measure's values) merges nothing — and MUST short-circuit: an
      // empty key set has an empty envelope, which reads as "no
      // pruning possible" and would rewrite the whole side table
      if (stats.count == 0L)
        return ch.select(st.defn.dims.map(col): _*).limit(0)
          .withColumn(s"__dcd_${d.name}", lit(0L))
      val sideVs = Snapshots.versions(side)
      require(sideVs.nonEmpty, s"distinct side state $side missing — " +
        "the mart directory was tampered with; re-initialize")
      val committed = taggedVersion(side, sid, target)
      // pre-fold side state: time travel to just below the tagged
      // commit when a crashed run already folded this range
      val preV = committed match {
        case Some(tv) => sideVs.takeWhile(_ < tv).lastOption.getOrElse(
          throw new IllegalStateException(
            s"side state $side has no version before its tagged commit v$tv"))
        case None => sideVs.last
      }
      val pre = prunedStateRead(spark, side, preV, keyCols, stats)
        .select(keyCols.map(col) :+ col("row_count").as("__old"): _*)
      val a = dDelta.alias("d"); val b = pre.alias("p")
      val cond = keyCols.map(k => col(s"d.$k") <=> col(s"p.$k"))
        .reduceLeft(_ && _)
      val tr = a.join(b, cond, "left").select(
        dims.map(k => col(s"d.$k").as(k)) ++ Seq(
          coalesce(col("p.__old"), lit(0L)).as("__old"),
          (coalesce(col("p.__old"), lit(0L)) + col("d.__dcnt")).as("__new")): _*)
        .persist()
      try {
        // a multiplicity below zero means the changelog retracted a
        // value the side state never held — corrupt, never guess
        // (one full-scan agg — it also materializes tr's cache — in
        // place of the old multi-job incremental-limit probe)
        val minNew = Snapshots.planningAction(spark) {
          tr.agg(min(col("__new"))).collect()(0)
        }
        require(minNew.isNullAt(0) || minNew.getLong(0) >= 0L,
          s"distinct side state $side is inconsistent with the changelog " +
            s"(a multiplicity went negative) — re-initialize the mart")
        if (committed.isEmpty) {
          mergeAdditive(spark, side, keyCols, Nil, Nil, dDelta, (sid, target),
            Some(stats))
          ()
        }
        val contrib = when(col("__old") === 0L && col("__new") > 0L, 1L)
          .when(col("__old") > 0L && col("__new") === 0L, -1L)
          .otherwise(0L)
        val dcd = tr.groupBy(dims.map(col): _*)
          .agg(sum(contrib).as(s"__dcd_${d.name}"))
        // ≤ one row per touched (group, value) pair — broadcast the
        // graft join when the delta is provably small (guide §3.1)
        if (stats.count <= broadcastDeltaRows(spark)) broadcast(dcd) else dcd
      } finally { tr.unpersist(); () }
    } finally { dDelta.unpersist(); () }
  }

  /** Version of `table` whose manifest carries ledger tag `(sid,
    * batch)` — the commit a crashed refresh left behind. */
  private def taggedVersion(table: String, sid: String, batch: Long): Option[Long] =
    Snapshots.versions(table).find { v =>
      "\"stream_id\":\"([^\"]*)\",\"stream_batch\":(\\d+)".r
        .findFirstMatchIn(Snapshots.manifestTextOf(table, v))
        .exists(m => m.group(1) == sid && m.group(2).toLong == batch)
    }

  /** Read `table` AS OF `v` pruned to files that can host a key of
    * the delta whose precomputed [[Snapshots.KeyStats]] is `stats`
    * (manifest bounds + bloom over the keys' envelope), with live
    * deletes applied. A NULL key value disables pruning for the read
    * (the bounds algebra cannot see NULL groups — same conservatism
    * as the merge). */
  private def prunedStateRead(spark: SparkSession, table: String, v: Long,
                              keys: Seq[String],
                              stats: Snapshots.KeyStats): DataFrame = {
    val schema = Snapshots.declaredCleanOf(table).getOrElse(
      Snapshots.readAsOf(spark, table, v).schema)
    val envelope =
      if (stats.nullTouched) Nil
      else Snapshots.envelopeFrom(stats, keys, schema)
    val comps = Snapshots.stateComponents(table, v)
    val statless = comps.collect { case Left(dir) => dir }
      .flatMap(Snapshots.expandParquet)
    val stated = comps.collect { case Right(x) => x }
    val bloomAbsent = BloomSkip.provablyAbsent(table, stated.collect {
      case (p, fs) if envelope.isEmpty || FileStats.mayMatch(fs, envelope) => p
    }, envelope)
    val keep = statless ++ stated.collect {
      case (p, fs) if !bloomAbsent.contains(p) &&
        (envelope.isEmpty || FileStats.mayMatch(fs, envelope)) => p
    }
    if (keep.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else Snapshots.applyAllDeletes(
      spark.read.option("mergeSchema", "true").schema(schema).parquet(keep: _*),
      table, Snapshots.liveDeletes(table, v), Snapshots.liveEqDeletes(table, v))
  }

  /** Merge an additive delta into a count/sum/distinct-count table:
    * touched groups take (old + delta), zero-count groups drop,
    * untouched band files carry by reference (bounds + bloom
    * pruning). `delta` is keyed by `dims` with `__dcnt` plus
    * `__d_<m>`/`__dnn_<m>` per sum and `__dcd_<d>` per distinct
    * count. The commit carries ledger tag `tag` (exactly-once under
    * crash replay) and is copy-on-write against the table's current
    * head. */
  private def mergeAdditive(spark: SparkSession, table: String,
                            dims: Seq[String], sums: Seq[String],
                            cds: Seq[String], delta: DataFrame,
                            tag: (String, Long),
                            precomputed: Option[Snapshots.KeyStats] = None): Long = {
    val martSchema = Snapshots.declaredCleanOf(table).getOrElse(
      Snapshots.readLatest(spark, table).schema)
    val martHead = Snapshots.versions(table).last
    val priorDels = Snapshots.liveDeletes(table, martHead)
    val priorEqs = Snapshots.liveEqDeletes(table, martHead)
    // a NULL dim value is a REAL group (groupBy keeps it) that the
    // bounds algebra cannot see (comparisons never match NULL rows) —
    // pruning would carry the NULL group's host file while the merge
    // rewrites the group elsewhere, duplicating it. Conservative: any
    // NULL touched dim disables pruning for this refresh (rare — dims
    // are usually derived non-null).
    val stats = precomputed.getOrElse(Snapshots.keyStats(delta, dims))
    val envelope =
      if (stats.nullTouched) Nil
      else Snapshots.envelopeFrom(stats, dims, martSchema)
    val comps = Snapshots.stateComponents(table, martHead)
    val statless = comps.collect { case Left(d) => d }.flatMap(Snapshots.expandParquet)
    val stated = comps.collect { case Right(x) => x }
    // bounds + bloom: only files that can host a touched group rewrite
    val bloomAbsent = BloomSkip.provablyAbsent(table, stated.collect {
      case (p, fs) if envelope.isEmpty || FileStats.mayMatch(fs, envelope) => p
    }, envelope)
    val carried = stated.collect {
      case (p, fs) if (envelope.nonEmpty && !FileStats.mayMatch(fs, envelope)) ||
        bloomAbsent.contains(p) =>
        fs.copy(name = Snapshots.rootRel(table, p))
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
          table, priorDels, priorEqs).select(outCols.map(col): _*)
      }
    // groups in the rewrite set but untouched carry through unchanged;
    // touched groups merge additively (a group absent from the table
    // starts at 0); groups whose count lands on 0 drop. NULL-SAFE
    // group pairing: a NULL dim group must pair with itself (plain
    // SQL equality would keep both sides, duplicating the group).
    val cur = current.alias("c")
    // NOTE (r19): no broadcast hint here — Spark 4.1's broadcast hash
    // join does not support FULL OUTER (verified: the hint silently
    // falls back to SortMergeJoin), and rewriting the merge as
    // left-join ∪ anti-join legs would double-read the rewrite set.
    // The dcd graft joins (left outer, build right) DO broadcast.
    val del = delta.alias("d")
    val pairCond = dims.map(d0 => col(s"c.$d0") <=> col(s"d.$d0"))
      .reduceLeft(_ && _)
    val merged = cur.join(del, pairCond, "full_outer")
      .select((dims.map(d0 => coalesce(col(s"c.$d0"), col(s"d.$d0")).as(d0)) ++ Seq(
        (coalesce(col("c.row_count"), lit(0L)) + coalesce(col("d.__dcnt"), lit(0L)))
          .as("row_count")) ++
        sums.flatMap { m =>
          // a sum is NULL exactly when its non-null count is zero — the
          // nn companion is what lets "retracted back to all-NULL"
          // surface as NULL like a rebuild would, not as 0
          val nn = coalesce(col(s"c.${nnCol(m)}"), lit(0L)) +
            coalesce(col(s"d.__dnn_$m"), lit(0L))
          Seq(
            when(nn > 0,
              coalesce(col(s"c.${sumCol(m)}"), lit(0)) +
                coalesce(col(s"d.__d_$m"), lit(0))).as(sumCol(m)),
            nn.as(nnCol(m)))
        } ++
        cds.map { d0 =>
          (coalesce(col(s"c.${cdCol(d0)}"), lit(0L)) +
            coalesce(col(s"d.__dcd_$d0"), lit(0L))).as(cdCol(d0))
        }): _*)
      .filter(col("row_count") > 0)
      // the arithmetic widens DECIMAL sums — pin the table's declared
      // types so every commit's files stay schema-identical
      .select(outCols.map(c => col(c).cast(martSchema(c).dataType).as(c)): _*)
    val v = Snapshots.reserveVersion(table)
    try {
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      withExactBanding(spark) {
        merged.repartition(math.max(1, rewrite.size + 1), col(dims.head))
          .write.mode("append").option("compression", "snappy")
          .options(BloomSkip.writerOptions(table, merged.schema))
          .parquet(s"$table/v=$v")
      }
      Snapshots.commitCow(spark, table, v, "merge", carried,
        deletes = MorDeletes.retarget(priorDels, carried.map(_.name).toSet),
        eqDeletes = Snapshots.survivingEqEntries(priorEqs, carried),
        basedOn = Some(martHead),
        // the folded base version rides the manifest (crash-safe
        // marker — see stateOf)
        streamTag = Some(tag))
      v
    } catch {
      case NonFatal(e) => Snapshots.releaseVersion(table, v); throw e
    }
  }
}
