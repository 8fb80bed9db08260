package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned-table emulation of the reference's Iceberg snapshot /
  * time-travel surface (SURVEY §2.1 S3/K5; reference
  * spark/jobs/schema_check.py:33 `SELECT * FROM t.snapshots`,
  * schema_verify.py:42-47 read-as-of) — without Iceberg jars (absent
  * in this offline env).
  *
  * Layout, Iceberg-shaped but parquet-native:
  * {{{
  *   <table>/v=N/part-*.parquet     // snapshot N's full data
  *   <table>/_meta/N.json           // manifest: version, row_count, columns
  * }}}
  * Every write is a new immutable version (Iceberg's CTAS/overwrite
  * snapshot semantics — the reference never merges); manifests are
  * tiny driver-side metadata, exactly like Iceberg's metadata JSON.
  * Schema may evolve between versions; `readAsOf(n)` sees version n's
  * schema, `snapshots()` lists the history.
  *
  * Scale: data files are written by the normal distributed writer (any
  * partitioning the caller applied is preserved); only the manifest is
  * driver-side. Readers open exactly one version directory — no
  * multi-version listing cost on the read path.
  */
object Snapshots {

  private def metaDir(table: String) = Paths.get(table, "_meta")

  // ---- commit plane (concurrent-writer safety) ------------------------
  //
  // The reference delegates commit arbitration to an Iceberg REST
  // catalog (its docker-compose runs one as the table-metadata tier):
  // an Iceberg commit is an atomic compare-and-swap of the metadata
  // pointer with conflict validation and retry. This store has no
  // catalog server, so the filesystem primitives play that role:
  //
  //  - VERSION MINT = atomic directory creation (`v=N` is the
  //    reservation; `Files.createDirectory` fails if it exists), so two
  //    writers can never write data into one version directory;
  //  - COMMIT POINT = the manifest, published with CREATE_NEW — a
  //    same-version manifest race fails LOUDLY instead of truncating
  //    the earlier writer's commit;
  //  - COMMUTING commits (fast appends, upsert appends) just take the
  //    next reservation — both racers land as distinct readable
  //    versions, the optimistic-retry case;
  //  - NON-COMMUTING commits (CoW DML, compaction, rollback, merge,
  //    fast-forward — anything that read the state it replaces) gate on
  //    [[assertSerializable]]: any main-chain version minted after the
  //    operation's planning base fails the commit with a named
  //    [[GraftConcurrentCommitException]] — the everyday lost-update
  //    case (compaction racing a streaming append) degrades loudly,
  //    never silently.
  //
  // An in-JVM ledger orders same-process manifest publication by
  // version number (reservation order), and appends additionally
  // honor CROSS-PROCESS writers through the filesystem (a minted
  // directory below with no manifest is another process mid-commit —
  // bounded wait for its publish/abort), so concurrent appends from
  // ANY mix of processes record exact cumulative `row_count`
  // arithmetic. The arithmetic itself is chain-derived (anchor
  // full-state count + published per-append added_rows), so even a
  // writer that stalls past the wait window and publishes out of
  // order cannot make a LATER commit's stored count wrong — each
  // term is the publishing commit's own local truth.

  /** Reserved-but-unpublished versions per table (absolute path key) —
    * the in-JVM publication ledger. */
  private val inflightVersions =
    new java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.ConcurrentSkipListSet[java.lang.Long]]()
  private val turnMonitor = new Object
  private def inflightOf(table: String) =
    inflightVersions.computeIfAbsent(
      Paths.get(table).toAbsolutePath.normalize.toString,
      _ => new java.util.concurrent.ConcurrentSkipListSet[java.lang.Long]())

  /** Atomically mint the next version of `table`: the `v=N` directory
    * IS the reservation (atomic create; a collision with any concurrent
    * writer — same process or not — just probes upward). The caller
    * owns the directory exclusively until [[resolveVersion]]. */
  private[graft] def reserveVersion(table: String): Long = {
    Files.createDirectories(Paths.get(table))
    var v = nextVersion(table)
    var out = -1L
    while (out < 0) {
      try {
        Files.createDirectory(Paths.get(table, s"v=$v"))
        inflightOf(table).add(v)
        out = v
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => v += 1
      }
    }
    out
  }

  /** Clear a reservation from the in-JVM ledger (publish, abort or
    * fallback) and wake waiting publishers. Idempotent. */
  private[graft] def resolveVersion(table: String, v: Long): Unit = {
    inflightOf(table).remove(v)
    turnMonitor.synchronized { turnMonitor.notifyAll() }
  }

  /** Abort a MAIN-chain reservation after a mid-flight failure: if the
    * version never published its manifest, its directory is
    * unreachable debris — remove it (so it never blocks a later
    * writer's gate) and clear the ledger. A published version is left
    * alone. */
  private[sources] def abortReservation(table: String, v: Long): Unit = {
    if (!Files.isRegularFile(metaDir(table).resolve(s"$v.json")))
      deleteTree(Paths.get(table, s"v=$v"))
    resolveVersion(table, v)
  }

  /** [[resolveVersion]] plus removal of the reserved directory when
    * the commit will never happen and nothing was written into it. */
  private[graft] def releaseVersion(table: String, v: Long): Unit = {
    resolveVersion(table, v)
    val d = Paths.get(table, s"v=$v")
    if (Files.isDirectory(d)) {
      try Files.delete(d)
      catch { case _: java.nio.file.DirectoryNotEmptyException => () }
    }
  }

  /** Wait (bounded) until every reservation below `v` has published
    * or aborted, so manifests land in version order and append
    * row_count arithmetic reads a settled chain. In-JVM reservations
    * are tracked by the ledger (entries whose directory vanished —
    * aborted writers — are dropped); with `waitForeign`,
    * CROSS-PROCESS writers are honored too: a version directory below
    * `v` with no main manifest and no branch ownership is another
    * process between its mint and its commit point, and the wait
    * polls for its manifest (publish), branch manifest (branch
    * commit) or directory removal (abort). Only APPENDS pass
    * `waitForeign` — their cumulative row_count is order-sensitive
    * arithmetic; non-commuting commits skip it because their
    * serializability gate refuses on the same directories anyway, and
    * full-state commits re-derive their count from their own files.
    * The timeout keeps a stuck or crashed writer from wedging the
    * table (debris then falls to remove_orphan_files, and
    * [[chainRowCount]] keeps the arithmetic exact against whatever IS
    * published). */
  private def awaitPublicationTurn(table: String, v: Long,
                                   waitForeign: Boolean = false): Unit = {
    val ledger = inflightOf(table)
    val deadline = System.currentTimeMillis() + 60000
    def blockers(): Boolean = {
      val it = ledger.headSet(java.lang.Long.valueOf(v)).iterator()
      var any = false
      while (it.hasNext && !any) {
        val k = it.next()
        if (Files.isDirectory(Paths.get(table, s"v=$k"))) any = true
        else it.remove() // aborted writer's stale entry
      }
      any
    }
    // cross-process candidates, computed ONCE at entry (no number
    // below v can be minted after ours): version directories below v
    // with no main manifest and no branch ownership. The expensive
    // refinement — dropping directories the published state still
    // REFERENCES (consumed branch directories after a zero-copy
    // publish, pinned predecessors kept past retention) — runs only
    // when the cheap listing found candidates at all, so the everyday
    // no-foreign-writer append pays one directory listing.
    val foreign: Seq[Long] = {
      if (!waitForeign) Nil
      else {
        val root = Paths.get(table)
        val verSeg = "^v=(\\d+)$".r
        val published = versions(table).toSet
        val branchOwned = allBranchVersions(table).toSet
        val cands =
          if (!Files.isDirectory(root)) Nil
          else scala.util.Using.resource(Files.list(root)) { ls =>
            ls.iterator().asScala.flatMap(p => p.getFileName.toString match {
              case verSeg(num) =>
                val k = num.toLong
                if (k < v && !published.contains(k) && !branchOwned.contains(k) &&
                  Files.isDirectory(p)) Some(k)
                else None
              case _ => None
            }).toVector
          }
        if (cands.isEmpty) Nil
        else {
          val seg = "(?:^|/)v=(\\d+)(?:/|$)".r
          val referenced = (versions(table).flatMap(x =>
            readSet(table, x) ++ liveDeletes(table, x).map(_.dir) ++
              liveEqDeletes(table, x).map(_.dir)) ++
            branchesOf(table).keys.toSeq.flatMap(b => branchReadSet(table, b)))
            .flatMap(p => seg.findAllMatchIn(p).map(_.group(1).toLong)).toSet
          cands.filterNot(referenced.contains)
        }
      }
    }
    def foreignBlockers(): Boolean = foreign.exists { k =>
      // a candidate resolves by publishing its manifest, publishing a
      // BRANCH manifest (it was a branch writer mid-commit), or
      // vanishing (abort / orphan reclamation)
      !Files.isRegularFile(metaDir(table).resolve(s"$k.json")) &&
        Files.isDirectory(Paths.get(table, s"v=$k")) &&
        !allBranchVersions(table).contains(k)
    }
    turnMonitor.synchronized {
      while ((blockers() || foreignBlockers()) &&
        System.currentTimeMillis() < deadline)
        turnMonitor.wait(200)
    }
  }

  /** EXACT cumulative row count of the published main chain: the
    * anchoring full-state manifest's count (self-derived at commit
    * from its own + carried files, order-independent) plus the
    * `added_rows` of every published append above it. Unlike reading
    * the NEWEST manifest's stored row_count, this derivation cannot
    * go stale when manifests published out of version order (a
    * cross-process racer that stalls past the publication-turn window
    * and lands late): each term is the publishing commit's own local
    * truth. Falls back to the newest stored count for pre-added_rows
    * history. */
  private def chainRowCount(table: String): Long = {
    val pubs = versions(table)
    if (pubs.isEmpty) return 0L
    val last = pubs.last
    val anchor = lastFullVersion(table, last)
    var total = rowCountOf(table, anchor)
    pubs.filter(_ > anchor).foreach { x =>
      "\"added_rows\":(\\d+)".r.findFirstMatchIn(manifestText(table, x)) match {
        case Some(m) => total += m.group(1).toLong
        case None => return rowCountOf(table, last) // legacy append manifest
      }
    }
    total
  }

  /** Publish a manifest with CREATE_NEW semantics — the atomic commit
    * point. A same-version collision (two writers minting one number,
    * possible only for pre-reservation debris or an external actor)
    * fails LOUDLY: the earlier commit is never truncated. */
  private def publishManifest(path: java.nio.file.Path, manifest: String): Unit =
    try {
      Files.write(path, manifest.getBytes(StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE_NEW)
      ()
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new GraftConcurrentCommitException(
          s"manifest $path already exists — a concurrent writer committed this " +
            "version first; this commit was NOT published (no silent overwrite). " +
            "Re-run the operation against the new head.")
    }

  /** The serializability gate for NON-COMMUTING commits (anything that
    * read the state it replaces): any main-chain version minted in
    * (basedOn, v) — committed manifest or in-flight reservation —
    * means the state this operation planned against is no longer the
    * head, and committing would silently drop the intervening rows.
    * Branch-owned versions are not conflicts (branch commits never
    * change main state; the shared sequence just numbers them). */
  private def assertSerializable(table: String, basedOn: Long, v: Long,
                                 operation: String): Unit = {
    val branchOwned = allBranchVersions(table).toSet
    val committed = versions(table).toSet
    val conflicts = ((basedOn + 1) until v).filter { k =>
      !branchOwned.contains(k) &&
        (committed.contains(k) || Files.isDirectory(Paths.get(table, s"v=$k")))
    }
    if (conflicts.nonEmpty)
      throw new GraftConcurrentCommitException(
        s"cannot commit $operation v$v of $table: version(s) " +
          s"${conflicts.mkString(", ")} landed after this operation planned " +
          s"against v$basedOn — a non-commuting commit must re-plan against the " +
          "new head (re-run the operation); if a listed version is a crashed " +
          "writer's leftover directory, removeOrphanFiles reclaims it")
  }

  /** Every manifest carries a random commit identity: a
    * dropped-and-recreated table reuses version NUMBERS, so caches
    * keyed by (table, version) alone could serve the old table's
    * state — the uuid distinguishes the commits without any
    * filesystem round-trip (the fix for the per-read sidecar-listing
    * walk the r14 position cache did). */
  private def uuidFrag: String =
    s""","commit_uuid":"${java.util.UUID.randomUUID()}""""

  /** Cache identity of the delete state AS OF `v`: the anchoring
    * full-state manifest's commit uuid (that manifest records the
    * live sidecars). Empty for pre-uuid manifests — callers then fall
    * back to a filesystem fingerprint. */
  private[sources] def deleteStateKey(table: String, v: Long): String = {
    val lf = lastFullVersion(table, v)
    "\"commit_uuid\":\"([^\"]*)\"".r.findFirstMatchIn(manifestText(table, lf))
      .map(m => s"$table|$lf|${m.group(1)}").getOrElse("")
  }

  /** Versions present, ascending (from manifests). */
  def versions(table: String): Seq[Long] = {
    val dir = metaDir(table)
    if (!Files.isDirectory(dir)) Seq.empty
    // Files.list holds a directory fd until closed; versions() sits on
    // hot paths (per catalog read / DML commit / streaming trigger), so
    // an unclosed stream leaks one fd per call for the process lifetime.
    else scala.util.Using.resource(Files.list(dir)) { ls =>
      ls.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.endsWith(".json") => s.stripSuffix(".json").toLong }
        .toSeq.sorted
    }
  }

  /** Write `df` as the next version of `table`; returns the new
    * version number (1-based). `commitTsMs` is the commit timestamp
    * recorded in the manifest (epoch millis) — pass it explicitly for
    * deterministic histories (the SURVEY §7.6 asOfTimestamp contract:
    * wall clock is pipeline state, so reproducible runs inject it);
    * defaults to the wall clock like Iceberg's own commit time. */
  def writeSnapshot(df: DataFrame, table: String, operation: String = "overwrite",
                    commitTsMs: Option[Long] = None,
                    streamTag: Option[(String, Long)] = None,
                    partitionColumns: Seq[String] = Nil,
                    basedOn: Option[Long] = None): Long = {
    // shared sequence across main AND branch chains — the atomic
    // directory reservation makes version data directories unique
    // table-wide even under concurrent writers
    val v = reserveVersion(table)
    try {
      // Iceberg-parity timestamp encoding (its spec mandates micros, not
      // INT96): INT96 carries no usable parquet statistics, so writing it
      // would silently exclude timestamp columns from file skipping
      df.sparkSession.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // "append" into the exclusively-reserved (empty) directory — the
      // reservation already provides the exclusivity errorifexists gave
      val writer = df.write.mode("append").option("compression", "snappy")
        .options(BloomSkip.writerOptions(table, df.schema))
      (if (partitionColumns.nonEmpty) writer.partitionBy(partitionColumns: _*) else writer)
        .parquet(s"$table/v=$v")
      // exact row count + per-file min/max column bounds for
      // planning-time file skipping — KB footer tail reads; small
      // versions walk on the driver, large ones (CTAS/OVERWRITE at
      // scale) collect in a distributed footer-read job
      val stats = FileStats.collectFor(df.sparkSession, Paths.get(s"$table/v=$v"))
      val rows = stats.map(_.map(_.rows).sum).getOrElse(
        df.sparkSession.read.parquet(s"$table/v=$v").count())
      // layout-only partition columns (e.g. the derived bucket id) are
      // directory structure, not table schema
      val cols = df.schema.fieldNames.filterNot(partitionColumns.contains)
        .map(c => "\"" + c + "\"").mkString("[", ",", "]")
      val ts = commitTsMs.getOrElse(System.currentTimeMillis())
      val filesFrag = stats.fold("")(s => s""","files":${FileStats.toJson(s)}""")
      val manifest =
        s"""{"version":$v,"operation":"$operation","committed_at_ms":$ts,"row_count":$rows,"columns":$cols${streamTagFrag(streamTag)}$filesFrag$uuidFrag}"""
      // changelog-enabled tables capture this commit's row-level
      // effect before it becomes visible (no-op without the marker)
      Changelog.captureCow(df.sparkSession, table, v, operation, Nil, Nil, Nil)
      awaitPublicationTurn(table, v)
      // full-state commits that read the state they replace (compact /
      // rollback / merge / DML rewrites) pass their planning base and
      // fail LOUDLY if anything landed since
      basedOn.foreach(b => assertSerializable(table, b, v, operation))
      Files.createDirectories(metaDir(table))
      publishManifest(metaDir(table).resolve(s"$v.json"), manifest)
      v
    } catch {
      case e: GraftConcurrentCommitException =>
        // the data directory of a refused commit is unreachable debris —
        // remove it so it never blocks a later writer's gate
        deleteTree(Paths.get(s"$table/v=$v"))
        throw e
    } finally resolveVersion(table, v)
  }

  /** Manifest fragment identifying the streaming (stream, batch) that
    * committed a version — the idempotence ledger for
    * [[idempotentAppendWriter]]. */
  private def streamTagFrag(tag: Option[(String, Long)]): String =
    tag.fold("") { case (sid, b) =>
      require(sid.matches("[A-Za-z0-9_.-]+"),
        s"stream id must be filename-safe ([A-Za-z0-9_.-]+): $sid")
      s""","stream_id":"$sid","stream_batch":$b"""
    }

  /** Highest batch id `streamId` has committed to `table` (None if it
    * never wrote). Reads only KB manifests — per-trigger metadata. */
  private[sources] def committedStreamBatch(table: String, streamId: String): Option[Long] =
    versions(table).flatMap { v =>
      val text = new String(
        Files.readAllBytes(metaDir(table).resolve(s"$v.json")), StandardCharsets.UTF_8)
      "\"stream_id\":\"([^\"]*)\",\"stream_batch\":(\\d+)".r.findFirstMatchIn(text)
        .filter(_.group(1) == streamId).map(_.group(2).toLong)
    }.maxOption

  /** Exactly-once `foreachBatch` sink onto a versioned table: each
    * micro-batch commits as ONE snapshot carrying its (streamId,
    * batchId) in the manifest, and a batch id at or below the ledger's
    * high-water mark is SKIPPED — so foreachBatch's at-least-once
    * redelivery (crash after write, before the checkpoint commit
    * marker) cannot double-append. The first batch of an empty table
    * commits as the initial full-state snapshot; later batches are
    * fast appends (O(delta) write). This is the supported streaming
    * write path onto catalog tables — the Delta-style
    * `foreachBatch + txn-version` idempotence pattern, with the
    * manifest as the transaction log. */
  def idempotentAppendWriter(table: String, streamId: String)
      : (DataFrame, Long) => Unit = (df, batchId) => {
    if (committedStreamBatch(table, streamId).exists(_ >= batchId)) ()
    else if (versions(table).isEmpty)
      { writeSnapshot(df, table, streamTag = Some((streamId, batchId))); () }
    else { appendSnapshot(df, table, streamTag = Some((streamId, batchId))); () }
  }

  private def manifestText(table: String, v: Long): String = new String(
    Files.readAllBytes(metaDir(table).resolve(s"$v.json")), StandardCharsets.UTF_8)

  /** Package-visible manifest text (the streaming guard needs per-
    * version eq-delete presence, not the accumulated view). */
  private[sources] def manifestTextOf(table: String, v: Long): String =
    manifestText(table, v)

  /** Operation recorded in version `v`'s manifest ("" if absent). */
  private[sources] def operationOf(table: String, v: Long): String =
    "\"operation\":\"([^\"]*)\"".r.findFirstMatchIn(manifestText(table, v))
      .map(_.group(1)).getOrElse("")

  /** Carried-forward file refs of version `v`'s manifest (TABLE-ROOT-
    * relative names) — nonempty only for file-pruned copy-on-write
    * commits. */
  private[sources] def carriedOf(table: String, v: Long): Seq[FileStats.FileStat] =
    FileStats.carriedFromManifest(manifestText(table, v))

  /** Declared storage-partitioning layout marker ((numBuckets,
    * bucketColumn)) — written by the catalog's CREATE TABLE; None for
    * plain and days-partitioned tables. */
  private[sources] def layoutOf(table: String): Option[(Int, String)] =
    layoutSpecOf(table).collect { case GraftLayout.Bucket(n, c) => (n, c) }

  /** The table's CURRENT declared storage layout (bucket or days
    * transform) — the spec every new write lays files out by. None
    * for plain tables and tables whose layout was evolved to `none`. */
  private[sources] def layoutSpecOf(table: String): Option[GraftLayout] =
    layoutErasOf(table).lastOption.flatMap(_.spec)

  /** One spec-JSON fragment (the single-era marker body, or an era's
    * `"spec"` object) parsed to a layout. */
  private[sources] def parseSpecFragment(text: String): Option[GraftLayout] = {
    val bucket = for {
      n <- "\"bucket_n\":(\\d+)".r.findFirstMatchIn(text).map(_.group(1).toInt)
      c <- "\"bucket_col\":\"([^\"]*)\"".r.findFirstMatchIn(text).map(_.group(1))
    } yield GraftLayout.Bucket(n, c)
    bucket.orElse {
      for {
        t <- "\"transform\":\"([^\"]*)\"".r.findFirstMatchIn(text).map(_.group(1))
        if t == "days"
        c <- "\"col\":\"([^\"]*)\"".r.findFirstMatchIn(text).map(_.group(1))
      } yield GraftLayout.Days(c,
        timestampCol = "\"coltype\":\"([^\"]*)\"".r.findFirstMatchIn(text)
          .exists(_.group(1) == "timestamp"))
    }
  }

  /** The table's full layout-era history, oldest first: each era is
    * `(fromV, spec)` — files whose origin version is ≥ `fromV` (and
    * below the next era's) were written under `spec` (None = plain).
    * A never-evolved table is ONE era from version 0 (the legacy
    * single-spec marker parses as exactly that); a table with no
    * marker returns Nil. Layout evolution ([[evolveLayout]]) appends
    * eras — Iceberg partition-spec-evolution semantics: existing data
    * files keep their old directory layout forever (metadata-only),
    * new writes use the current spec, and planner surfaces that need
    * layout homogeneity ([[layoutAligned]]) gate on the era split
    * until compaction rewrites the live set under the current spec. */
  private[sources] def layoutErasOf(table: String): Seq[GraftLayout.Era] = {
    val marker = Paths.get(table, "_layout.json")
    if (!Files.isRegularFile(marker)) Nil
    else {
      val text = new String(Files.readAllBytes(marker), StandardCharsets.UTF_8)
      if (!text.contains("\"eras\""))
        Seq(GraftLayout.Era(0L, parseSpecFragment(text)))
      else {
        val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(text)
        node.get("eras") match {
          case arr: com.fasterxml.jackson.databind.node.ArrayNode =>
            arr.elements().asScala.map { e =>
              val spec =
                if (e.get("spec") == null || e.get("spec").isNull) None
                else parseSpecFragment(e.get("spec").toString)
              GraftLayout.Era(e.get("from_v").asLong(), spec)
            }.toVector.sortBy(_.fromV)
          case _ => throw new IllegalStateException(
            s"corrupt layout marker of $table: $text")
        }
      }
    }
  }

  /** Did ANY era of this table lay files out into `partCol=K/`
    * directories? Gates the directory→file-list expansion every read
    * of a laid-out table needs (a directory read would
    * partition-discover the derived layout column into the schema) —
    * a table evolved to `none` still holds old laid-out files. */
  private[sources] def everLaidOut(table: String): Boolean =
    layoutErasOf(table).exists(_.spec.nonEmpty)

  /** Is the CURRENT era's layout the layout of EVERY live data file
    * of state `v`? Single-era tables are trivially aligned; after an
    * evolution, alignment returns only when a full-state write
    * (compaction/overwrite) has rewritten the live set under the
    * current spec. Storage-partitioned-join grouping MUST gate on
    * this: a pre-evolution file's `partCol=K/` segment was derived
    * under the OLD spec (e.g. bucket(4) keys under a bucket(8)
    * era, or a different source column), so regrouping it by segment
    * value would route rows to the wrong join partition — silently
    * wrong results, not a slow plan. */
  private[sources] def layoutAligned(table: String, v: Long): Boolean = {
    val eras = layoutErasOf(table)
    eras.isEmpty || (eras.size == 1 && eras.head.fromV == 0L) || {
      val fromV = eras.last.fromV
      readSet(table, v).forall { p =>
        !p.endsWith(".parquet") ||
          RenameEras.fileVersionOf(rootRel(table, p)) >= fromV
      }
    }
  }

  /** Metadata-only layout (partition-spec) evolution — the Iceberg
    * `ALTER TABLE … ADD/REPLACE PARTITION FIELD` semantics: record
    * that writes FROM THE NEXT VERSION ON use `newSpec`, touching no
    * data file. Old files keep their directories; reads stay exact
    * (manifest-stats pruning never depended on directories); SPJ
    * grouping degrades to a correct shuffle join until `compact()`
    * rewrites the live set under the new spec. A redefinition with no
    * data written in between replaces the pending era (eras hold
    * strictly increasing `from_v`); a no-op re-declaration of the
    * current spec is ignored. */
  private[sources] def evolveLayout(table: String, newSpec: Option[GraftLayout]): Unit = {
    val eras = layoutErasOf(table)
    if (eras.lastOption.flatMap(_.spec) == newSpec && (eras.nonEmpty || newSpec.isEmpty))
      return
    val fromV = versions(table).lastOption.map(_ + 1).getOrElse(0L)
    val kept = eras.filter(_.fromV < fromV)
    val next = kept :+ GraftLayout.Era(fromV, newSpec)
    val body = next.map(e =>
      s"""{"from_v":${e.fromV},"spec":${e.spec.map(GraftLayout.specJson).getOrElse("null")}}""")
      .mkString("[", ",", "]")
    Files.write(Paths.get(table, "_layout.json"),
      s"""{"eras":$body}""".getBytes(StandardCharsets.UTF_8))
  }

  /** All DATA parquet files under `dir` (recursive, sorted). Hidden
    * segments below `dir` (Spark's `_`/`.` convention, `key=value`
    * layout dirs exempt) are skipped, so metadata sidecars like the
    * merge-on-read `v=N/_deletes/` never expand as data. */
  private[sources] def expandParquet(dir: String): Seq[String] = {
    val root = Paths.get(dir)
    scala.util.Using.resource(Files.walk(root)) { w =>
      w.iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
        .filterNot(p => root.relativize(p).toString
          .split('/').exists(FileStats.hiddenSegment))
        .map(_.toString).toVector.sorted
    }
  }

  /** The version anchoring `v`'s state: the most recent full-state
    * version ≤ v (any operation but `append`), else the chain's first
    * version. Its manifest also carries the state's live merge-on-read
    * delete entries (appends never do). */
  private[sources] def lastFullVersion(table: String, v: Long): Long = {
    val upTo = versions(table).filter(_ <= v)
    require(upTo.contains(v), s"no snapshot $v of $table")
    upTo.reverse.find(x => operationOf(table, x) != "append").getOrElse(upTo.head)
  }

  /** Live merge-on-read delete sidecars of the state AS OF `v` (empty
    * for every table that never took a MoR delete, and again after
    * any full-state write — compaction/overwrite materialize). */
  def liveDeletes(table: String, v: Long): Seq[MorDeletes.DeleteFile] =
    MorDeletes.fromManifest(manifestText(table, lastFullVersion(table, v)))

  /** Live EQUALITY delete entries of the state AS OF `v`: unlike the
    * positional entries (which ride the anchoring full-state
    * manifest), equality deletes are committed by APPEND snapshots
    * (the upsert shape) and accumulate down the chain — every
    * manifest from the anchoring full-state version to `v`
    * contributes; any full-state write clears them (its readers
    * materialized the retractions). Sorted by bound ascending. */
  def liveEqDeletes(table: String, v: Long): Seq[EqDeletes.EqDelete] = {
    val lastFull = lastFullVersion(table, v)
    versions(table).filter(x => x >= lastFull && x <= v)
      .flatMap(x => EqDeletes.fromManifest(manifestText(table, x)))
      .sortBy(_.bound)
  }

  /** Equality entries surviving a carried-ref commit: an entry stays
    * live iff some carried file's ORIGIN version sits at or below its
    * bound (rewritten files take origin = the new version, above
    * every bound — immune by construction; an entry no carried file
    * can satisfy is dead weight and drops from the manifest). */
  private[sources] def survivingEqEntries(entries: Seq[EqDeletes.EqDelete],
      carried: Seq[FileStats.FileStat]): Seq[EqDeletes.EqDelete] = {
    if (entries.isEmpty) Nil
    else {
      val origins = carried.map(f => RenameEras.fileVersionOf(f.name))
      entries.filter(e => origins.exists(_ <= e.bound))
    }
  }

  /** One keyed UPSERT delivery (the streaming CDC shape — Iceberg v2
    * equality deletes): retract every prior row whose `keys` tuple
    * appears in `rows`, then append `rows` — committed as ONE
    * fast-append snapshot carrying the batch's key sidecar as an
    * equality-delete entry bounded at the PRIOR version. ZERO data
    * files are read or rewritten (no position scan — the whole write
    * is O(batch)); later appends are immune (origin above the bound),
    * so re-inserting a retracted key sticks. Refuses while positional
    * sidecars or rename eras are live (each flavor composes with
    * appends, not with the others — `compact()` clears any of them).
    * The first delivery on an empty table is the initial full-state
    * snapshot (nothing to retract). */
  def upsertBatch(spark: SparkSession, table: String, rows: DataFrame,
                  keys: Seq[String], streamTag: Option[(String, Long)] = None): Long = {
    require(keys.nonEmpty, "upsertBatch needs at least one key column")
    keys.foreach { k =>
      val f = rows.schema.fields(rows.schema.fieldIndex(k))
      require(EqDeletes.supportedKeyType(f.dataType),
        s"equality-delete key $k: ${f.dataType.catalogString} is not a supported " +
          "key type (integral/string/date/timestamp/boolean)")
    }
    val vs = versions(table)
    if (vs.isEmpty) return writeSnapshot(rows, table, streamTag = streamTag)
    // positional sidecars COMPOSE with equality entries (both flavors
    // accumulate down one chain; readers apply the equality merge by
    // key+bound and the position skip independently per row) — only
    // rename eras still refuse: the merge scans resolve key columns
    // at ONE set of physical names, which era-spanning files break
    require(renameInfoOf(table).isEmpty ||
      !erasActive(table, vs.last, renameInfoOf(table), Long.MaxValue),
      s"upsert into $table: rename eras are live — run Snapshots.compact() first")
    // ONE key-column set per live chain: the equality-merge readers
    // extract key tuples at a single set of column indices, so a
    // delivery with different keys would silently skip retractions
    val liveKeyCols = liveEqDeletes(table, vs.last).map(_.cols).distinct
    require(liveKeyCols.isEmpty || liveKeyCols == Seq(keys),
      s"upsert into $table: live equality-delete entries retract by " +
        s"(${liveKeyCols.map(_.mkString("+")).mkString(", ")}) — a delivery must keep " +
        "the same key columns, or run Snapshots.compact() first")
    // NULL-bearing key tuples retract nothing (SQL equality) — drop
    // them from the sidecar so readers never carry dead weight. The
    // sidecar stages in a hidden temp dir and moves in between the
    // data write and the manifest — nothing is visible until the
    // manifest lands. (uuid-named: the version is minted only after
    // the volume guards pass, so a refused delivery reserves nothing.)
    val tmp = s"$table/_eqtmp_${java.util.UUID.randomUUID().toString.take(8)}"
    val keyRows = rows.select(keys.map(col): _*).na.drop("any").distinct()
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    keyRows.write.mode("overwrite").parquet(tmp)
    // delivery size from the sidecar's own FOOTERS (KB tail reads, no
    // second Spark job) — the single source of truth the manifest and
    // the volume guards both use
    val keyCount = FileStats.footerRowCount(Paths.get(tmp))
      .getOrElse(keyRows.count())
    try {
      // LOUD volume guards (the positional flavor's maxBufferedDeletes
      // posture): the scan loads live key sets driver-side, so "small
      // by the upsert policy" must be a check, not a comment. A single
      // oversized delivery should run as copy-on-write DML instead; an
      // oversized ACCUMULATION down the append chain names compact().
      val maxDelivery = spark.conf.get(
        "spark.graft.eq.maxKeysPerDelivery", "1000000").toLong
      require(keyCount <= maxDelivery,
        s"upsert into $table: this delivery retracts $keyCount keys, above " +
          s"spark.graft.eq.maxKeysPerDelivery=$maxDelivery — equality deletes are " +
          "for small keyed retractions (the scan plans their key sets " +
          "driver-side); run a bulk restatement as copy-on-write DML (MERGE/" +
          "DELETE), or raise the cap")
      val maxAccum = spark.conf.get(
        "spark.graft.eq.maxAccumulatedKeys", "10000000").toLong
      val accumulated = liveEqDeletes(table, vs.last)
        .map(e => EqDeletes.entryRows(table, e)).sum
      require(accumulated + keyCount <= maxAccum,
        s"upsert into $table: live equality-delete entries already hold " +
          s"$accumulated keys and this delivery adds $keyCount, above " +
          s"spark.graft.eq.maxAccumulatedKeys=$maxAccum — run Snapshots.compact() " +
          "to materialize the retractions (clearing every entry), or raise the cap")
      val hasKeys = keyCount > 0
      val v = reserveVersion(table)
      try {
        val sidecarDir = s"v=$v/_eqdeletes"
        // retraction bound = the main chain's COMMITTED head at mint
        // time (never the shared-sequence predecessor: a concurrently
        // staged branch version below v must stay immune — its rows,
        // once published, were committed AFTER this delivery)
        val bound = versions(table).last
        // changelog-enabled tables capture the delivery's row-level
        // effect (one prior-state semi-join — the Delta CDF trade;
        // no-op, and zero reads, without the marker)
        Changelog.captureUpsert(spark, table, v, bound, rows, keys)
        appendSnapshot(rows, table, streamTag = streamTag,
          eqDeletes = if (hasKeys)
            Seq(EqDeletes.EqDelete(sidecarDir, keys, bound = bound,
              rows = keyCount)) else Nil,
          preManifest = _ => {
            // upserts commute with PLAIN appends but not with each
            // other (two racing retractions of one key would both land
            // above each other's bound — duplicate keys): any
            // eq-bearing commit that landed since this delivery's
            // bound-read fails LOUDLY. Runs after the in-JVM
            // publication turn, so same-process races are exact.
            versions(table).filter(x => x > bound && x < v).foreach { x =>
              if (EqDeletes.fromManifest(manifestTextOf(table, x)).nonEmpty)
                throw new GraftConcurrentCommitException(
                  s"cannot commit upsert v$v of $table: a concurrent upsert " +
                    s"committed v$x after this delivery read its retraction bound " +
                    s"(v$bound) — keyed upsert writers are single-writer per table " +
                    "(the idempotentUpsertWriter streaming contract); re-run the " +
                    "delivery")
            }
            if (hasKeys) {
              Files.move(Paths.get(tmp), Paths.get(s"$table/$sidecarDir")); ()
            }
          },
          reservedV = Some(v))
      } catch {
        case e: GraftConcurrentCommitException =>
          deleteTree(Paths.get(s"$table/v=$v")); resolveVersion(table, v); throw e
        case scala.util.control.NonFatal(e) => releaseVersion(table, v); throw e
      }
    } finally deleteTree(Paths.get(tmp))
  }

  /** Exactly-once keyed upsert sink for `foreachBatch` — the equality-
    * delete counterpart of [[idempotentAppendWriter]]: each
    * micro-batch commits one [[upsertBatch]]; a batch id at or below
    * the manifest ledger's high-water mark is SKIPPED, so at-least-
    * once redelivery cannot double-retract or double-append. */
  def idempotentUpsertWriter(table: String, streamId: String, keys: Seq[String])
      : (DataFrame, Long) => Unit = (df, batchId) => {
    if (committedStreamBatch(table, streamId).exists(_ >= batchId)) ()
    else { upsertBatch(df.sparkSession, table, df, keys,
      streamTag = Some((streamId, batchId))); () }
  }

  /** BOTH delete flavors merged at the DataFrame level — the library
    * read path's single-scan composition (Iceberg format-v2 readers
    * merge position AND equality delete files in one pass): tag each
    * row with its file ref + physical position once, anti-join the
    * positional sidecars on `(ref, pos)`, anti-join the equality key
    * sidecars on `(key tuple, origin ≤ bound)`, then project the
    * caller's columns back out. The two merges are independent
    * per-row predicates (a row dies if EITHER flavor kills it), so
    * order is immaterial; both join sides are KB–MB by policy and
    * broadcast. */
  private[sources] def applyAllDeletes(df: DataFrame, table: String,
                                       dels: Seq[MorDeletes.DeleteFile],
                                       eqs: Seq[EqDeletes.EqDelete]): DataFrame = {
    if (dels.isEmpty && eqs.isEmpty) return df
    val out = df.columns.toSeq
    applyEqDeletesTagged(withLivePositions(df, table, dels), table, eqs)
      .select(out.map(col): _*)
  }

  /** Read-time equality merge over a frame already carrying the
    * `__graft_del_ref` file-ref column ([[withLivePositions]]'s
    * tagging — which resolves `_metadata` on the file-source relation
    * BEFORE any join, the only place it can): one broadcast anti-join
    * of the data rows against the union of live key sidecars, with
    * each entry's origin-version BOUND as a join condition — a row
    * dies iff its key matches some entry whose bound covers its
    * file's origin version. Distributed; the key side is small by the
    * upsert volume guards. */
  private[sources] def applyEqDeletesTagged(t: DataFrame, table: String,
                                            dels: Seq[EqDeletes.EqDelete]): DataFrame = {
    if (dels.isEmpty) return t
    val spark = t.sparkSession
    val cols0 = dels.head.cols
    require(dels.forall(_.cols == cols0),
      s"$table: equality-delete entries disagree on key columns")
    // origin = the ref's LEADING `v=N` segment (the ref itself starts
    // at the file's LAST `/v=` path segment, so laid-out subdirs like
    // `v=N/<partCol>=K/part.parquet` parse correctly)
    val tagged = t.withColumn("__graft_eq_origin",
      expr("CAST(regexp_extract(__graft_del_ref, '^v=(\\\\d+)/', 1) AS BIGINT)"))
    val keyFrames = dels.map { d =>
      spark.read.parquet(s"$table/${d.dir}")
        .select(cols0.map(c => col(c).as(s"__graft_eq_$c")): _*)
        .withColumn("__graft_eq_bound", lit(d.bound))
    }
    val delKeys = keyFrames.reduceLeft(_.unionByName(_))
    val cond = cols0.map(c => tagged(c) <=> delKeys(s"__graft_eq_$c"))
      .reduceLeft(_ && _) &&
      tagged("__graft_eq_origin") <= delKeys("__graft_eq_bound")
    tagged.join(broadcast(delKeys), cond, "left_anti")
      .drop("__graft_eq_origin")
  }

  /** Data paths that make up the table state AS OF version `v`: the
    * most recent full-state version ≤ v (any operation but `append`)
    * plus every `append` delta after it. A file-pruned copy-on-write
    * base additionally contributes its carried file references
    * (individual parquet FILES living in older version directories).
    * Full-state versions (the only kind before the fast-append and
    * pruned-CoW ops existed) keep their one-directory read set, so
    * pre-existing tables are unaffected. BUCKETED tables always
    * expand to explicit file lists: their version directories contain
    * `__graft_bucket=N/` layout subdirectories, and a directory read
    * would partition-discover the derived bucket id into the schema
    * (worse, a maintenance rewrite would then persist it as a data
    * column). */
  private[sources] def readSet(table: String, v: Long): Seq[String] = {
    val upTo = versions(table).filter(_ <= v)
    require(upTo.contains(v), s"no snapshot $v of $table")
    val lastFull = lastFullVersion(table, v)
    val base = carriedOf(table, lastFull).map(f => s"$table/${f.name}") ++
      upTo.collect { case x if x >= lastFull => s"$table/v=$x" }
    if (!everLaidOut(table)) base
    else base.flatMap(p => if (p.endsWith(".parquet")) Seq(p) else expandParquet(p))
  }

  /** The state AS OF `v` broken into prunable components:
    * `Right((path, stat))` — an individual data file with manifest
    * bounds; `Left(dir)` — a whole version directory whose manifest
    * predates per-file stats (kept wholesale by every pruning
    * decision). File stats keep their manifest-local names; [[rootRel]]
    * rebases them for re-carry. */
  private[sources] def stateComponents(table: String, v: Long)
      : Seq[Either[String, (String, FileStats.FileStat)]] = {
    val upTo = versions(table).filter(_ <= v)
    require(upTo.contains(v), s"no snapshot $v of $table")
    val lastFull = lastFullVersion(table, v)
    val carried = carriedOf(table, lastFull)
      .map(f => Right((s"$table/${f.name}", f)))
    carried ++ upTo.collect { case x if x >= lastFull => x }.flatMap { x =>
      val d = s"$table/v=$x"
      FileStats.fromManifest(manifestText(table, x)) match {
        case Some(fs) => fs.map(f => Right((s"$d/${f.name}", f)))
        case None     => Seq(Left(d))
      }
    }
  }

  /** The component's file name rebased to TABLE-ROOT-relative (the
    * carried-manifest encoding): `v=N/part-x.parquet`. Idempotent for
    * already-carried refs (their names already contain the version
    * segment). */
  private[sources] def rootRel(table: String, path: String): String = {
    require(path.startsWith(table + "/"), s"$path not under $table")
    path.stripPrefix(table + "/")
  }

  /** [[readSet]] with manifest-stats file skipping applied: each
    * stats-bearing component survives only if its bounds MAY satisfy
    * `filters` ([[FileStats.mayMatch]]); statless directories are kept
    * whole. Returns None when pruning cannot help (no filters, no
    * stats anywhere, or nothing was actually removed) — callers then
    * use the plain directory read set unchanged. */
  private[sources] def pruneReadSet(
      table: String, v: Long,
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Option[Seq[String]] = {
    if (filters.isEmpty) return None
    var statsSeen = false
    var removed = 0
    val boundsKept = Seq.newBuilder[(String, Boolean)] // (path, bloomCandidate)
    stateComponents(table, v).foreach {
      case Left(dir) => boundsKept += ((dir, false))
      case Right((path, stat)) =>
        statsSeen = true
        if (FileStats.mayMatch(stat, filters)) boundsKept += ((path, true))
        else removed += 1
    }
    // bloom layer: point lookups on opted-in columns test the parquet
    // bloom region of each bounds-surviving file — the pruning class
    // bounds can't serve (hash-distributed keys span every file's
    // [min,max]); no-op unless the table carries a _bloom.json marker
    val kept0 = boundsKept.result()
    val absent = BloomSkip.provablyAbsent(table,
      kept0.collect { case (p, true) => p }, filters)
    removed += absent.size
    val out = kept0.collect { case (p, _) if !absent.contains(p) => p }
    if (!statsSeen || removed == 0) None else Some(out)
  }

  /** Fast append (Iceberg `append` snapshot semantics): version N+1's
    * data directory holds ONLY the new rows — O(delta) write, never a
    * table rewrite — and the manifest chains it onto the current
    * state. `row_count` stays the TOTAL as-of row count (computed
    * from the prior manifest + the delta count: metadata arithmetic,
    * no rescan of existing data). Readers of version N+1 assemble the
    * last full-state directory plus the appended deltas in one
    * multi-path scan. Schemas must match the current state exactly —
    * evolution goes through a full-state write. */
  def appendSnapshot(df: DataFrame, table: String,
                     commitTsMs: Option[Long] = None,
                     expectedSchema: Option[org.apache.spark.sql.types.StructType] = None,
                     streamTag: Option[(String, Long)] = None,
                     partitionColumns: Seq[String] = Nil,
                     eqDeletes: Seq[EqDeletes.EqDelete] = Nil,
                     preManifest: Long => Unit = _ => (),
                     reservedV: Option[Long] = None): Long = {
    val vs = versions(table)
    require(vs.nonEmpty, s"cannot append to $table: no current snapshot")
    // the append must match the table's EFFECTIVE schema — the caller's
    // declared one when the table has evolved (catalog path), else the
    // current physical state — by NAME AND TYPE (order-insensitive,
    // nullability-insensitive: parquet round-trips relax nullability).
    // A type mismatch committed here would corrupt the whole chain:
    // every later mergeSchema read fails or silently widens. Derived
    // layout columns (partitionColumns) are directory structure, not
    // schema, and are excluded from the comparison.
    val expect = expectedSchema.getOrElse(readLatest(df.sparkSession, table).schema)
    def shape(s: org.apache.spark.sql.types.StructType): Seq[(String, String)] =
      s.fields.filterNot(f => partitionColumns.contains(f.name))
        .map(f => (f.name, f.dataType.catalogString)).sortBy(_._1).toSeq
    require(shape(expect) == shape(df.schema),
      s"append schema mismatch: expected ${shape(expect).map { case (n, t) => s"$n:$t" }.mkString(",")} " +
        s"vs ${shape(df.schema).map { case (n, t) => s"$n:$t" }.mkString(",")}")
    val v = reservedV.getOrElse(reserveVersion(table))
    try {
      df.sparkSession.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      val writer = df.write.mode("append").option("compression", "snappy")
        .options(BloomSkip.writerOptions(table, df.schema))
      (if (partitionColumns.nonEmpty) writer.partitionBy(partitionColumns: _*) else writer)
        .parquet(s"$table/v=$v")
      val stats = FileStats.collectFor(df.sparkSession, Paths.get(s"$table/v=$v"))
      val delta = stats.map(_.map(_.rows).sum).getOrElse(
        df.sparkSession.read.parquet(s"$table/v=$v").count())
      // publication order = version order ACROSS PROCESSES (the
      // foreign wait honors another process's minted-but-unpublished
      // directories), so the prior total is read after earlier
      // reservations settle: racing appends all land and all record
      // exact row_count arithmetic (appends commute — no
      // serializability gate here, by design). The chain derivation
      // keeps the total exact even if a racer stalled past the wait
      // window and published late.
      awaitPublicationTurn(table, v, waitForeign = true)
      val priorTotal = chainRowCount(table)
      val cols = df.schema.fieldNames.filterNot(partitionColumns.contains)
        .map(c => "\"" + c + "\"").mkString("[", ",", "]")
      val ts = commitTsMs.getOrElse(System.currentTimeMillis())
      val filesFrag = stats.fold("")(s => s""","files":${FileStats.toJson(s)}""")
      // row_count stays PHYSICAL while equality deletes live (matches
      // are unknown without scanning) — the eq scan refuses the
      // manifest-answered count, so nothing reads it as live rows
      val eqFrag =
        if (eqDeletes.isEmpty) "" else s""","eqdeletes":${EqDeletes.toJson(eqDeletes)}"""
      preManifest(v)
      val manifest =
        s"""{"version":$v,"operation":"append","committed_at_ms":$ts,"row_count":${priorTotal + delta},"added_rows":$delta,"columns":$cols${streamTagFrag(streamTag)}$filesFrag$eqFrag$uuidFrag}"""
      publishManifest(metaDir(table).resolve(s"$v.json"), manifest)
      v
    } finally resolveVersion(table, v)
  }

  /** Commit the manifest for a full-state version directory whose
    * DATA was already written by someone else — the DSv2 ReplaceData
    * path (MERGE/UPDATE through [[GraftCatalog]]) streams rows through
    * Spark's own parquet batch writer into `v=N`, then lands here for
    * the metadata commit. Row count is a footer-statistics read, not
    * a data scan. */
  private[sources] def commitFullState(spark: SparkSession, table: String, v: Long,
                                       operation: String,
                                       commitTsMs: Option[Long] = None,
                                       basedOn: Option[Long] = None,
                                       streamTag: Option[(String, Long)] = None): Unit = {
    val df = spark.read.parquet(s"$table/v=$v")
    val stats = FileStats.collectFor(spark, Paths.get(s"$table/v=$v"))
    val rows = stats.map(_.map(_.rows).sum).getOrElse(df.count())
    val cols = df.schema.fieldNames
      .map(c => "\"" + c + "\"").mkString("[", ",", "]")
    val ts = commitTsMs.getOrElse(System.currentTimeMillis())
    val filesFrag = stats.fold("")(s => s""","files":${FileStats.toJson(s)}""")
    val manifest =
      s"""{"version":$v,"operation":"$operation","committed_at_ms":$ts,"row_count":$rows,"columns":$cols${streamTagFrag(streamTag)}$filesFrag$uuidFrag}"""
    Changelog.captureCow(spark, table, v, operation, Nil, Nil, Nil)
    publishGated(table, v, operation, basedOn, manifest)
  }

  /** The shared gated publication tail of the v-supplied commit paths
    * (the caller reserved `v` and wrote its data): order in-JVM, gate
    * non-commuting commits on their planning base, publish CREATE_NEW,
    * and on refusal remove the unreachable data so it never blocks a
    * later writer's gate. */
  private def publishGated(table: String, v: Long, operation: String,
                           basedOn: Option[Long], manifest: String): Unit =
    try {
      awaitPublicationTurn(table, v)
      basedOn.foreach(b => assertSerializable(table, b, v, operation))
      Files.createDirectories(metaDir(table))
      publishManifest(metaDir(table).resolve(s"$v.json"), manifest)
    } catch {
      case e: GraftConcurrentCommitException =>
        deleteTree(Paths.get(s"$table/v=$v"))
        throw e
    } finally resolveVersion(table, v)

  /** Commit a FILE-PRUNED copy-on-write version: `v=N` holds only the
    * rewritten group's rows (already written by Spark's parquet batch
    * writer via the ReplaceData path, or by [[GraftCatalog]]'s pruned
    * DELETE), and `carried` references every untouched file of the
    * prior state by TABLE-ROOT-relative path — those files are never
    * read, never copied, and stay pinned in their original version
    * directories (the Iceberg copy-on-write commit shape: delete the
    * affected files from the snapshot, add the rewritten ones, carry
    * the rest by reference). Row count is manifest arithmetic: carried
    * rows ride in the refs, rewritten rows come from the new files'
    * footers. At 100 TB this is the difference between a one-row
    * UPDATE rewriting one file and rewriting the table. */
  private[sources] def commitCow(spark: SparkSession, table: String, v: Long,
                                 operation: String,
                                 carried: Seq[FileStats.FileStat],
                                 commitTsMs: Option[Long] = None,
                                 deletes: Seq[MorDeletes.DeleteFile] = Nil,
                                 eqDeletes: Seq[EqDeletes.EqDelete] = Nil,
                                 basedOn: Option[Long] = None,
                                 streamTag: Option[(String, Long)] = None): Unit = {
    if (carried.isEmpty && deletes.isEmpty && eqDeletes.isEmpty) {
      commitFullState(spark, table, v, operation, commitTsMs, basedOn, streamTag)
      return
    }
    // every delete entry must target a carried file — a target that
    // was dropped or rewritten takes its positions with it (callers
    // retarget); committing a dangling target would corrupt the live
    // row arithmetic and make readers chase a nonexistent ref
    val carriedRefs = carried.map(_.name).toSet
    require(MorDeletes.targetRefs(deletes).subsetOf(carriedRefs),
      s"delete entries target files not carried by $table v$v")
    val dir = Paths.get(s"$table/v=$v")
    // a fully-carried commit (metadata-only delete / runtime-pruned
    // group that matched nothing / merge-on-read delete) may have
    // written no data files — the (possibly sidecar-only) directory
    // keeps the version's read-set shape uniform
    Files.createDirectories(dir)
    val stats = FileStats.collectFor(spark, dir)
    val ownRows = stats.map(_.map(_.rows).sum).getOrElse(
      if (expandParquet(dir.toString).nonEmpty)
        spark.read.parquet(s"$table/v=$v").count()
      else 0L)
    // live rows = physical rows minus the positions recorded against
    // still-carried files (FileStat.rows stays PHYSICAL — the position
    // space — so bounds pruning and read planning keep exact file shapes)
    val rows = ownRows + carried.map(_.rows).sum - MorDeletes.deletedRows(deletes)
    val schema = carriedSchemaOf(spark, table, v, stats.exists(_.nonEmpty))
    val cols = schema.map(c => "\"" + c + "\"").mkString("[", ",", "]")
    val ts = commitTsMs.getOrElse(System.currentTimeMillis())
    val filesFrag = stats.fold("")(s => s""","files":${FileStats.toJson(s)}""")
    val delFrag =
      if (deletes.isEmpty) "" else s""","deletes":${MorDeletes.toJson(deletes)}"""
    // live equality entries SURVIVE a carried-ref commit by riding its
    // manifest (this commit is the chain's new anchoring full-state
    // version, so [[liveEqDeletes]] reads them from here): carried
    // files keep their original origin versions, so each entry's
    // bound keeps selecting exactly the rows it always did, while
    // rewritten files (origin = this version, above every bound) are
    // immune — the composition invariant that lets positional DML run
    // over a live upsert chain without materializing it
    val eqFrag =
      if (eqDeletes.isEmpty) "" else s""","eqdeletes":${EqDeletes.toJson(eqDeletes)}"""
    val manifest =
      s"""{"version":$v,"operation":"$operation","committed_at_ms":$ts,"row_count":$rows,"columns":$cols${streamTagFrag(streamTag)}$filesFrag,"carried":${FileStats.toJson(carried)}$delFrag$eqFrag$uuidFrag}"""
    Changelog.captureCow(spark, table, v, operation, carried, deletes, eqDeletes)
    publishGated(table, v, operation, basedOn, manifest)
  }

  /** Column names for a CoW manifest: the new files' schema when any
    * were written, else the prior version's recorded columns (a
    * fully-carried commit changes no schema). */
  private def carriedSchemaOf(spark: SparkSession, table: String, v: Long,
                              hasOwnFiles: Boolean): Seq[String] =
    if (hasOwnFiles) spark.read.parquet(s"$table/v=$v").schema.fieldNames.toSeq
    else {
      val prior = versions(table).filter(_ < v).lastOption
        .getOrElse(throw new IllegalStateException(s"CoW commit $v of $table has no prior version"))
      "\"columns\":\\[([^\\]]*)\\]".r.findFirstMatchIn(manifestText(table, prior))
        .map(_.group(1).split(",").toSeq.filter(_.nonEmpty).map(_.stripPrefix("\"").stripSuffix("\"")))
        .getOrElse(Seq.empty)
    }

  private[sources] def rowCountOf(table: String, v: Long): Long = {
    val text = new String(
      Files.readAllBytes(metaDir(table).resolve(s"$v.json")), StandardCharsets.UTF_8)
    "\"row_count\":(\\d+)".r.findFirstMatchIn(text).map(_.group(1).toLong).getOrElse(0L)
  }

  /** A row's data file as a table-root-relative ref — the SQL twin of
    * [[GraftFileTag.ref]] (everything from the last `/v=` segment on),
    * built from the parquet reader's `_metadata.file_path`. */
  private[sources] def refCol: org.apache.spark.sql.Column =
    expr("concat('v=', element_at(split(_metadata.file_path, '/v='), -1))")

  /** Read-time MERGE of positional delete sidecars at the DataFrame
    * level (the library-API half; the DSv2 scan has its own
    * position-skipping reader): drop every `(file, pos)` the live
    * sidecars record, via a broadcast LEFT ANTI join on
    * (`_metadata.file_path`-derived ref, `_metadata.row_index`).
    * Fully distributed — the sidecar side is KB–MB by policy — and
    * transparent to the caller's schema. `_metadata.row_index` is the
    * TRUE in-file row position regardless of filter pushdown (Spark's
    * parquet reader maintains it across row-group skipping), so the
    * merge composes with any downstream pruning Catalyst applies. */
  private[sources] def applyDeletes(df: DataFrame, table: String,
                                    dels: Seq[MorDeletes.DeleteFile]): DataFrame = {
    if (dels.isEmpty) return df
    val out = df.columns.toSeq
    withLivePositions(df, table, dels).select(out.map(col): _*)
  }

  /** [[applyDeletes]] keeping the `(ref, pos)` helper columns
    * (`__graft_del_ref`/`__graft_del_pos`) in the output — the shape a
    * stacked merge-on-read DELETE needs: `_metadata` resolves only on
    * the file-source relation, so position-producing callers must ride
    * the same projection the merge built rather than re-deriving it
    * after the join. */
  private[sources] def withLivePositions(df: DataFrame, table: String,
                                         dels: Seq[MorDeletes.DeleteFile]): DataFrame = {
    val tagged = df
      .withColumn("__graft_del_ref", refCol)
      .withColumn("__graft_del_pos", col("_metadata.row_index"))
    if (dels.isEmpty) return tagged
    val pos = df.sparkSession.read.schema(MorDeletes.SidecarSchema)
      .parquet(dels.map(d => s"$table/${d.dir}"): _*)
      .select(col("file").as("__graft_del_ref"), col("pos").as("__graft_del_pos"))
    tagged.join(broadcast(pos), Seq("__graft_del_ref", "__graft_del_pos"), "left_anti")
  }

  /** The table's declared schema marker, parsed RAW (field metadata —
    * incl. rename history — preserved). None for library tables that
    * never went through the catalog. */
  private[sources] def declaredRawOf(table: String): Option[org.apache.spark.sql.types.StructType] = {
    val marker = Paths.get(table, "_schema.json")
    if (!Files.isRegularFile(marker)) None
    else Some(org.apache.spark.sql.types.DataType.fromJson(new String(
      Files.readAllBytes(marker), StandardCharsets.UTF_8))
      .asInstanceOf[org.apache.spark.sql.types.StructType])
  }

  /** Same, CLEANED for reporting/reads: the DDL round-trip strips
    * field metadata and normalizes nullability exactly like the
    * pre-rename code did. */
  private[sources] def declaredCleanOf(table: String): Option[org.apache.spark.sql.types.StructType] =
    declaredRawOf(table).map(raw =>
      org.apache.spark.sql.types.StructType.fromDDL(raw.toDDL))

  /** The table's rename state ([[RenameEras.Info]]); empty for every
    * table that never took a RENAME COLUMN. */
  private[sources] def renameInfoOf(table: String): RenameEras.Info =
    declaredRawOf(table).map(raw =>
      RenameEras.fromSchema(raw, RenameEras.retiredOf(table)))
      .getOrElse(RenameEras.Empty)

  /** Era-aware multi-path read: the read set grouped by each file's
    * `output name → physical name` mapping, one stock parquet scan per
    * era (same column order and types), positionally renamed to the
    * output names and unioned — a distributed union of disjoint file
    * sets, no shuffle. `outV` picks the OUTPUT name era: the pinned
    * version for time travel (per-snapshot names), `Long.MaxValue`
    * for current-state reads. */
  private[sources] def eraRead(spark: SparkSession, table: String,
                               paths: Seq[String], info: RenameEras.Info,
                               outV: Long): DataFrame = {
    val out0 = declaredCleanOf(table).getOrElse(throw new IllegalStateException(
      s"$table has rename history but no schema marker"))
    val out = org.apache.spark.sql.types.StructType(out0.fields.map(f =>
      f.copy(name = info.nameAsOf(f.name, outV))))
    val files = paths.flatMap(p =>
      if (p.endsWith(".parquet")) Seq(p) else expandParquet(p))
    val groups = files.groupBy(f =>
      info.mapping(RenameEras.fileVersionOf(rootRel(table, f)), outV)
        .filter { case (o, _) => out.fieldNames.contains(o) })
    groups.toSeq.map { case (mapping, fs) =>
      val phys = RenameEras.physicalSchema(out, mapping)
      spark.read.option("mergeSchema", "true").schema(phys).parquet(fs: _*)
        .toDF(out.fieldNames.toIndexedSeq: _*)
    }.reduceLeft(_.union(_))
  }

  /** True iff reading version `v`'s state needs the era machinery:
    * some file's physical names differ from the `outV` output names. */
  private[sources] def erasActive(table: String, v: Long, info: RenameEras.Info,
                                  outV: Long): Boolean =
    info.nonEmpty && readSet(table, v)
      .flatMap(p => if (p.endsWith(".parquet")) Seq(p) else expandParquet(p))
      .exists(f => info.mapping(
        RenameEras.fileVersionOf(rootRel(table, f)), outV).nonEmpty)

  /** Time travel: the table exactly as of version `v` (one multi-path
    * scan over the version's [[readSet]] — a single directory unless
    * `v` sits on a fast-append chain), with any live merge-on-read
    * delete sidecars merged out. Under rename history the columns
    * carry version `v`'s OWN names — the per-snapshot schema
    * contract. */
  def readAsOf(spark: SparkSession, table: String, v: Long): DataFrame =
    readAsOfAs(spark, table, v, outV = v)

  /** [[readAsOf]] with an explicit output-name era — `Long.MaxValue`
    * reads a historical STATE under CURRENT names (what rollback and
    * current-state reads want). */
  private[sources] def readAsOfAs(spark: SparkSession, table: String, v: Long,
                                  outV: Long): DataFrame = {
    val info = renameInfoOf(table)
    if (erasActive(table, v, info, outV))
      // invariant: rename refuses while sidecars live and MoR modes
      // refuse while eras live, so an era-active state carries none
      eraRead(spark, table, readSet(table, v), info, outV)
    else applyAllDeletes(spark.read.parquet(readSet(table, v): _*), table,
      liveDeletes(table, v), liveEqDeletes(table, v))
  }

  /** Small-file compaction (Iceberg `rewrite_data_files` shape): the
    * current state rewritten as ONE new full-state snapshot whose file
    * count targets `targetFileBytes` per file — the maintenance answer
    * to a long fast-append chain of KB-sized deltas. History stays
    * append-only (time travel to every pre-compact version keeps
    * working), and because the compact snapshot is full-state it SEALS
    * the chain: [[expireSnapshots]] can afterwards reap the small
    * files the chain pinned. Returns (newVersion, filesBefore,
    * filesAfter).
    *
    * Scale: one distributed round-robin shuffle of the live rows into
    * the target file count — write-bandwidth-bound by construction,
    * the same adjudication as the z-order rewrite; at production scale
    * run it per partition slice. File sizes come from the filesystem
    * (driver-side metadata, no data read). */
  def compact(spark: SparkSession, table: String,
              targetFileBytes: Long = 128L * 1024 * 1024): (Long, Int, Int) = {
    val vs = versions(table)
    require(vs.nonEmpty, s"no snapshots of $table")
    val dataFiles = readSet(table, vs.last).flatMap { d =>
      if (d.endsWith(".parquet")) Seq(Files.size(Paths.get(d)))
      else expandParquet(d).map(p => Files.size(Paths.get(p)))
    }
    val totalBytes = dataFiles.sum
    val numOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    // a laid-out table compacts PER LAYOUT VALUE (file count = bucket/
    // day count, not the byte target) so the compacted snapshot keeps
    // the layout and co-located joins stay exchange-free across
    // maintenance
    val v = layoutSpecOf(table) match {
      case Some(spec) =>
        import org.apache.spark.sql.functions.{col, expr}
        val pc = spec.partCol
        val clustered = readLatest(spark, table)
          .withColumn(pc, expr(spec.derivedExpr))
        val repartitioned = spec match {
          case GraftLayout.Bucket(n, _) => clustered.repartition(n, col(pc))
          case _ => clustered.repartition(col(pc))
        }
        writeSnapshot(repartitioned, table,
          operation = "compact", partitionColumns = Seq(pc),
          basedOn = Some(vs.last))
      case None =>
        writeSnapshot(
          readLatest(spark, table).repartition(numOut), table, operation = "compact",
          basedOn = Some(vs.last))
    }
    val filesAfter = scala.util.Using.resource(Files.walk(Paths.get(s"$table/v=$v"))) { w =>
      w.iterator().asScala.count(p =>
        Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
    }
    (v, dataFiles.size, filesAfter)
  }

  /** CLUSTERED compaction (Iceberg `rewrite_data_files` with the
    * sort strategy and a `zorder(...)` sort order): rewrite the
    * current state Z-ORDERED on `zcols` into ONE new full-state
    * snapshot of ~`targetFiles` files, each covering a contiguous
    * Morton-code range. The point is the MANIFEST: after the rewrite,
    * every file's [min,max] envelope is tight on EVERY clustered
    * column at once, so the catalog's stats-based file skipping
    * prunes multi-dimension box probes — the two-sided lookup a
    * single-column sort can only serve on its leading column. Same
    * history contract as [[compact]] (append-only, seals the chain,
    * materializes live sidecars/eras). Refuses on a laid-out table:
    * the declared layout owns that table's clustering (and the
    * z-range files would break SPJ alignment) — evolve the layout to
    * 'none' first if z-clustering should take over.
    *
    * Scale: one stats pass (approxQuantile over the clustered
    * columns) + one range shuffle of the live rows —
    * write-bandwidth-bound by construction, the same adjudication as
    * [[compact]]; at production scale run it per partition slice. */
  def compactZOrdered(spark: SparkSession, table: String, zcols: Seq[String],
                      targetFiles: Int = 0): (Long, Int, Int) = {
    require(zcols.size >= 2,
      s"z-order clustering needs at least 2 columns, got ${zcols.mkString(",")} — " +
        "use compact() plus a sorted write for single-column clustering")
    layoutSpecOf(table).foreach(spec => throw new IllegalArgumentException(
      s"cannot z-order-compact $table: its declared ${spec.partCol} layout owns the " +
        "clustering — ALTER TABLE … SET TBLPROPERTIES('graft.layout'='none') first"))
    val vs = versions(table)
    require(vs.nonEmpty, s"no snapshots of $table")
    val filesBefore = readSet(table, vs.last).map { d =>
      if (d.endsWith(".parquet")) 1 else expandParquet(d).size
    }.sum
    val current = readLatest(spark, table)
    val width = spark.sessionState.conf.numShufflePartitions
    val n = if (targetFiles > 0) targetFiles else width
    val clustered = graft.sink.ZOrder.withZValue(current.repartition(width), zcols)
      .repartitionByRange(n, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
    val v = writeSnapshot(clustered, table, operation = "compact",
      basedOn = Some(vs.last))
    val filesAfter = expandParquet(s"$table/v=$v").size
    (v, filesBefore, filesAfter)
  }

  /** Rollback: restore the table's CURRENT state to what version `v`
    * held, as a NEW version (Iceberg's `rollback_to_snapshot`
    * semantics: history is append-only — a bad write is undone by
    * committing its predecessor's state forward, never by deleting
    * versions, so audits and time travel over the bad interval keep
    * working). Returns the new version number. */
  def rollback(spark: SparkSession, table: String, v: Long): Long = {
    // basedOn captured at PLAN time: a commit racing this rollback must
    // fail the publication gate, not silently vanish under it
    val head = versions(table).lastOption
    // CURRENT names: rollback restores the STATE, not the schema — a
    // new version directory must carry the names current readers map
    writeSnapshot(readAsOfAs(spark, table, v, outV = Long.MaxValue), table,
      operation = s"rollback_to_$v", basedOn = head)
  }

  /** Commit timestamp of each version (manifests written before the
    * field existed order by version number at epoch 0 — monotone, so
    * timestamp resolution still picks the right neighbor). */
  private[sources] def commitTimes(table: String): Seq[(Long, Long)] =
    versions(table).map { v =>
      val text = new String(
        Files.readAllBytes(metaDir(table).resolve(s"$v.json")), StandardCharsets.UTF_8)
      val ts = "\"committed_at_ms\":(\\d+)".r.findFirstMatchIn(text)
        .map(_.group(1).toLong).getOrElse(v)
      (v, ts)
    }

  /** Time travel by TIMESTAMP (Iceberg `TIMESTAMP AS OF` / Delta
    * `timestampAsOf` analog): the newest version committed at or
    * before `tsMs`. Errors if the table has no snapshot that old —
    * same contract as the engines it emulates. */
  def readAsOfTimestamp(spark: SparkSession, table: String, tsMs: Long): DataFrame = {
    val eligible = commitTimes(table).filter(_._2 <= tsMs)
    require(eligible.nonEmpty,
      s"no snapshot of $table committed at or before $tsMs")
    readAsOf(spark, table, eligible.maxBy(t => (t._2, t._1))._1)
  }

  /** The `.history` metadata frame (Iceberg-shaped): one row per
    * version with its commit time and a current-flag. Timestamps are
    * whatever the writer recorded — deterministic iff injected via
    * `writeSnapshot(commitTsMs = ...)`. */
  def history(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val vs = commitTimes(table)
    val last = vs.map(_._1).maxOption.getOrElse(0L)
    vs.map { case (v, ts) => (ts, v, v == last) }
      .toDF("made_current_at_ms", "snapshot_id", "is_current")
      .orderBy(col("snapshot_id"))
  }

  /** The current (highest-version) table state — CURRENT column names
    * (a current-state read, unlike time travel's per-snapshot names). */
  def readLatest(spark: SparkSession, table: String): DataFrame = {
    val vs = versions(table)
    require(vs.nonEmpty, s"no snapshots of $table")
    readAsOfAs(spark, table, vs.last, outV = Long.MaxValue)
  }

  /** MERGE INTO emulation (the lakehouse upsert the reference's
    * append-only dbt never does): matched keys take the update row,
    * unmatched update rows insert, everything else carries over — all
    * as ONE new immutable snapshot (copy-on-write, like Delta/Iceberg
    * MERGE without the file-level pruning). Schemas must match.
    *
    * Scale: current ⋈ updates is a key-equi left-anti (shuffle or
    * broadcast if updates are small) + union — one pass over the
    * current version; no driver-side row handling. */
  def mergeInto(spark: SparkSession, table: String, updates: DataFrame,
                keys: Seq[String]): Long = {
    val head = versions(table).lastOption // planning base, gated at publish
    val current = readLatest(spark, table)
    require(current.columns.sorted.sameElements(updates.columns.sorted),
      s"merge schema mismatch: ${current.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    val kept = current.join(
      updates.select(keys.map(org.apache.spark.sql.functions.col): _*).distinct(),
      keys, "left_anti")
    writeSnapshot(kept.unionByName(updates), table, operation = "merge",
      basedOn = head)
  }

  /** CDC-style diff between two snapshot versions (Delta CHANGE DATA
    * FEED / Iceberg changelog analog, computed after the fact from
    * immutable versions): one row per changed key with change_type ∈
    * {INSERT, DELETE, UPDATE}. Row equality is md5-of-JSON over the
    * full row (column order fixed by the schema), so any non-key
    * change surfaces as UPDATE.
    *
    * Scale: one full-outer key-equi join between the two versions —
    * the unavoidable shape when the writer kept no per-commit row
    * log; with key-sorted serving layouts both sides arrive
    * pre-partitioned. */
  def diff(spark: SparkSession, table: String, v1: Long, v2: Long,
           keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    def hashed(v: Long, tag: String) = {
      val df = readAsOf(spark, table, v)
      df.select(keys.map(col) :+
        md5(to_json(struct(df.columns.sorted.map(col): _*))).as(s"__h_$tag"): _*)
    }
    hashed(v1, "a").join(hashed(v2, "b"), keys, "full_outer")
      .withColumn("change_type",
        when(col("__h_a").isNull, lit("INSERT"))
          .when(col("__h_b").isNull, lit("DELETE"))
          .when(col("__h_a") =!= col("__h_b"), lit("UPDATE")))
      .filter(col("change_type").isNotNull)
      .select(keys.map(col) :+ col("change_type"): _*)
      .orderBy(keys.map(col) :+ col("change_type"): _*)
  }

  /** The `.snapshots` metadata frame: one row per version. */
  def snapshots(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    versions(table).map { v =>
      val text = new String(
        Files.readAllBytes(metaDir(table).resolve(s"$v.json")), StandardCharsets.UTF_8)
      val op = "\"operation\":\"([^\"]*)\"".r.findFirstMatchIn(text).map(_.group(1)).getOrElse("")
      val rows = "\"row_count\":(\\d+)".r.findFirstMatchIn(text).map(_.group(1).toLong).getOrElse(0L)
      val nCols = "\"columns\":\\[([^\\]]*)\\]".r.findFirstMatchIn(text)
        .map(m => if (m.group(1).isEmpty) 0 else m.group(1).split(",").length).getOrElse(0)
      (v, op, rows, nCols)
    }.toDF("version", "operation", "row_count", "num_columns")
      .orderBy(col("version"))
  }

  /** Driver query: a deterministic 3-version history of the daily-sales
    * mart (progressively wider date range; v2 adds a column) written to
    * a temp table, then listed via [[snapshots]] — every listed value
    * is recomputable from silver, so the metadata surface itself is
    * oracle-checkable. */
  def snapshotsQuery(s: SparkSession, dir: String): DataFrame =
    snapshotsOver(s, graft.marts.DailySales.build(
      graft.marts.SilverEvents.build(Tables.events(s, dir))))

  /** The shared deterministic 3-version daily-sales history
    * (progressively wider date range; v2 adds a column) used by the
    * snapshot-listing and vacuum driver queries. Returns the table
    * path. */
  private def writeDailyHistory(daily: DataFrame, prefix: String): String = {
    val table = Files.createTempDirectory(prefix).toString + "/daily_sales"
    writeSnapshot(daily.filter(col("event_date") <= lit("2024-01-10")), table)
    writeSnapshot(daily.filter(col("event_date") <= lit("2024-01-20"))
      .withColumn("is_backfill", lit(true)), table)
    writeSnapshot(daily, table)
    table
  }

  /** Same, over an already-built daily mart (lets callers reuse a
    * cached silver). */
  def snapshotsOver(s: SparkSession, daily: DataFrame): DataFrame =
    snapshots(s, writeDailyHistory(daily, "graft_snap_"))

  /** Snapshot retention — the Delta VACUUM / Iceberg expire_snapshots
    * analog for the versioned-parquet layout: delete every version but
    * the newest `keepLast` (data directory + manifest), returning the
    * per-version action report. Metadata-plane operation: the driver
    * touches only version DIRECTORIES and KB-sized manifests, never
    * rows — at 100 TB the deletes are object-store prefix removals, and
    * readers of retained versions are unaffected (immutable dirs).
    * Time travel to an expired version correctly fails afterwards. */
  /** Recursively delete `root`, children first (a no-op when absent).
    * The ONE tree-delete idiom every maintenance path shares —
    * Files.walk holds directory handles, so the stream is closed. */
  private[sources] def deleteTree(root: java.nio.file.Path): Unit =
    if (Files.exists(root))
      scala.util.Using.resource(Files.walk(root)) { w =>
        w.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => Files.deleteIfExists(f))
      }

  // ---- named refs (tags) ---------------------------------------------

  /** The table's named snapshot tags (Iceberg tag refs): immutable
    * name → version pointers, readable as `VERSION AS OF '<name>'`
    * and honored by [[expireSnapshots]] — a tagged version (plus
    * everything its state still reads) survives retention until the
    * tag is dropped. Stored in `_refs.json` at the table root. */
  /** The refs document: (tags name→version, branches name→fork base). */
  private def refsDoc(table: String): (Map[String, Long], Map[String, Long]) = {
    val p = Paths.get(table, "_refs.json")
    if (!Files.isRegularFile(p)) (Map.empty, Map.empty)
    else {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
      def section(name: String): Map[String, Long] =
        Option(node.get(name)).fold(Map.empty[String, Long]) { s =>
          s.fieldNames().asScala.map(k => k -> s.get(k).asLong()).toMap
        }
      (section("tags"), section("branches"))
    }
  }

  def tagsOf(table: String): Map[String, Long] = refsDoc(table)._1

  /** The table's branches: name → fork-base main version. */
  def branchesOf(table: String): Map[String, Long] = refsDoc(table)._2

  private def writeRefs(table: String, tags: Map[String, Long],
                        branches: Map[String, Long]): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    val t = root.putObject("tags")
    tags.toSeq.sortBy(_._1).foreach { case (k, v) => t.put(k, v) }
    val b = root.putObject("branches")
    branches.toSeq.sortBy(_._1).foreach { case (k, v) => b.put(k, v) }
    // temp + atomic move: a reader (or crashed writer) can never see a
    // torn refs document — the mutable-pointer half of the commit
    // plane's atomicity story (manifests themselves are CREATE_NEW)
    val tmp = Files.createTempFile(Paths.get(table), "_refs", ".tmp")
    Files.write(tmp, mapper.writeValueAsString(root).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(table, "_refs.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  private def writeTags(table: String, tags: Map[String, Long]): Unit =
    writeRefs(table, tags, branchesOf(table))

  /** Create (or with `replace` move) tag `name` → version `v`.
    * Digit-only names are refused — `VERSION AS OF '7'` must stay an
    * unambiguous snapshot number. */
  def createTag(table: String, name: String, v: Long, replace: Boolean = false): Unit = {
    require(name.matches("[A-Za-z0-9_.-]+") && !name.matches("\\d+"),
      s"tag name must match [A-Za-z0-9_.-]+ and not be all digits: '$name'")
    require(versions(table).contains(v), s"no snapshot $v of $table to tag")
    val (tags, branches) = refsDoc(table)
    // tags and branches share ONE ref namespace (Iceberg refuses the
    // collision too): `VERSION AS OF '<name>'` resolves tags first, so
    // a name naming both would silently shadow the branch state
    require(!branches.contains(name),
      s"ref $name already names a branch (base v${branches.getOrElse(name, -1L)}) — " +
        "tags and branches share one namespace")
    require(replace || !tags.contains(name),
      s"tag $name already exists (→ v${tags(name)}); pass replace=true to move it")
    writeTags(table, tags + (name -> v))
  }

  /** Drop tag `name` (loud if absent) — the versions it pinned become
    * ordinary [[expireSnapshots]] candidates again. */
  def dropTag(table: String, name: String): Unit = {
    val tags = tagsOf(table)
    require(tags.contains(name), s"no tag $name of $table (tags: ${
      tags.keys.toSeq.sorted.mkString(",")})")
    writeTags(table, tags - name)
  }

  // ---- branches (the write-audit-publish staging shape) --------------

  /** Branch manifests live OUTSIDE the main chain's `_meta` listing —
    * under `_meta/branches/<name>/<v>.json` — so every main-path
    * reader ([[versions]] and everything built on it) is branch-blind
    * by construction. Version NUMBERS come from one shared sequence
    * ([[nextVersion]]), so `v=K` data directories never collide
    * across refs. */
  private def branchMetaDir(table: String, name: String) =
    metaDir(table).resolve("branches").resolve(name)

  /** Versions committed to branch `name`, ascending (empty for a
    * fresh branch). */
  def branchVersions(table: String, name: String): Seq[Long] = {
    val dir = branchMetaDir(table, name)
    if (!Files.isDirectory(dir)) Seq.empty
    else scala.util.Using.resource(Files.list(dir)) { ls =>
      ls.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.endsWith(".json") => s.stripSuffix(".json").toLong }
        .toSeq.sorted
    }
  }

  private def allBranchVersions(table: String): Seq[Long] =
    branchesOf(table).keys.toSeq.flatMap(branchVersions(table, _))

  /** Next version number of `table` — one sequence across the main
    * chain AND every branch, so version data directories are unique
    * table-wide. */
  private[sources] def nextVersion(table: String): Long =
    (versions(table) ++ allBranchVersions(table)).maxOption.getOrElse(0L) + 1

  private def branchManifestText(table: String, name: String, v: Long): String =
    new String(Files.readAllBytes(branchMetaDir(table, name).resolve(s"$v.json")),
      StandardCharsets.UTF_8)

  /** Create branch `name` forked at the CURRENT main version — the
    * Iceberg write-audit-publish staging shape: writes land on the
    * branch ([[appendToBranch]]), audits read it ([[readBranch]]),
    * and a clean audit publishes the whole branch state to main in
    * one zero-copy metadata commit ([[fastForward]]). Branching over
    * a DELETE-BEARING base (live positional sidecars and/or equality
    * entries — r17) is sound: branch reads run the same composed
    * merge scan main runs, branch appends sit above every bound, and
    * a publish carries the surviving entries with their origin
    * bounds intact (the carried-ref argument CoW commits use). Only
    * rename eras still refuse — the merge scans resolve key columns
    * at ONE set of physical names, which era-spanning files break.
    * Returns the fork base version. */
  def createBranch(table: String, name: String): Long = {
    require(name.matches("[A-Za-z0-9_.-]+") && !name.matches("\\d+"),
      s"branch name must match [A-Za-z0-9_.-]+ and not be all digits: '$name'")
    val vs = versions(table)
    require(vs.nonEmpty, s"cannot branch $table: no current snapshot")
    val base = vs.last
    require(renameInfoOf(table).isEmpty ||
      !erasActive(table, base, renameInfoOf(table), Long.MaxValue),
      s"cannot branch $table: rename eras are live — run Snapshots.compact() first")
    val (tags, branches) = refsDoc(table)
    require(!branches.contains(name),
      s"branch $name already exists (base v${branches(name)})")
    // one ref namespace with tags — `VERSION AS OF '<name>'` resolves
    // tags first, so a shared name would shadow this branch's state
    require(!tags.contains(name),
      s"ref $name already names a tag (→ v${tags.getOrElse(name, -1L)}) — " +
        "tags and branches share one namespace")
    // defense in depth: manifests under this name with NO ref are a
    // crashed publish's leftovers (their data dirs are carried by
    // main) — a fresh branch must start empty, not resurrect them
    deleteTree(branchMetaDir(table, name))
    writeRefs(table, tags, branches + (name -> base))
    base
  }

  /** Fast-append `df` onto branch `name` — O(delta), same commit
    * shape as [[appendSnapshot]] but with the manifest filed under
    * the branch (invisible to every main read). The table's declared
    * layout spec is honored exactly like the main write path (derive
    * the layout column, cluster, lay files out per value), so a
    * fast-forward publish carries ALIGNED files — co-located joins
    * and per-layout-value file guarantees survive the staging trip.
    * Schema must match the branch head's. */
  def appendToBranch(spark: SparkSession, table: String, name: String,
                     df: DataFrame, commitTsMs: Option[Long] = None): Long = {
    val branches = branchesOf(table)
    require(branches.contains(name), s"no branch $name of $table (branches: ${
      branches.keys.toSeq.sorted.mkString(",")})")
    val expect = readBranch(spark, table, name).schema
    def shape(s: org.apache.spark.sql.types.StructType): Seq[(String, String)] =
      s.fields.map(f => (f.name, f.dataType.catalogString)).sortBy(_._1).toSeq
    require(shape(expect) == shape(df.schema),
      s"branch append schema mismatch: expected ${shape(expect).mkString(",")} " +
        s"vs ${shape(df.schema).mkString(",")}")
    // same layout derivation as the catalog's main insert path: the
    // derived column is directory structure, never schema
    val (toWrite, pcols) = layoutSpecOf(table) match {
      case Some(spec) =>
        val derived = df.withColumn(spec.partCol, expr(spec.derivedExpr))
        val clustered = spec match {
          case GraftLayout.Bucket(n, _) => derived.repartition(n, col(spec.partCol))
          case _ => derived.repartition(col(spec.partCol))
        }
        (clustered, Seq(spec.partCol))
      case None => (df, Seq.empty[String])
    }
    val v = reserveVersion(table)
    try {
      df.sparkSession.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      val writer = toWrite.write.mode("append").option("compression", "snappy")
        .options(BloomSkip.writerOptions(table, df.schema))
      (if (pcols.nonEmpty) writer.partitionBy(pcols: _*) else writer)
        .parquet(s"$table/v=$v")
      val stats = FileStats.collectFor(spark, Paths.get(s"$table/v=$v"))
      val delta = stats.map(_.map(_.rows).sum).getOrElse(
        spark.read.parquet(s"$table/v=$v").count())
      awaitPublicationTurn(table, v)
      val prior = branchCurrentRowCount(table, name)
      val cols = df.schema.fieldNames.filterNot(pcols.contains)
        .map(c => "\"" + c + "\"").mkString("[", ",", "]")
      val ts = commitTsMs.getOrElse(System.currentTimeMillis())
      val filesFrag = stats.fold("")(s => s""","files":${FileStats.toJson(s)}""")
      val manifest =
        s"""{"version":$v,"operation":"append","committed_at_ms":$ts,"row_count":${prior + delta},"added_rows":$delta,"columns":$cols$filesFrag$uuidFrag}"""
      Files.createDirectories(branchMetaDir(table, name))
      publishManifest(branchMetaDir(table, name).resolve(s"$v.json"), manifest)
      v
    } finally resolveVersion(table, v)
  }

  private def branchOpOf(table: String, name: String, v: Long): String =
    "\"operation\":\"([^\"]+)\"".r
      .findFirstMatchIn(branchManifestText(table, name, v))
      .map(_.group(1)).getOrElse("append")

  /** The branch's own anchoring non-append commit, if any (a branch
    * DML's cow manifest) — the branch-chain analogue of
    * [[lastFullVersion]]. */
  private def branchAnchor(table: String, name: String): Option[Long] =
    branchVersions(table, name).reverse
      .find(v => branchOpOf(table, name, v) != "append")

  /** Live positional delete entries of branch `name`'s state: the
    * branch anchor's surviving entries when a branch-local cow commit
    * exists, else the fork base state's (r17 — branches fork over
    * delete-bearing bases; the branch read is the same composed scan
    * main uses). */
  def liveBranchDeletes(table: String, name: String): Seq[MorDeletes.DeleteFile] =
    branchAnchor(table, name) match {
      case Some(a) => MorDeletes.fromManifest(branchManifestText(table, name, a))
      case None    => liveDeletes(table, branchesOf(table)(name))
    }

  /** Live equality-delete entries of branch `name`'s state (same
    * anchor rule; branch appends never add entries — the upsert writer
    * targets main). Sorted by bound ascending like [[liveEqDeletes]]. */
  def liveBranchEqDeletes(table: String, name: String): Seq[EqDeletes.EqDelete] =
    (branchAnchor(table, name) match {
      case Some(a) => EqDeletes.fromManifest(branchManifestText(table, name, a))
      case None    => liveEqDeletes(table, branchesOf(table)(name))
    }).sortBy(_.bound)

  /** Cache identity of branch `name`'s delete state (the branch
    * analogue of [[deleteStateKey]]): the anchor manifest's commit
    * uuid when one exists, else the fork base's key. */
  private[sources] def branchDeleteStateKey(table: String, name: String): String =
    branchAnchor(table, name) match {
      case Some(a) =>
        "\"commit_uuid\":\"([^\"]*)\"".r
          .findFirstMatchIn(branchManifestText(table, name, a))
          .map(m => s"$table|$name|$a|${m.group(1)}").getOrElse("")
      case None => deleteStateKey(table, branchesOf(table)(name))
    }

  /** The branch state's current row count, recomputed from the LIVE
    * fork base each call — never from a prior branch manifest's chained
    * `row_count`, which goes stale when [[rebaseBranch]] moves the fork
    * base (the base's row count changed, the branch appends' deltas did
    * not). Anchored at the last branch-local non-append commit when one
    * exists (its row_count was computed from its own files + carried
    * refs, and rebase refuses branch-DML chains, so it can never be
    * rebased stale). */
  private def branchCurrentRowCount(table: String, name: String): Long = {
    val bvs = branchVersions(table, name)
    def added(v: Long): Long =
      "\"added_rows\":(\\d+)".r.findFirstMatchIn(branchManifestText(table, name, v))
        .map(_.group(1).toLong).getOrElse(0L)
    bvs.reverse.find(v => branchOpOf(table, name, v) != "append") match {
      case Some(anchor) =>
        "\"row_count\":(\\d+)".r.findFirstMatchIn(
          branchManifestText(table, name, anchor)).map(_.group(1).toLong).getOrElse(0L) +
          bvs.filter(_ > anchor).map(added).sum
      case None =>
        rowCountOf(table, branchesOf(table)(name)) + bvs.map(added).sum
    }
  }

  /** Branch `name`'s state broken into prunable components, exactly
    * like [[stateComponents]] for main: anchored at the last
    * branch-local COW commit when one exists (its carried refs + own
    * files + later branch appends), else at the fork-base main state
    * plus every branch append. */
  private[sources] def branchStateComponents(table: String, name: String)
      : Seq[Either[String, (String, FileStats.FileStat)]] = {
    val branches = branchesOf(table)
    require(branches.contains(name), s"no branch $name of $table (branches: ${
      branches.keys.toSeq.sorted.mkString(",")})")
    val bvs = branchVersions(table, name)
    def ownComps(v: Long): Seq[Either[String, (String, FileStats.FileStat)]] =
      FileStats.fromManifest(branchManifestText(table, name, v)) match {
        case Some(fs) => fs.map(f => Right((s"$table/v=$v/${f.name}", f)))
        case None =>
          val d = s"$table/v=$v"
          if (expandParquet(d).isEmpty) Seq.empty else Seq(Left(d))
      }
    bvs.reverse.find(v => branchOpOf(table, name, v) != "append") match {
      case Some(anchor) =>
        FileStats.carriedFromManifest(branchManifestText(table, name, anchor))
          .map(f => Right((s"$table/${f.name}", f)): Either[String, (String, FileStats.FileStat)]) ++
          ownComps(anchor) ++ bvs.filter(_ > anchor).flatMap(ownComps)
      case None =>
        stateComponents(table, branches(name)) ++ bvs.flatMap(ownComps)
    }
  }

  /** Data paths of branch `name`'s state. */
  private[sources] def branchReadSet(table: String, name: String): Seq[String] = {
    val dirs = branchStateComponents(table, name).map {
      case Left(d) => d
      case Right((p, _)) => p
    }
    if (!everLaidOut(table)) dirs
    else dirs.flatMap(p => if (p.endsWith(".parquet")) Seq(p) else expandParquet(p))
  }

  /** The branch's current state: the fork-base main state plus every
    * branch append — the frame audits run against before a publish.
    * The DECLARED schema is honored exactly like main current-state
    * reads: after a metadata-only ADD/DROP COLUMN on main, branch
    * reads neither resurrect dropped columns nor miss added ones
    * (and [[appendToBranch]]'s schema gate compares against the
    * declared shape, not a stale file-inferred one). */
  def readBranch(spark: SparkSession, table: String, name: String): DataFrame = {
    val paths = branchReadSet(table, name)
    if (paths.isEmpty || paths.forall(p =>
        !p.endsWith(".parquet") && expandParquet(p).isEmpty)) {
      // a branch DML that deleted every row leaves an empty state —
      // serve it as an empty frame (schema from the marker, else the
      // fork-base state), not a parquet-inference error
      val schema = declaredCleanOf(table).getOrElse(
        readAsOf(spark, table, branchesOf(table)(name)).schema)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
    val reader = spark.read.option("mergeSchema", "true")
    // a delete-bearing state (base sidecars/entries, or a branch DML
    // anchor's survivors) merges out exactly like main reads; branch
    // appends are immune by construction (origin above every bound)
    applyAllDeletes(
      declaredCleanOf(table).fold(reader)(reader.schema).parquet(paths: _*),
      table, liveBranchDeletes(table, name), liveBranchEqDeletes(table, name))
  }

  /** DELETE on a branch (r16 — the audit-fix half of the WAP loop:
    * an audit that finds bad STAGED rows fixes them on the branch and
    * publishes, instead of dropping and restaging): copy-on-write
    * WITHIN the branch — files whose manifest bounds provably cannot
    * hold a matching row are carried by reference (never read), the
    * rest rewrite with the predicate filtered out, and the commit is
    * a branch-local `cow` manifest that anchors the branch's own
    * chain. Main is untouched — bit-identical — throughout.
    * `condSql` is an ANSI boolean expression over the table's
    * columns; rows where it is TRUE are deleted (NULL survives, SQL
    * DELETE semantics). Returns the branch commit version. */
  def deleteFromBranch(spark: SparkSession, table: String, name: String,
                       condSql: String): Long =
    branchDml(spark, table, name, condSql, "delete",
      (df, cond) => df.filter(!(cond <=> lit(true))))

  /** UPDATE on a branch: `assignments` maps column name → ANSI SQL
    * expression (evaluated over the old row); rows where `condSql` is
    * TRUE take the assignments, all others pass through. Same
    * branch-local copy-on-write commit shape as
    * [[deleteFromBranch]]. */
  def updateBranch(spark: SparkSession, table: String, name: String,
                   assignments: Map[String, String], condSql: String): Long =
    branchDml(spark, table, name, condSql, "update",
      (df, cond) => {
        assignments.keys.foreach(c => require(df.columns.contains(c),
          s"updateBranch: no column $c (columns: ${df.columns.mkString(",")})"))
        // ONE projection, so every assignment's RHS sees the OLD row
        // (SQL UPDATE semantics — chained withColumn would feed one
        // assignment's result into the next's expression)
        val out = df.select(df.columns.map { c =>
          assignments.get(c) match {
            case Some(e) => when(cond <=> lit(true), expr(e)).otherwise(col(c)).as(c)
            case None    => col(c)
          }
        }.toIndexedSeq: _*)
        // an assignment must not move the column off its declared type:
        // when()'s branch coercion silently widens (bigint + a double
        // RHS → double), and the widened branch files would then fail
        // every later readBranch/publish at parquet read — refuse HERE,
        // named, before anything is written
        assignments.keys.foreach { c =>
          val want = df.schema(df.schema.fieldIndex(c)).dataType
          val got = out.schema(out.schema.fieldIndex(c)).dataType
          require(got == want,
            s"updateBranch: assignment to $c yields ${got.catalogString} but the " +
              s"column is ${want.catalogString} — branch files must keep the declared " +
              "schema; CAST the assignment expression explicitly")
        }
        out
      })

  /** One conjunct of `e` per element (the bounds algebra evaluates
    * conjuncts independently). */
  private def splitConjuncts(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      splitConjuncts(l) ++ splitConjuncts(r)
    case x => Seq(x)
  }

  /** Best-effort name resolution of a parsed predicate against the
    * table schema — the shape [[FileStats.mayMatch]] evaluates. None
    * when anything stays unresolved (the caller then keeps the file:
    * pruning is an optimization, never a correctness gate). */
  private def resolveForBounds(
      schema: org.apache.spark.sql.types.StructType,
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[org.apache.spark.sql.catalyst.expressions.Expression] = {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BinaryComparison, Cast, Literal}
    var ok = true
    val named = e.transformUp {
      case ua: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          if ua.nameParts.length == 1 =>
        schema.fields.find(_.name == ua.nameParts.head) match {
          case Some(f) => AttributeReference(f.name, f.dataType)()
          case None => ok = false; ua
        }
    }
    // a bare `k = 5` parses its literal as INT while the column is
    // BIGINT — without the analyzer, widen up-castable literals to
    // the attribute type so the comparison resolves
    // timezone-needing casts (DATE→TIMESTAMP) get the session zone;
    // any eval failure keeps the literal unwidened — the comparison
    // then stays unresolved, this returns None, and the caller
    // conservatively rewrites the file (pruning is an optimization,
    // never a correctness gate)
    def widen(l: Literal, dt: org.apache.spark.sql.types.DataType): Literal =
      if (l.dataType == dt || !Cast.canUpCast(l.dataType, dt)) l
      else scala.util.Try(Literal(Cast(l, dt, Option(
        org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)).eval(), dt))
        .getOrElse(l)
    val out = named.transformUp {
      case bc @ BinaryComparison(a: AttributeReference, l: Literal) =>
        bc.withNewChildren(Seq(a, widen(l, a.dataType)))
      case bc @ BinaryComparison(l: Literal, a: AttributeReference) =>
        bc.withNewChildren(Seq(widen(l, a.dataType), a))
    }
    if (ok && out.resolved) Some(out) else None
  }

  /** The shared branch copy-on-write walk. */
  private def branchDml(spark: SparkSession, table: String, name: String,
                        condSql: String, operation: String,
                        transform: (DataFrame, org.apache.spark.sql.Column) => DataFrame): Long = {
    // branch-chain planning base: a concurrent branch commit between
    // here and publication is a lost update — gated before publish
    val bvs0 = branchVersions(table, name)
    val comps = branchStateComponents(table, name)
    // live delete state of the PRIOR branch state (base entries or a
    // prior branch anchor's survivors): the rewrite merges them out
    // (never resurrects a deleted row), carried files keep theirs
    val priorDels = liveBranchDeletes(table, name)
    val priorEqs = liveBranchEqDeletes(table, name)
    val schema = declaredCleanOf(table).getOrElse(readBranch(spark, table, name).schema)
    val conjuncts = splitConjuncts(
      spark.sessionState.sqlParser.parseExpression(condSql))
    val resolved = conjuncts.flatMap(resolveForBounds(schema, _))
    val statless = comps.collect { case Left(d) => d }.flatMap(expandParquet)
    val stated = comps.collect { case Right(x) => x }
    // carry test: any resolved conjunct proving no-row-matches carries
    // the file (sound for the conjunction); drop test (DELETE only):
    // EVERY conjunct must be modeled and prove all-rows-match
    val allResolved = resolved.size == conjuncts.size
    val dropped = stated.collect {
      case (p, st) if operation == "delete" && allResolved && resolved.nonEmpty &&
        FileStats.mustMatch(st, resolved) => p
    }.toSet
    // bloom layer: a point predicate on an opted-in key column proves
    // files without the key hold no matching row — they carry by
    // reference instead of rewriting (no-op without a _bloom.json)
    val bloomAbsent = BloomSkip.provablyAbsent(table, stated.collect {
      case (p, st) if !dropped.contains(p) &&
        (resolved.isEmpty || FileStats.mayMatch(st, resolved)) => p
    }, resolved)
    val carried = stated.collect {
      case (p, st) if !dropped.contains(p) && ((resolved.nonEmpty &&
        !FileStats.mayMatch(st, resolved)) || bloomAbsent.contains(p)) =>
        st.copy(name = rootRel(table, p))
    }
    val rewrite = statless ++ stated.collect {
      case (p, st) if !dropped.contains(p) && !bloomAbsent.contains(p) &&
        (resolved.isEmpty || FileStats.mayMatch(st, resolved)) => p
    }
    commitBranchCow(spark, table, name, operation, carried,
      priorDels, priorEqs, schema, bvs0, dir =>
        if (rewrite.nonEmpty) {
          val reader = spark.read.option("mergeSchema", "true")
          val df = transform(
            applyAllDeletes(
              declaredCleanOf(table).fold(reader)(reader.schema).parquet(rewrite: _*),
              table, priorDels, priorEqs), expr(condSql))
          writeBranchRewrite(spark, table, df, dir)
        } else Files.createDirectories(dir))
  }

  /** A branch rewrite's data write, honoring the declared layout spec
    * exactly like [[appendToBranch]] (derive, cluster, lay files out
    * per value) — a branch fix on a laid-out table must publish
    * laid-out files or the staging trip would lose alignment. */
  private def writeBranchRewrite(spark: SparkSession, table: String,
                                 df0: DataFrame, dir: java.nio.file.Path): Unit = {
    val (df, pcols) = layoutSpecOf(table) match {
      case Some(spec) =>
        val derived = df0.withColumn(spec.partCol, expr(spec.derivedExpr))
        val clustered = spec match {
          case GraftLayout.Bucket(n, _) => derived.repartition(n, col(spec.partCol))
          case _ => derived.repartition(col(spec.partCol))
        }
        (clustered, Seq(spec.partCol))
      case None => (df0, Seq.empty[String])
    }
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    val writer = df.write.mode("append").option("compression", "snappy")
      .options(BloomSkip.writerOptions(table, df.schema))
    (if (pcols.nonEmpty) writer.partitionBy(pcols: _*) else writer)
      .parquet(dir.toString)
  }

  /** The shared branch copy-on-write commit tail: reserve a version,
    * run the rewrite writer into it, account live rows, carry the
    * surviving delete entries (retargeted positional + bound-covered
    * equality — the same composition rule main CoW commits use), gate
    * the branch chain against concurrent branch commits, and publish
    * the branch manifest CREATE_NEW. */
  private def commitBranchCow(spark: SparkSession, table: String, name: String,
                              operation: String,
                              carried: Seq[FileStats.FileStat],
                              priorDels: Seq[MorDeletes.DeleteFile],
                              priorEqs: Seq[EqDeletes.EqDelete],
                              schema: org.apache.spark.sql.types.StructType,
                              bvs0: Seq[Long],
                              writeRewrite: java.nio.file.Path => Unit): Long = {
    val v = reserveVersion(table)
    val dir = Paths.get(s"$table/v=$v")
    try {
      writeRewrite(dir)
      val statsOpt = FileStats.collectFor(spark, dir)
      val carriedNames = carried.map(_.name).toSet
      val survDels = MorDeletes.retarget(priorDels, carriedNames)
      val survEqs = survivingEqEntries(priorEqs, carried)
      // live rows = own + carried physical minus carried positional
      // retractions; physical-ish while eq entries live (main's rule)
      val rows = statsOpt.map(_.map(_.rows).sum).getOrElse(
        if (expandParquet(dir.toString).nonEmpty)
          spark.read.parquet(dir.toString).count() else 0L) +
        carried.map(_.rows).sum - MorDeletes.deletedRows(survDels)
      val cols = schema.fieldNames.map(c => "\"" + c + "\"").mkString("[", ",", "]")
      val ts = System.currentTimeMillis()
      val filesFrag = statsOpt.filter(_.nonEmpty)
        .fold("")(s => s""","files":${FileStats.toJson(s)}""")
      val delFrag =
        if (survDels.isEmpty) "" else s""","deletes":${MorDeletes.toJson(survDels)}"""
      val eqFrag =
        if (survEqs.isEmpty) "" else s""","eqdeletes":${EqDeletes.toJson(survEqs)}"""
      val manifest =
        s"""{"version":$v,"operation":"$operation","committed_at_ms":$ts,"row_count":$rows,"columns":$cols$filesFrag,"carried":${FileStats.toJson(carried)}$delFrag$eqFrag$uuidFrag}"""
      awaitPublicationTurn(table, v)
      if (branchVersions(table, name) != bvs0)
        throw new GraftConcurrentCommitException(
          s"cannot commit branch $operation v$v of $table@$name: the branch chain " +
            s"advanced past ${bvs0.lastOption.getOrElse(branchesOf(table)(name))} while " +
            "this operation planned — re-run it against the new branch state")
      Files.createDirectories(branchMetaDir(table, name))
      publishManifest(branchMetaDir(table, name).resolve(s"$v.json"), manifest)
      v
    } catch {
      case e: GraftConcurrentCommitException => deleteTree(dir); throw e
    } finally resolveVersion(table, v)
  }

  /** Planning statistics of a keyed change set, from ONE aggregation
    * job: row count, whether any key column holds a NULL, per-key
    * [min, max], and per-key EXACT value sets when small enough for
    * `In` pruning (size-capped in executor memory by
    * [[org.apache.spark.sql.graftext.BoundedCollectSet]] — r19, guide
    * §1.2: this folds what used to be separate emptiness probes,
    * null-presence probes and a two-job envelope into one action). */
  private[sources] final case class KeyStats(count: Long, nullTouched: Boolean,
                                             loHi: Seq[(Any, Any)],
                                             smallSets: Map[String, Seq[Any]])

  /** Run `body` (a metadata-sized PLANNING action — one-row stats
    * collects, emptiness audits) with AQE off: AQE materializes every
    * exchange as its own Spark job, which for a tiny planning
    * aggregation triples the job count for zero adaptive benefit (the
    * result is one row; there is nothing to re-optimize). Data-scale
    * work — merges, writes, the changelog fold itself — keeps AQE.
    * Restores the prior setting afterwards. */
  private[sources] def planningAction[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.adaptive.enabled"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try body
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private[sources] def keyStats(changeSet: DataFrame, keys: Seq[String]): KeyStats = {
    // per-key exact value sets, when small (default cap 1024 — KBs of
    // driver memory): In conjuncts sharpen BOTH pruning layers — the
    // bounds algebra evaluates In per value, and the bloom layer turns
    // each value into a definitive absent-test. Per-column In
    // over-approximates the delivered TUPLE set (sound).
    val inCap = changeSet.sparkSession.conf
      .get("spark.graft.envelope.maxInValues", "1024").toInt
    val row = planningAction(changeSet.sparkSession) {
      changeSet.agg(count(lit(1)).as("__cnt"),
        keys.flatMap(k => Seq(
          min(col(k)), max(col(k)),
          max(when(col(k).isNull, 1).otherwise(0)),
          org.apache.spark.sql.graftext.VectorCodec.boundedCollectSet(col(k), inCap))): _*
      ).collect()(0)
    }
    val cnt = row.getLong(0)
    val loHi = keys.indices.map(i => (row.get(1 + 4 * i), row.get(2 + 4 * i)))
    val nullTouched = keys.indices.exists(i =>
      !row.isNullAt(3 + 4 * i) && row.getInt(3 + 4 * i) == 1)
    val sets = keys.zipWithIndex.flatMap { case (k, i) =>
      if (row.isNullAt(4 + 4 * i)) None else Some(k -> row.getSeq[Any](4 + 4 * i))
    }.toMap
    KeyStats(cnt, nullTouched, loHi, sets)
  }

  /** Bounds conjuncts (`k >= lo AND k <= hi` per key, plus `In` for
    * small exact sets) from precomputed [[KeyStats]]. Empty conjunct
    * for an all-NULL key column (SQL equality matches nothing). */
  private[sources] def envelopeFrom(stats: KeyStats, keys: Seq[String],
                                    schema: org.apache.spark.sql.types.StructType)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, GreaterThanOrEqual, In, LessThanOrEqual, Literal}
    keys.zip(stats.loHi).flatMap { case (k, (lo, hi)) =>
      val dt = schema(schema.fieldIndex(k)).dataType
      if (lo == null || hi == null) Nil // all-NULL key column: matches nothing
      else {
        val attr = AttributeReference(k, dt)()
        val ranges = Seq(GreaterThanOrEqual(attr, Literal.create(lo, dt)),
          LessThanOrEqual(attr, Literal.create(hi, dt)))
        stats.smallSets.get(k) match {
          case Some(vs) =>
            ranges :+ In(attr, vs.map(v => Literal.create(v, dt)).toIndexedSeq)
          case None => ranges
        }
      }
    }
  }

  /** The per-key [min, max] envelope of a keyed change set as bounds
    * conjuncts (`k >= lo AND k <= hi` per key) — ONE tiny aggregation
    * over the change set, then the manifest-stats algebra
    * ([[FileStats.mayMatch]]) carries every out-of-envelope file by
    * reference. Empty when a key column is all-NULL (SQL equality
    * matches nothing). Shared by [[mergeIntoBranch]] and the
    * changelog's upsert pre-image scan. */
  private[sources] def keyEnvelope(changeSet: DataFrame, keys: Seq[String],
                                   schema: org.apache.spark.sql.types.StructType)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
    envelopeFrom(keyStats(changeSet, keys), keys, schema)

  /** MERGE INTO a branch (r17 — the keyed-restatement fix verb the WAP
    * loop was missing): staged rows whose `keys` tuple appears in
    * `updates` take the update row (matched-UPDATE), update rows with
    * no staged match insert (not-matched-INSERT), everything else
    * carries over — copy-on-write WITHIN the branch with the same
    * bounds pruning the other branch verbs use: files whose manifest
    * bounds cannot hold any update key (tested against the update
    * set's per-key min/max — one tiny aggregation over the updates)
    * are carried by reference, never read. NULL update keys match
    * nothing (SQL equality). Main is bit-identical throughout.
    * Schemas must match by name and type. Returns the branch commit
    * version. */
  def mergeIntoBranch(spark: SparkSession, table: String, name: String,
                      updates: DataFrame, keys: Seq[String]): Long = {
    require(keys.nonEmpty, "mergeIntoBranch needs at least one key column")
    val bvs0 = branchVersions(table, name)
    val comps = branchStateComponents(table, name)
    val priorDels = liveBranchDeletes(table, name)
    val priorEqs = liveBranchEqDeletes(table, name)
    val schema = declaredCleanOf(table).getOrElse(readBranch(spark, table, name).schema)
    def shape(s: org.apache.spark.sql.types.StructType): Seq[(String, String)] =
      s.fields.map(f => (f.name, f.dataType.catalogString)).sortBy(_._1).toSeq
    require(shape(schema) == shape(updates.schema),
      s"branch merge schema mismatch: expected ${shape(schema).mkString(",")} " +
        s"vs ${shape(updates.schema).mkString(",")}")
    keys.foreach(k => require(schema.fieldNames.contains(k),
      s"mergeIntoBranch: no key column $k (columns: ${schema.fieldNames.mkString(",")})"))
    val resolved = keyEnvelope(updates, keys, schema)
    val statless = comps.collect { case Left(d) => d }.flatMap(expandParquet)
    val stated = comps.collect { case Right(x) => x }
    // bloom layer: when the update keys are a small exact set (the
    // envelope carries them as In conjuncts) and the key column is
    // bloom-opted, files provably holding none of the keys carry by
    // reference even when their [min,max] spans the key range (the
    // hash-key shape); no-op without a _bloom.json marker
    val bloomAbsent = BloomSkip.provablyAbsent(table, stated.collect {
      case (p, st) if resolved.isEmpty || FileStats.mayMatch(st, resolved) => p
    }, resolved)
    val carried = stated.collect {
      case (p, st) if (resolved.nonEmpty && !FileStats.mayMatch(st, resolved)) ||
        bloomAbsent.contains(p) =>
        st.copy(name = rootRel(table, p))
    }
    val rewrite = statless ++ stated.collect {
      case (p, st) if !bloomAbsent.contains(p) &&
        (resolved.isEmpty || FileStats.mayMatch(st, resolved)) => p
    }
    val outCols = schema.fieldNames.toSeq
    val upd = updates.select(outCols.map(col): _*)
    commitBranchCow(spark, table, name, "merge", carried,
      priorDels, priorEqs, schema, bvs0, dir => {
        val base =
          if (rewrite.isEmpty)
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
          else {
            val reader = spark.read.option("mergeSchema", "true")
            applyAllDeletes(
              declaredCleanOf(table).fold(reader)(reader.schema).parquet(rewrite: _*),
              table, priorDels, priorEqs).select(outCols.map(col): _*)
          }
        // matched rows drop (their update replaces them), the update
        // set unions in whole — matched-UPDATE and not-matched-INSERT
        // in one pass; NULL staged keys survive the anti-join (SQL
        // equality never matches them)
        val kept = base.join(
          upd.select(keys.map(col): _*).distinct(), keys, "left_anti")
        writeBranchRewrite(spark, table, kept.unionByName(upd), dir)
      })
  }

  /** REBASE the branch onto the advanced main head (the divergence
    * escape hatch fast-forward points at): sound exactly when the
    * replay is append-only on BOTH sides — every main commit past the
    * fork base is a plain fast-append (no full-state rewrite, no
    * DML, no equality-delete retraction, which could retroactively
    * apply to branch rows through its bound) and every branch commit
    * is a fast-append (a branch-DML cow anchors a base state that
    * main has since replaced — publish order matters, so it refuses).
    * Appends commute, so moving the fork base to the head preserves
    * the published result exactly. Returns the new fork base. */
  def rebaseBranch(spark: SparkSession, table: String, name: String): Long = {
    val (tags, branches) = refsDoc(table)
    require(branches.contains(name), s"no branch $name of $table (branches: ${
      branches.keys.toSeq.sorted.mkString(",")})")
    val base = branches(name)
    val head = versions(table).last
    if (head == base) return base
    versions(table).filter(_ > base).foreach { v =>
      val op = operationOf(table, v)
      require(op == "append",
        s"cannot rebase $name: main v$v is a full-state '$op' commit — " +
          "append-only histories replay soundly; drop and restage the branch")
      require(EqDeletes.fromManifest(manifestText(table, v)).isEmpty,
        s"cannot rebase $name: main v$v carries equality-delete entries whose " +
          "bound could retroactively retract branch rows — drop and restage")
    }
    branchVersions(table, name).foreach { v =>
      require(branchOpOf(table, name, v) == "append",
        s"cannot rebase $name: branch v$v is a branch-DML commit anchored on " +
          "the old base — publish order matters; drop and restage")
    }
    writeRefs(table, tags, branches + (name -> head))
    head
  }

  /** PUBLISH the branch to main — Iceberg `fast_forward`: one
    * metadata-only main commit (operation `publish`) carrying the
    * ENTIRE branch state by reference (the same carried-refs shape
    * pruned copy-on-write commits use) — zero data files read,
    * copied or rewritten; retention pins the referenced directories
    * exactly like any carried ref. Refuses if main advanced past the
    * fork base (divergence — Iceberg's fast-forward makes the same
    * ancestor demand); the branch is consumed (dropped) on success.
    * Falls back to a materializing full-state write if any component
    * of the branch state predates per-file stats (carried refs need
    * row counts for manifest arithmetic). Returns the new main
    * version. */
  def fastForward(spark: SparkSession, table: String, name: String): Long = {
    val branches = branchesOf(table)
    require(branches.contains(name), s"no branch $name of $table (branches: ${
      branches.keys.toSeq.sorted.mkString(",")})")
    val base = branches(name)
    val vs = versions(table)
    require(vs.last == base,
      s"cannot fast-forward $name: main advanced past its fork base " +
        s"(base v$base, main v${vs.last}) — rebaseBranch (append-only histories) " +
        "or drop and restage")
    // the WHOLE branch state (base + appends + any branch-DML cow
    // anchor) as carried refs — one zero-copy metadata commit
    val comps = branchStateComponents(table, name)
    val allCarried: Option[Seq[FileStats.FileStat]] =
      if (comps.exists(_.isLeft)) None
      else Some(comps.collect { case Right((p, st)) =>
        st.copy(name = rootRel(table, p))
      })
    val v = reserveVersion(table)
    val publishedV = allCarried match {
      case Some(c) if c.nonEmpty =>
        // a delete-bearing branch state publishes ZERO-COPY with its
        // entries intact: carried files keep their origin versions, so
        // every equality bound keeps selecting exactly the rows it
        // always did, and positional sidecars follow their carried
        // targets — the same carried-ref argument CoW commits use
        val carriedNames = c.map(_.name).toSet
        // gate on the fork base: a main commit racing this publish
        // would otherwise vanish under the carried-ref full state
        commitCow(spark, table, v, operation = "publish", carried = c,
          deletes = MorDeletes.retarget(liveBranchDeletes(table, name), carriedNames),
          eqDeletes = survivingEqEntries(liveBranchEqDeletes(table, name), c),
          basedOn = Some(base))
        v
      case _ =>
        // statless component somewhere (pre-stats-era tables) or an
        // EMPTY branch state (a branch DML deleted every row):
        // materialize — correct, not zero-copy. writeSnapshot mints its
        // own reservation; release ours first.
        releaseVersion(table, v)
        writeSnapshot(readBranch(spark, table, name), table, operation = "publish",
          basedOn = Some(base))
    }
    // the branch is CONSUMED: its manifests go first (their data
    // directories now ride main's carried refs — re-creating the name
    // must never resurrect them and double-count rows), then the ref.
    // A crash between the two leaves a ref with no versions — ff then
    // refuses on divergence and dropBranch cleans up.
    deleteTree(branchMetaDir(table, name))
    val (tags, bs) = refsDoc(table)
    writeRefs(table, tags, bs - name)
    publishedV
  }

  /** The COMPLETE write-audit-publish loop in one call: run
    * `checksFor` over the branch's staged state ([[readBranch]] — the
    * exact frame a publish would expose) and publish via
    * [[fastForward]] only if every check passes; a failing audit
    * leaves main untouched and names the failing checks (the branch
    * stays for inspection — fix or [[dropBranch]]). This is
    * [[graft.quality.DataChecks.gatedWrite]]'s posture lifted onto
    * refs: the staged artifact is DURABLE (a branch, not a persisted
    * frame), so the audit and the publish see the same bytes by
    * construction, across sessions and failures. Returns (new main
    * version, audit report rows). */
  def wapPublish(spark: SparkSession, table: String, name: String,
                 checksFor: DataFrame => Seq[graft.quality.DataChecks.Check])
      : (Long, DataFrame) = {
    val staged = readBranch(spark, table, name)
    val rep = graft.quality.DataChecks.report(checksFor(staged))
    // one row per check — |checks|-bounded metadata
    val repRows = rep.collect()
    val failing = repRows.filter(!_.getBoolean(2))
    if (failing.nonEmpty)
      throw new IllegalStateException(
        s"publish of branch $name aborted, checks failed: " + failing
          .map(r => s"${r.getString(0)} (${r.getLong(1)} violations)")
          .mkString(", "))
    val v = fastForward(spark, table, name)
    (v, spark.createDataFrame(
      spark.sparkContext.parallelize(repRows.toIndexedSeq, 1), rep.schema))
  }

  /** Drop branch `name`: remove its ref and manifests, and delete its
    * version directories UNLESS some main state still references them
    * (a published branch's directories are carried refs — deleting
    * them would corrupt main; they fall to [[expireSnapshots]] once
    * unreferenced). */
  def dropBranch(spark: SparkSession, table: String, name: String): Unit = {
    val (tags, branches) = refsDoc(table)
    require(branches.contains(name), s"no branch $name of $table (branches: ${
      branches.keys.toSeq.sorted.mkString(",")})")
    val verSeg = "(?:^|/)v=(\\d+)(?:/|$)".r
    val pinned = versions(table)
      .flatMap(v => readSet(table, v))
      .flatMap(p => verSeg.findAllMatchIn(p).map(_.group(1).toLong)).toSet
    branchVersions(table, name).filterNot(pinned)
      .foreach(v => deleteTree(Paths.get(table, s"v=$v")))
    deleteTree(branchMetaDir(table, name))
    writeRefs(table, tags, branches - name)
  }

  /** Orphan-file cleanup (Iceberg `remove_orphan_files`): delete
    * debris under the table root that NO manifest references — a
    * failed/killed write's version directory that never committed its
    * manifest (files land first, the manifest is the commit point),
    * and Spark `_temporary` staging trees. Never touches a manifested
    * version directory's contents (expiry owns those) or root-level
    * `_`-metadata files. `olderThanMs` is the in-flight-commit guard
    * (Iceberg's `older_than` contract): an orphan candidate whose
    * NEWEST file is younger than the window is left alone — it may be
    * a commit between its write and manifest steps. Returns one row
    * per removed tree (path, files). Driver-side directory-level
    * listing — metadata-scale, no data read. */
  def removeOrphanFiles(s: SparkSession, table: String,
                        olderThanMs: Long = 24L * 3600 * 1000): DataFrame = {
    // live version numbers: the main chain, branch chains (manifests
    // filed under _meta/branches/ — committed state, not debris), AND
    // every version some main state still references through carried
    // refs — a published branch's data directories live inside main
    // manifests even though no version of their own number remains
    // (deleting them would destroy main's current rows)
    val verSegL = "(?:^|/)v=(\\d+)(?:/|$)".r
    val carriedLive = versions(table)
      .flatMap(v => readSet(table, v) ++
        // delete sidecar hosts are live too: a carried-ref commit can
        // keep another version's sidecar dirs load-bearing
        liveDeletes(table, v).map(_.dir) ++ liveEqDeletes(table, v).map(_.dir))
      .flatMap(p => verSegL.findAllMatchIn(p).map(_.group(1).toLong))
    val live = (versions(table) ++ allBranchVersions(table) ++ carriedLive).toSet
    val cutoff = System.currentTimeMillis() - olderThanMs
    val verSeg = "^v=(\\d+)$".r
    def newestMtime(p: java.nio.file.Path): Long =
      scala.util.Using.resource(Files.walk(p)) { w =>
        w.iterator().asScala.map(f => Files.getLastModifiedTime(f).toMillis)
          .foldLeft(0L)(math.max)
      }
    def treeFiles(p: java.nio.file.Path): Long =
      scala.util.Using.resource(Files.walk(p)) { w =>
        w.iterator().asScala.count(Files.isRegularFile(_)).toLong
      }
    val root = Paths.get(table)
    val topLevel = scala.util.Using.resource(Files.list(root)) { ls =>
      ls.iterator().asScala.toVector
    }
    val orphanTrees =
      // an uncommitted version directory: files exist, manifest never landed
      topLevel.filter(p => Files.isDirectory(p) && (p.getFileName.toString match {
        case verSeg(n) => !live.contains(n.toLong)
        case _ => false
      })) ++
      // staging debris at root and inside LIVE version directories
      (topLevel ++ live.toSeq.map(v => root.resolve(s"v=$v")).filter(Files.isDirectory(_))
        .flatMap(d => scala.util.Using.resource(Files.list(d)) { ls =>
          ls.iterator().asScala.toVector
        }))
        .filter(p => Files.isDirectory(p) && p.getFileName.toString == "_temporary")
    val (removed, kept) = orphanTrees.distinct.partition(newestMtime(_) < cutoff)
    val rows = removed.map(p => (rootRel(table, p.toString), treeFiles(p), "removed")) ++
      kept.map(p => (rootRel(table, p.toString), treeFiles(p), "kept-in-flight"))
    removed.foreach(deleteTree)
    import s.implicits._
    rows.toDF("path", "files", "status").orderBy("path")
  }

  /** Retention by AGE (Iceberg `expire_snapshots(older_than => ts)`):
    * expire every snapshot committed before `cutoffMs` except the
    * current one, with the same tag- and read-chain pinning as the
    * keepLast form. The expire set is selected by TIMESTAMP directly
    * — [[writeSnapshot]]/[[appendSnapshot]] accept caller-injected
    * commit times, so a non-monotone history must not be prefix-cut
    * by version position (that would keep versions older than the
    * cutoff and expire younger ones). */
  def expireSnapshotsOlderThan(s: SparkSession, table: String, cutoffMs: Long): DataFrame = {
    val times = commitTimes(table).toMap
    val vs = versions(table)
    require(vs.nonEmpty, s"no snapshots of $table")
    expireVersions(s, table,
      vs.dropRight(1).filter(v => times.getOrElse(v, Long.MaxValue) < cutoffMs).toSet)
  }

  def expireSnapshots(s: SparkSession, table: String, keepLast: Int): DataFrame = {
    require(keepLast >= 1, "must retain at least the current version")
    val vs = versions(table)
    expireVersions(s, table, vs.take(math.max(vs.length - keepLast, 0)).toSet)
  }

  /** The shared expiry walk: `candidates` may expire, minus tag pins
    * and read-chain pins. */
  private def expireVersions(s: SparkSession, table: String,
                             candidates: Set[Long]): DataFrame = {
    val before = snapshots(s, table)
      .select("version", "row_count").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    // tagged versions are retention-exempt (Iceberg ref-aware expiry):
    // the audit snapshot a tag pins must stay readable however far the
    // retention window moves past it
    val tagged = tagsOf(table).values.toSet
    val retained = before.map(_._1)
      .filter(v => !candidates.contains(v) || tagged.contains(v))
    // a retained fast-append version still READS its predecessors'
    // directories, and a retained copy-on-write version still reads
    // the directories its carried file refs live in (its readSet) —
    // expiring those would corrupt it, so they stay on disk even when
    // their manifests fall out of the keepLast window (Iceberg's
    // expire_snapshots makes the same distinction between expiring a
    // snapshot and deleting its files)
    val verSeg = "(?:^|/)v=(\\d+)(?:/|$)".r
    // pin every version a retained state still READS: its data
    // directories/carried refs AND the versions hosting its live
    // merge-on-read delete sidecars (a later CoW commit can carry a
    // sidecar entry long after its own version fell out of the window
    // — expiring that version would silently resurrect deleted rows)
    val pinnedDirs = (retained
      .flatMap(v => readSet(table, v) ++
        liveDeletes(table, v).map(_.dir) ++
        // equality sidecars too: a carried-ref commit keeps entries
        // live long after their own version fell out of the window
        liveEqDeletes(table, v).map(_.dir)) ++
      // branches are refs too: a live branch still READS its fork-base
      // state — expiring those directories would corrupt every branch
      // read and the eventual fast-forward publish; its base's delete
      // sidecar hosts are load-bearing the same way
      branchesOf(table).values.toSeq.flatMap(b => readSet(table, b) ++
        liveDeletes(table, b).map(_.dir) ++ liveEqDeletes(table, b).map(_.dir)))
      .flatMap(p => verSeg.findAllMatchIn(p).map(_.group(1).toLong)).toSet
    val expired = candidates -- tagged -- pinnedDirs
    expired.foreach { v =>
      deleteTree(Paths.get(table, s"v=$v"))
      Files.deleteIfExists(metaDir(table).resolve(s"$v.json"))
    }
    import s.implicits._
    before.toSeq
      .map { case (v, rows) =>
        (v, rows, if (expired.contains(v)) "expired" else "kept") }
      .toDF("version", "row_count", "status")
      .orderBy(col("version"))
  }

  /** Driver query: retention over the same deterministic 3-version
    * history the snapshots listing uses, keeping the last 2 — v1 must
    * expire, v2/v3 survive, and every reported row count is
    * recomputable from silver. */
  def vacuumQuery(s: SparkSession, dir: String): DataFrame =
    vacuumOver(s, graft.marts.DailySales.build(
      graft.marts.SilverEvents.build(Tables.events(s, dir))))

  /** Same, over an already-built daily mart. */
  def vacuumOver(s: SparkSession, daily: DataFrame): DataFrame =
    expireSnapshots(s, writeDailyHistory(daily, "graft_vac_"), keepLast = 2)

  /** DuckDB oracle: the retention decision replayed as counts. */
  val vacuumSql: String = graft.marts.SilverEvents.oracleCte + """
    |, daily AS (SELECT event_date FROM silver GROUP BY event_date)
    |SELECT * FROM (
    |  SELECT CAST(1 AS BIGINT) AS version,
    |    (SELECT count(*) FROM daily WHERE event_date <= DATE '2024-01-10') AS row_count,
    |    'expired' AS status
    |  UNION ALL SELECT 2,
    |    (SELECT count(*) FROM daily WHERE event_date <= DATE '2024-01-20'), 'kept'
    |  UNION ALL SELECT 3, (SELECT count(*) FROM daily), 'kept'
    |)
    |ORDER BY version""".stripMargin

  /** Driver query: CDC changelog between two deterministic versions of
    * the daily-sales mart — v1 is the full mart, v2 restates one date
    * (metric bump on 2024-01-05) and drops the dates after 2024-01-25 —
    * so [[diff]] must surface exactly one UPDATE plus one DELETE per
    * dropped date and, crucially, NO false UPDATEs for the untouched
    * dates (the md5-row-hash equality over two independent writes is
    * what this row pins). Every output row is recomputable from silver,
    * so the changelog surface itself is DuckDB-oracle-checkable. */
  def cdcDiffQuery(s: SparkSession, dir: String): DataFrame =
    cdcDiffOver(s, graft.marts.DailySales.build(
      graft.marts.SilverEvents.build(Tables.events(s, dir))))

  /** Same, over an already-built daily mart (reuses a cached silver). */
  def cdcDiffOver(s: SparkSession, daily: DataFrame): DataFrame = {
    val table = Files.createTempDirectory("graft_cdc_").toString + "/daily_sales"
    writeSnapshot(daily, table)
    val restated = daily
      .filter(col("event_date") <= lit("2024-01-25"))
      .withColumn("total_events",
        when(col("event_date") === lit("2024-01-05"), col("total_events") + 1)
          .otherwise(col("total_events")))
    writeSnapshot(restated, table, operation = "restate")
    diff(s, table, 1L, 2L, Seq("event_date"))
  }

  /** DuckDB oracle for [[cdcDiffQuery]]: the restatement replayed as
    * date predicates over the same mart's date domain. */
  val cdcDiffSql: String = graft.marts.SilverEvents.oracleCte + """
    |, daily AS (SELECT event_date FROM silver GROUP BY event_date)
    |SELECT event_date, 'UPDATE' AS change_type FROM daily
    |WHERE event_date = DATE '2024-01-05'
    |UNION ALL
    |SELECT event_date, 'DELETE' AS change_type FROM daily
    |WHERE event_date > DATE '2024-01-25'
    |ORDER BY event_date, change_type""".stripMargin

  /** DuckDB oracle: the version history replayed as counts over the
    * same mart definition. */
  val snapshotsSql: String = graft.marts.SilverEvents.oracleCte + """
    |, daily AS (SELECT event_date FROM silver GROUP BY event_date)
    |SELECT * FROM (
    |  SELECT CAST(1 AS BIGINT) AS version, 'overwrite' AS operation,
    |    (SELECT count(*) FROM daily WHERE event_date <= DATE '2024-01-10') AS row_count,
    |    13 AS num_columns
    |  UNION ALL SELECT 2, 'overwrite',
    |    (SELECT count(*) FROM daily WHERE event_date <= DATE '2024-01-20'), 14
    |  UNION ALL SELECT 3, 'overwrite', (SELECT count(*) FROM daily), 13
    |)
    |ORDER BY version""".stripMargin
}

/** A non-commuting commit lost its race: the state it planned against
  * is no longer the table head (or its version number was taken by a
  * concurrent writer). The commit was NOT published — re-run the
  * operation against the new head. This is the loud analogue of the
  * Iceberg catalog's commit-conflict validation (the reference's REST
  * catalog tier arbitrates exactly this); fast appends never throw it
  * (they re-mint and land as their own versions — appends commute). */
class GraftConcurrentCommitException(msg: String) extends IllegalStateException(msg)

/** A catalog table's declared storage-partitioned layout — the
  * transform every write lays files out by (one hidden `partCol=value/`
  * directory level per transform value) and every scan reports as
  * `KeyGroupedPartitioning`, so same-laid-out tables join with no
  * exchange (Iceberg's storage-partitioned join design over its
  * bucket/days transforms — reference `bronze_ingestion.py:113`
  * declares `PARTITIONED BY (days(_processing_date))`). */
private[sources] sealed trait GraftLayout {
  /** Source column the transform derives from. */
  def col: String
  /** Hidden directory-level column the write path partitions by. */
  def partCol: String
  /** SQL deriving the layout value from the source column — the SAME
    * definition the catalog's FunctionCatalog serves to the planner,
    * so the layout on disk and the function the optimizer reasons
    * with can never disagree. */
  def derivedExpr: String
}

private[sources] object GraftLayout {
  /** One layout era: files originating at version ≥ `fromV` (and
    * below the next era's bound) were laid out under `spec` (None =
    * plain). See [[Snapshots.layoutErasOf]]. */
  final case class Era(fromV: Long, spec: Option[GraftLayout])

  /** The marker-JSON fragment of one spec — the SAME shapes the
    * legacy single-spec marker used, so [[Snapshots.parseSpecFragment]]
    * round-trips both formats. */
  def specJson(spec: GraftLayout): String = spec match {
    case Bucket(n, c) => s"""{"bucket_n":$n,"bucket_col":"$c"}"""
    case Days(c, ts) =>
      s"""{"transform":"days","col":"$c","coltype":"${if (ts) "timestamp" else "date"}"}"""
  }

  /** `bucket(n, col)`: pmod(xxhash64(col), n). */
  final case class Bucket(n: Int, col: String) extends GraftLayout {
    val partCol: String = GraftSnapshotTable.BucketCol
    def derivedExpr: String = s"CAST(pmod(xxhash64(`$col`), ${n}L) AS INT)"
  }
  /** `days(col)`: days since epoch of the column's date — the Iceberg
    * days transform (DATE's internal representation, so the planner
    * function is the identity on date inputs). `timestampCol` records
    * the source column's type (persisted in the layout marker):
    * timestamps floor-divide their raw epoch micros — UTC, the Iceberg
    * timestamptz contract and EXACTLY what [[GraftDaysFunction]]
    * computes. Deriving the timestamp day via `CAST(col AS DATE)`
    * would go through the SESSION timezone and, near midnight in a
    * non-UTC session, write a day key the planner function disagrees
    * with — mis-routing SPJ shuffles and breaking the
    * single-definition invariant. `pmod` keeps the floor-division
    * exact in integer arithmetic (no double rounding at day
    * boundaries), including for pre-epoch timestamps. */
  final case class Days(col: String, timestampCol: Boolean = false) extends GraftLayout {
    val partCol: String = GraftSnapshotTable.DaysCol
    def derivedExpr: String =
      if (timestampCol)
        s"CAST((unix_micros(`$col`) - pmod(unix_micros(`$col`), 86400000000)) DIV 86400000000 AS INT)"
      else s"datediff(CAST(`$col` AS DATE), DATE '1970-01-01')"
  }

  /** All reserved derived-layout column names (data columns may not
    * shadow them — the write path would silently overwrite). */
  val reservedNames: Set[String] =
    Set(GraftSnapshotTable.BucketCol, GraftSnapshotTable.DaysCol)
}
