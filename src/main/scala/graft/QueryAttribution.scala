package graft

import java.io.File

/** Static code-attribution for the bench drift adjudicator: which
  * queries could a given set of changed source files have slowed down?
  *
  * The r9 verdict found the adjudicator miscalibrated — 14 `regressed`
  * labels, 13 of them uniform 1.3–2× machine-epoch inflation on code
  * paths no commit had touched. "Regressed" must mean CODE-ATTRIBUTABLE,
  * so the adjudicator needs the call-graph question answered: the
  * query registry in [[SparkEntry]] maps names to entry expressions;
  * this object parses those expressions for the graft objects they
  * call, resolves each object to its defining file, and closes the
  * mapping transitively over a file-references-file graph (file A
  * references file B when A's text mentions one of B's top-level
  * type/object names). Name-collision overapproximation is the safe
  * direction: a false "touched" can only keep a `regressed` label that
  * closer inspection may downgrade, never launder a real regression
  * into drift.
  *
  * Caveat (documented, deliberate): `SparkEntry.scala` itself is
  * excluded from the changed-file set — the registry gains entries
  * every round, which would otherwise mark every query touched every
  * round and permanently disable drift detection. Its helper functions
  * (`silver`, `silverSqlFrame`, eviction plumbing) are thin delegations
  * to module code that IS tracked.
  */
object QueryAttribution {

  private val srcRoot = "src/main/scala"

  private def readFile(f: File): String =
    try {
      val s = scala.io.Source.fromFile(f, "UTF-8")
      try s.mkString finally s.close()
    } catch { case _: Throwable => "" }

  private def scalaFiles(root: File): Seq[File] = {
    def walk(d: File): Seq[File] = {
      val kids = Option(d.listFiles()).getOrElse(Array.empty[File]).toSeq
      kids.filter(_.isFile).filter(_.getName.endsWith(".scala")) ++
        kids.filter(_.isDirectory).flatMap(walk)
    }
    walk(root)
  }

  /** Top-level object/class/trait names defined in a source text. */
  private[graft] def definedNames(text: String): Set[String] =
    "(?m)^\\s*(?:private\\[[^\\]]*\\]\\s+)?(?:case\\s+)?(?:object|class|trait)\\s+([A-Za-z0-9_]+)".r
      .findAllMatchIn(text).map(_.group(1)).toSet

  /** query name -> capitalized identifiers its registry entry calls,
    * parsed from the `queries`/`oracleSql` registry source text. An
    * entry spans from its `"name" ->` to the next `"name" ->`. */
  private[graft] def entryIdentifiers(registrySource: String): Map[String, Set[String]] = {
    val entryPat = "\"([a-z0-9_]+)\"\\s*->".r
    val ms = entryPat.findAllMatchIn(registrySource).toSeq
    ms.zipWithIndex.map { case (m, i) =>
      val end = if (i + 1 < ms.size) ms(i + 1).start else registrySource.length
      val body = registrySource.substring(m.end, end)
      val ids = "\\b([A-Z][A-Za-z0-9_]+)\\b".r.findAllMatchIn(body)
        .map(_.group(1)).toSet ++
        // the registry's lowercase helpers are thin delegations whose
        // real implementation lives in module code — resolve them so a
        // SilverEvents/Tables change attributes to every mart that
        // reads the shared silver cache
        (if (body.contains("silver(") || body.contains("silverSqlFrame("))
           Set("SilverEvents", "Tables") else Set.empty[String])
      m.group(1) -> ids
    }.groupBy(_._1) // a name appears in BOTH queries and oracleSql: union
      .map { case (q, es) => q -> es.flatMap(_._2).toSet }
  }

  /** Full mapping: query name -> repo-relative source paths in its
    * static call closure. Empty map when sources are unreadable (the
    * caller then treats every query as eligible — the pre-r10
    * behavior). */
  def queryFiles(repoDir: String = "."): Map[String, Set[String]] = {
    val root = new File(repoDir, srcRoot)
    val entryFile = new File(root, "graft/SparkEntry.scala")
    if (!entryFile.isFile) return Map.empty
    val files = scalaFiles(root)
    val texts: Map[String, String] = files.map { f =>
      val rel = f.getPath.stripPrefix(new File(repoDir).getPath)
        .stripPrefix("/").replace(File.separatorChar, '/')
      rel -> readFile(f)
    }.toMap
    val entryRel = texts.keys.find(_.endsWith("graft/SparkEntry.scala")).getOrElse("")
    val defs: Map[String, Set[String]] = texts.map { case (p, t) => p -> definedNames(t) }
    // name -> defining files (collisions keep ALL definers — overapprox)
    val definers: Map[String, Set[String]] =
      defs.toSeq.flatMap { case (p, ns) => ns.map(_ -> p) }
        .groupBy(_._1).map { case (n, ps) => n -> ps.map(_._2).toSet }
    // file -> files it references (by defined name mention), excluding
    // SparkEntry (see caveat in the object scaladoc)
    val refs: Map[String, Set[String]] = texts.map { case (p, t) =>
      p -> definers.collect {
        case (name, ps) if t.contains(name) => ps
      }.flatten.filterNot(_ == entryRel).toSet
    }
    def closure(seed: Set[String]): Set[String] = {
      var acc = seed
      var frontier = seed
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(f => refs.getOrElse(f, Set.empty)) -- acc
        acc ++= next
        frontier = next
      }
      acc
    }
    entryIdentifiers(texts(entryRel)).map { case (q, ids) =>
      q -> closure(ids.flatMap(definers.getOrElse(_, Set.empty)))
    }
  }

  /** Changed files since `prevSha` (committed diff + working tree),
    * repo-relative. None when git is unavailable or the sha is unknown
    * — callers must then keep every query eligible for `regressed`.
    *
    * The working-tree set comes from `git diff --name-only HEAD` plus
    * untracked `git ls-files --others` — NOT from porcelain parsing
    * (r10 ADVICE: porcelain rename entries are "old -> new" composite
    * strings, and quoted paths keep their quotes, so a renamed-but-
    * modified file became invisible to attribution and its regression
    * would be laundered to "epoch-drift"). Both commands emit one
    * plain path per line with no rename arrows to mis-split. */
  def changedSince(prevSha: String): Option[Set[String]] =
    if (prevSha == null || prevSha.isEmpty) None
    else try {
      def run(cmd: String*): Option[Seq[String]] = {
        val p = new ProcessBuilder(cmd: _*).redirectErrorStream(false).start()
        val out = scala.io.Source.fromInputStream(p.getInputStream).getLines().toList
        if (p.waitFor() == 0) Some(out) else None
      }
      for {
        committed <- run("git", "diff", "--name-only", s"$prevSha..HEAD")
        dirty <- run("git", "diff", "--name-only", "HEAD")
        untracked <- run("git", "ls-files", "--others", "--exclude-standard")
      } yield (committed ++ dirty ++ untracked).toSet
        .map((s: String) => s.stripPrefix("\"").stripSuffix("\""))
        .filter(_.nonEmpty)
        .filterNot(_.endsWith("graft/SparkEntry.scala"))
    } catch { case _: Throwable => None }

  /** The adjudicator's question: may this query's slowdown be
    * code-attributable? True when attribution is unavailable (no prev
    * sha, no sources, git failure) — unknown must never downgrade a
    * real regression to drift. */
  def mayBeCodeCaused(query: String, queryToFiles: Map[String, Set[String]],
                      changed: Option[Set[String]]): Boolean =
    changed match {
      case None => true
      case Some(ch) =>
        queryToFiles.get(query) match {
          case None => true // unregistered query — stay conservative
          case Some(fs) =>
            val chScala = ch.filter(_.startsWith(srcRoot))
            fs.exists(chScala.contains) ||
              // a non-source change that can move timings (build
              // config, testdata regeneration) keeps everything
              // eligible
              ch.exists(c => c == "build.sbt" || c.startsWith("project/")) ||
              // a changed source path that resolves to NO current file
              // (moved/renamed inside the window: the diff reports the
              // old path, the closure only knows the new one) keeps
              // everything eligible — the conservative direction (r10
              // ADVICE: the old-path/new-path split would otherwise
              // launder a regression in the renamed file)
              chScala.exists(c => !new File(c).isFile)
        }
    }
}
