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
  * Caveat (documented, deliberate — NARROWED in r12 per the r11
  * verdict #3): `SparkEntry.scala` is excluded from the changed-file
  * set only when the diff is confined to the `queries`/`oracleSql`
  * REGISTRY LITERALS — the registry gains entries every round, which
  * would otherwise mark every query touched every round and
  * permanently disable drift detection. An edit anywhere ELSE in the
  * file (the `staged()` caching layer, `silver()`, eviction plumbing)
  * keeps the file in the changed set, and — since no query's closure
  * can contain the excluded file — [[mayBeCodeCaused]] treats a
  * changed `SparkEntry.scala` like a build-config change: every query
  * stays eligible for `regressed` (the staging layer touches them
  * all).
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

  private val sparkEntryPath = "src/main/scala/graft/SparkEntry.scala"

  /** `SparkEntry.scala` with the `queries`/`oracleSql` registry-literal
    * bodies removed (and line comments stripped so prose parentheses
    * can't derail the balance scan): the part of the file whose edits
    * must KEEP the file in the attribution changed set. Adding or
    * editing a registry row leaves this text unchanged; touching
    * `staged()`, `silver()`, or the eviction plumbing changes it. */
  /** Index just past a double-quoted string literal opening at `i`
    * (`"` or `"""`), honoring backslash escapes in the single-quoted
    * form; triple-quoted bodies have no escapes. Unterminated →
    * end-of-text. */
  private def skipStringFrom(t: String, i: Int): Int =
    if (t.startsWith("\"\"\"", i)) {
      val close = t.indexOf("\"\"\"", i + 3)
      if (close < 0) t.length else close + 3
    } else {
      var j = i + 1
      while (j < t.length) {
        t.charAt(j) match {
          case '\\' => j += 2
          case '"'  => return j + 1
          case _    => j += 1
        }
      }
      t.length
    }

  /** Strip `//`-to-EOL comments EXCEPT inside string literals — a
    * registry SQL string may legitimately contain `//` (a URL, an
    * integer-division `a//b` in some dialect), and the old regex strip
    * would truncate it, corrupting the balance scan downstream. */
  private[graft] def stripLineComments(t: String): String = {
    val sb = new StringBuilder(t.length)
    var i = 0
    while (i < t.length) {
      // char literal first ('x' or '\x'): the double quote inside '"'
      // must not open a string region — mispairing would scan to the
      // next unrelated quote and misclassify every later edit
      if (t.charAt(i) == '\'' && i + 2 < t.length &&
          (t.charAt(i + 2) == '\'' || t.charAt(i + 1) == '\\')) {
        val j = math.min(i + (if (t.charAt(i + 1) == '\\') 4 else 3), t.length)
        sb.append(t.substring(i, j)); i = j
      } else if (t.charAt(i) == '"') {
        val j = skipStringFrom(t, i)
        // substring, not append(t, i, j): the 3-arg form auto-tuples
        // into StringBuilder.append(Any) and stringifies the WHOLE
        // text per call
        sb.append(t.substring(i, j)); i = j
      } else if (t.startsWith("//", i)) {
        while (i < t.length && t.charAt(i) != '\n') i += 1
      } else { sb.append(t.charAt(i)); i += 1 }
    }
    sb.toString
  }

  private[graft] def nonRegistryText(text: String): String = {
    val noComments = stripLineComments(text)
    def stripMapBody(t: String, defName: String): String = {
      val defIdx = t.indexOf(s"def $defName")
      if (defIdx < 0) return t
      val mapIdx = t.indexOf("Map(", defIdx) // the literal, not the Map[...] type
      if (mapIdx < 0) return t
      var depth = 0
      var i = mapIdx + 3
      var end = -1
      while (i < t.length && end < 0) {
        t.charAt(i) match {
          // a paren inside a string literal is registry DATA, not
          // structure: an unbalanced '(' in a future row's SQL would
          // otherwise extend the stripped region past the Map literal
          // and launder a staging-layer edit to epoch-drift — the
          // exact failure this function exists to prevent. (Parens
          // inside s"${...}" interpolations are balanced by the
          // compiler, so skipping whole strings preserves balance.)
          case '"' => i = skipStringFrom(t, i) - 1
          // char literal: '(' / ')' / '\x' must not move the depth
          case '\'' if i + 2 < t.length &&
            (t.charAt(i + 2) == '\'' || t.charAt(i + 1) == '\\') =>
            i += (if (t.charAt(i + 1) == '\\') 3 else 2)
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) end = i
          case _ =>
        }
        i += 1
      }
      if (end < 0) t else t.substring(0, mapIdx + 4) + t.substring(end)
    }
    stripMapBody(stripMapBody(noComments, "queries"), "oracleSql")
  }

  /** Did the NON-registry part of `SparkEntry.scala` change between
    * `prevSha` and the working tree? Unreadable old version (sha
    * predates the file, git failure) answers true — the conservative
    * direction; unknown never launders a staging-layer regression. */
  private def sparkEntryNonRegistryChanged(prevSha: String): Boolean =
    try {
      val p = new ProcessBuilder("git", "show", s"$prevSha:$sparkEntryPath").start()
      // UTF-8 explicitly: the file contains non-ASCII prose and the
      // sandbox JVM's default charset may be ASCII — a decode throw
      // here would conservatively mark the file changed EVERY round,
      // silently globalizing eligibility for good
      val prevText = scala.io.Source.fromInputStream(p.getInputStream, "UTF-8").mkString
      if (p.waitFor() != 0) true
      else nonRegistryText(prevText) != nonRegistryText(readFile(new File(sparkEntryPath)))
    } catch { case _: Throwable => true }

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
      } yield {
        val raw = (committed ++ dirty ++ untracked).toSet
          .map((s: String) => s.stripPrefix("\"").stripSuffix("\""))
          .filter(_.nonEmpty)
        // registry-literal-only SparkEntry edits are excluded (see the
        // object scaladoc); a staging-layer edit keeps the file in —
        // the lazy evaluation only shells out when the diff touched it
        if (raw.exists(_.endsWith("graft/SparkEntry.scala")) &&
            !sparkEntryNonRegistryChanged(prevSha))
          raw.filterNot(_.endsWith("graft/SparkEntry.scala"))
        else raw
      }
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
              // SparkEntry survives changedSince's registry-literal
              // filter only when the staging layer changed — and the
              // staging layer is in every query's runtime path while
              // being in no query's closure (closures exclude the
              // registry file by construction): globalize eligibility
              ch.exists(_.endsWith("graft/SparkEntry.scala")) ||
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
