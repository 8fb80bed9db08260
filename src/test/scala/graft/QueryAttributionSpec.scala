package graft

import org.scalatest.funsuite.AnyFunSuite

/** The adjudicator's code-attribution signal (r9 verdict: "regressed"
  * must mean code-attributable — 13 of 14 labels were machine-epoch
  * drift on untouched code paths). */
class QueryAttributionSpec extends AnyFunSuite {

  test("entry parsing: identifiers per query, queries+oracleSql unioned") {
    val src =
      """  def queries = Map(
        |    "q_alpha" -> ((s, dir) => DailySales.build(silver(s, dir))),
        |    "q_beta" -> (TpchQueries.revenueByNation _))
        |  def oracleSql = Map(
        |    "q_alpha" -> AlphaOracle.sql,
        |    "q_beta" -> "SELECT 1")
        |""".stripMargin
    val ids = QueryAttribution.entryIdentifiers(src)
    assert(ids("q_alpha").contains("DailySales"))
    assert(ids("q_alpha").contains("AlphaOracle"), "oracleSql ids must union in")
    // the lowercase silver() helper resolves to the module code it delegates to
    assert(ids("q_alpha").contains("SilverEvents"))
    assert(ids("q_beta").contains("TpchQueries"))
  }

  test("definedNames finds top-level objects, classes, traits") {
    val names = QueryAttribution.definedNames(
      """object Foo { class Inner }
        |private[graft] case class Bar(x: Int)
        |trait Baz""".stripMargin)
    assert(Set("Foo", "Bar", "Baz").subsetOf(names))
  }

  test("real repo mapping: queries resolve to their implementing files") {
    val qf = QueryAttribution.queryFiles()
    assert(qf.nonEmpty, "mapping must build from the real sources")
    assert(qf("q_ewma_scan_report").exists(_.endsWith("ops/EwmaScan.scala")))
    assert(qf("gold_daily_sales").exists(_.endsWith("marts/DailySales.scala")))
    // transitive through the silver() delegation
    assert(qf("gold_daily_sales").exists(_.endsWith("marts/SilverEvents.scala")))
    // SparkEntry itself is excluded — registry growth each round must
    // not mark every query touched every round
    assert(!qf.values.flatten.exists(_.endsWith("SparkEntry.scala")))
  }

  test("mayBeCodeCaused: unknown stays eligible, untouched means drift") {
    // fixtures must be REAL files: a changed path absent from the
    // current tree (rename/move inside the window) globalizes
    // eligibility by design, so a fictitious path can't stand in for
    // "some other untouched file" any more
    val fileX = "src/main/scala/graft/ops/TopK.scala"
    val fileY = "src/main/scala/graft/ops/Bucketize.scala"
    assert(new java.io.File(fileX).isFile && new java.io.File(fileY).isFile)
    val qf = Map("q_x" -> Set(fileX))
    // no attribution window → everything eligible (never launder)
    assert(QueryAttribution.mayBeCodeCaused("q_x", qf, None))
    // untouched call closure → drift, not regressed
    assert(!QueryAttribution.mayBeCodeCaused("q_x", qf, Some(Set(fileY))))
    // touched → eligible
    assert(QueryAttribution.mayBeCodeCaused("q_x", qf, Some(Set(fileX))))
    // build config changes can move anything
    assert(QueryAttribution.mayBeCodeCaused("q_x", qf, Some(Set("build.sbt"))))
    // unregistered query → conservative
    assert(QueryAttribution.mayBeCodeCaused("q_new", qf, Some(Set.empty)))
    // a changed source path that no longer exists (moved/renamed in
    // the window: diff reports the old path, the closure knows only
    // the new one) keeps EVERY query eligible — unknown never
    // launders a regression (r10 ADVICE)
    assert(QueryAttribution.mayBeCodeCaused("q_x", qf,
      Some(Set("src/main/scala/graft/ops/NoSuchFileEver.scala"))))
  }

  test("changedSince: empty sha yields None; a real ancestor sha parses") {
    assert(QueryAttribution.changedSince("").isEmpty)
    // HEAD..HEAD diff = only working-tree changes; must not throw
    val head = {
      val p = new ProcessBuilder("git", "rev-parse", "HEAD").start()
      val out = scala.io.Source.fromInputStream(p.getInputStream).mkString.trim
      p.waitFor(); out
    }
    val ch = QueryAttribution.changedSince(head)
    assert(ch.isDefined)
  }

  // r11 verdict #3: a staging-layer edit must keep SparkEntry in the
  // changed set (its regression would otherwise be laundered to
  // epoch-drift); only registry-literal edits are excluded.
  test("nonRegistryText: adding a registry row changes nothing; editing staged() changes it") {
    val base =
      """object SparkEntry {
        |  private def staged(s: S, dir: String)(f: => DataFrame): DataFrame = {
        |    val v = f.localCheckpoint()
        |    v
        |  }
        |  def queries: Map[String, Fn] = Map(
        |    "q_alpha" -> ((s, dir) => DailySales.build(silver(s, dir))))
        |  def oracleSql: Map[String, String] = Map(
        |    "q_alpha" -> AlphaOracle.sql)
        |}""".stripMargin
    val rowAdded = base
      .replace(
        "\"q_alpha\" -> ((s, dir) => DailySales.build(silver(s, dir))))",
        "\"q_alpha\" -> ((s, dir) => DailySales.build(silver(s, dir))),\n" +
          "    \"q_beta\" -> (TpchQueries.revenueByNation _))")
      .replace(
        "\"q_alpha\" -> AlphaOracle.sql)",
        "\"q_alpha\" -> AlphaOracle.sql,\n    \"q_beta\" -> BetaOracle.sql)")
    val stagedEdited = base.replace("f.localCheckpoint()", "f.cache()")
    assert(rowAdded != base && stagedEdited != base)
    assert(QueryAttribution.nonRegistryText(base) ==
      QueryAttribution.nonRegistryText(rowAdded),
      "a registry-only edit must not mark the file changed")
    assert(QueryAttribution.nonRegistryText(base) !=
      QueryAttribution.nonRegistryText(stagedEdited),
      "a staging-layer edit must mark the file changed")
  }

  test("nonRegistryText: parens and // inside registry strings cannot derail the strip") {
    // an unmatched '(' inside a registry-row STRING must not extend
    // the stripped region past the Map literal (which would hide the
    // staging layer from the changed-set comparison and launder a
    // staging regression to epoch-drift); a "//" inside a SQL string
    // must not truncate it like a line comment
    val base =
      """object SparkEntry {
        |  private def staged(s: S, dir: String)(f: => DataFrame): DataFrame = {
        |    val v = f.localCheckpoint()
        |    v
        |  }
        |  def queries: Map[String, Fn] = Map(
        |    "q_alpha" -> ((s, dir) => s.sql("SELECT count( FROM t -- oops")))
        |  def oracleSql: Map[String, String] = Map(
        |    "q_alpha" -> "SELECT 'a//b' AS frag, count(*) FROM t")
        |}""".stripMargin
    val stripped = QueryAttribution.nonRegistryText(base)
    assert(stripped.contains("def staged") && stripped.contains("localCheckpoint"),
      "the staging layer must survive an unbalanced '(' inside a registry string")
    val stagedEdited = base.replace("f.localCheckpoint()", "f.cache()")
    assert(QueryAttribution.nonRegistryText(base) !=
      QueryAttribution.nonRegistryText(stagedEdited),
      "a staging edit must still mark the file changed under hostile registry strings")
    // a char literal ')' in CODE position inside the Map body must not
    // close the depth early (which would leave registry rows behind)
    val charParen = base.replace("s.sql(", "s.sql(sep(')') + ")
    val strippedCp = QueryAttribution.nonRegistryText(charParen)
    assert(strippedCp.contains("def staged"))
    assert(!strippedCp.contains("oops"),
      "registry rows after a code char-literal ')' must still be stripped")
  }

  test("nonRegistryText on the real SparkEntry keeps the staging layer, drops the registry rows") {
    val text = scala.io.Source.fromFile("src/main/scala/graft/SparkEntry.scala", "UTF-8").mkString
    val stripped = QueryAttribution.nonRegistryText(text)
    assert(stripped.contains("def staged"), "the staging layer must survive the strip")
    assert(stripped.contains("def evictStages"))
    assert(!stripped.contains("\"silver_events\""),
      "registry rows must be stripped — their churn is round-normal")
    assert(!stripped.contains("\"gold_daily_sales\""))
  }

  test("stripLineComments: a char literal '\"' does not open a string region") {
    // the double quote inside a Scala char literal must not be taken
    // as a string opener — skipStringFrom would scan to the next
    // unrelated quote, mispairing every later string/comment region
    // and silently skewing drift attribution
    val t = "val quote = '\"'\n" +
      "// gone1\n" +
      "val s = \"kept // not a comment\" // gone2\n" +
      "val esc = '\\''\n" +
      "// gone3\n"
    val out = QueryAttribution.stripLineComments(t)
    assert(out.contains("'\"'"), "the char literal itself must survive")
    assert(out.contains("'\\''"), "escaped char literals must survive")
    assert(!out.contains("gone1") && !out.contains("gone2") && !out.contains("gone3"),
      s"comments after char literals must still strip:\n$out")
    assert(out.contains("kept // not a comment"),
      "a // inside a real string must not be treated as a comment")
  }

  test("mayBeCodeCaused: a surviving SparkEntry change globalizes eligibility") {
    val fileX = "src/main/scala/graft/ops/TopK.scala"
    val qf = Map("q_x" -> Set(fileX))
    assert(QueryAttribution.mayBeCodeCaused("q_x", qf,
      Some(Set("src/main/scala/graft/SparkEntry.scala"))),
      "a staging-layer edit touches every query's runtime path")
  }
}
