package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextAnalysis
import graft.sources.Tables

class TextAnalysisSpec extends AnyFunSuite {
  import TestSession._

  lazy val stats = TextAnalysis.docStats(Tables.documents(spark, sf)).cache()

  test("doc_stats: one row per doc, counts consistent") {
    val docs = Tables.documents(spark, sf).count()
    assert(stats.count() === docs)
    assert(stats.filter(col("unique_token_count") > col("token_count")).count() === 0)
    assert(stats.filter(col("stopword_count") > col("token_count")).count() === 0)
    assert(stats.filter(col("alpha_chars") > col("char_len")).count() === 0)
  }

  test("doc_stats: quality score bounded [0,1]") {
    assert(stats.filter(col("quality_score") < 0 || col("quality_score") > 1).count() === 0)
  }

  test("fingerprint is whitespace-normalization invariant") {
    import spark.implicits._
    val df = Seq(("a b c", 1L), ("a  b   c", 2L), ("a b d", 3L)).toDF("text", "doc_id")
    val fps = TextAnalysis.docStats(
        df.withColumn("lang", lit("en")).withColumn("source", lit("s"))
          .withColumn("n_chars", length(col("text"))))
      .select("doc_id", "fingerprint").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(3L))
  }

  test("lang_id: guesses in domain, scores nonnegative") {
    val li = TextAnalysis.langId(Tables.documents(spark, sf)).cache()
    val guesses = li.select("lang_guess").distinct().collect().map(_.getString(0)).toSet
    assert(guesses.subsetOf(Set("en", "fr", "es", "de", "und")))
    assert(li.filter(col("s_en") < 0 || col("s_fr") < 0).count() === 0)
  }

  test("source_quality: per-source rollup sums to corpus totals") {
    val sq = TextAnalysis.sourceQuality(Tables.documents(spark, sf))
    assert(sq.agg(sum("doc_count")).first().getLong(0) === stats.count())
    assert(sq.filter(col("min_quality") > col("max_quality")).count() === 0)
  }

  test("curation verdicts: one per doc, reason priority respected") {
    import spark.implicits._
    import graft.text.Curation
    import graft.dedup.NearDup
    // all-distinct tokens so the quality gates pass (no repeated 2-grams)
    val bodyEval = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val bodyPair = "separate narrative concerning maritime navigation charts " +
      "harbors vessels cargo manifests routes tides anchors beacons keels " +
      "masts rudders sails compasses sextants horizons latitudes longitudes"
    val bodyClean = "entirely different prose about numerous other topics " +
      "covering first second third fourth fifth sixth seventh eighth ninth " +
      "tenth eleventh twelfth thirteenth fourteenth fifteenth sixteenth items"
    // 0: eval holdout (also a dup of 1 — holdout must win)
    // 1: identical to the eval doc -> contaminated wins over duplicate
    // 2/3: identical dups sharing nothing with eval; 2 is rep -> 3 duplicate
    // 4: degenerate repetition -> quality_reject
    // 5: clean -> kept
    val docs = Seq(
      (0L, bodyEval, "s"), (1L, bodyEval, "s"),
      (2L, bodyPair, "s"), (3L, bodyPair, "s"),
      (4L, "spam " * 40, "s"),
      (5L, bodyClean, "s"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val got = Curation.verdicts(docs, NearDup.jaccardPairs(docs))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got(0L) === "eval_holdout")
    assert(got(1L) === "contaminated")
    assert(got(3L) === "duplicate")
    assert(got(4L) === "quality_reject")
    assert(got(5L) === "kept")
    assert(got.size === 6)
  }

  test("repetition_profile: known corpus, exact Gopher-family metrics") {
    import spark.implicits._
    import graft.text.QualityFilters
    // doc 1: "spam spam spam spam" — 4 tokens, 1 type, every 2-gram is
    // "spam spam" (3 occurrences, all duplicated), 3-gram top = 2/2
    // doc 2: "a b c d" — all distinct, zero repetition
    val docs = Seq((1L, "spam spam spam spam"), (2L, "a b c d"))
      .toDF("doc_id", "text")
    val got = QualityFilters.repetitionProfile(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    // columns: token_count, type_token_ratio, top_word_share, dup_2gram_frac, top_3gram_share
    assert(got(1L) === ((4L, 0.25, 1.0, 1.0, 1.0)))
    assert(got(2L) === ((4L, 1.0, 0.25, 0.0, 0.5)))
  }

  test("repetition_profile: short docs produce null n-gram stats, not errors") {
    import spark.implicits._
    import graft.text.QualityFilters
    val docs = Seq((1L, "solo"), (2L, "two words")).toDF("doc_id", "text")
    val rows = QualityFilters.repetitionProfile(docs).collect()
    val one = rows.find(_.getLong(0) == 1L).get
    assert(one.getLong(1) === 1L)      // token_count
    assert(one.isNullAt(4) && one.isNullAt(5)) // no 2-grams, no 3-grams
    val two = rows.find(_.getLong(0) == 2L).get
    assert(two.getDouble(4) === 0.0)   // one distinct 2-gram, not duplicated
    assert(two.isNullAt(5))            // no 3-grams
  }

  test("vocab_coverage: OOV counted against the deterministic top-K vocab") {
    import spark.implicits._
    import graft.text.QualityFilters
    // "the" appears 4×, "of" 3× -> top-2 vocab = {the, of};
    // doc 3 then has 2 OOV tokens of 4
    val docs = Seq(
      (1L, "the the of rare1"), (2L, "the of of unique2"),
      (3L, "the the of strange3 odd4")).toDF("doc_id", "text")
    val got = QualityFilters.vocabCoverage(docs, topK = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got(1L) === ((4L, 1L, 0.25)))
    assert(got(2L) === ((4L, 1L, 0.25)))
    assert(got(3L) === ((5L, 2L, 0.4)))
  }

  test("per-source sample: exactly k per source, deterministic across calls") {
    import graft.text.QualityFilters
    val docs = Tables.documents(spark, sf)
    val s1 = QualityFilters.samplePerSource(docs, k = 7).collect()
    val s2 = QualityFilters.samplePerSource(docs, k = 7).collect()
    assert(s1.toSeq === s2.toSeq, "hash-rank sampling must be reproducible")
    val perSource = s1.groupBy(_.getString(0)).map { case (_, rows) => rows.length }
    assert(perSource.forall(_ === 7))
    // sample membership is a pure function of doc_id: disjoint k prefixes nest
    val s3 = QualityFilters.samplePerSource(docs, k = 3)
      .select("source", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val s7 = s1.map(r => (r.getString(0), r.getLong(2))).toSet
    assert(s3.subsetOf(s7), "smaller samples must nest inside larger ones")
  }

  test("bigram LM: repeated transitions score lower than unique ones") {
    import spark.implicits._
    import graft.text.QualityFilters
    val docs = Seq(
      (1L, "a b a b a b a b"),   // one dominant transition
      (2L, "c d e f g h"),       // all transitions unique
      (3L, "solo"))              // <2 tokens -> no bigrams, no row
      .toDF("doc_id", "text")
    val got = QualityFilters.bigramLmScores(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet === Set(1L, 2L))
    assert(got(1L)._1 === 7L && got(2L)._1 === 5L) // n_bigrams = tokens - 1
    assert(got(1L)._2 < got(2L)._2,
      s"repetitive doc must be more predictable: ${got(1L)._2} vs ${got(2L)._2}")
    assert(got.values.forall(_._2 > 0))
  }

  test("skew report: k rows per table, shares bounded and ranked") {
    val rep = SparkEntry.queries("meta_skew_report")(spark, sf).collect()
    val byTable = rep.groupBy(_.getString(0))
    assert(byTable.keySet === Set("lineitem", "events"))
    assert(byTable.values.forall(_.length === 10))
    assert(rep.forall(r => r.getDouble(4) > 0 && r.getDouble(4) <= 100))
    byTable.values.foreach { rows =>
      val counts = rows.map(_.getLong(3))
      assert(counts.sameElements(counts.sortBy(-_)), "must rank by count desc")
    }
  }

  test("cdc diff query: one restated UPDATE, tail DELETEs, no false changes") {
    val daily = graft.marts.DailySales.build(
      graft.marts.SilverEvents.build(Tables.events(spark, sf)))
    val changes = graft.sources.Snapshots.cdcDiffOver(spark, daily)
      .collect().map(r => r.get(0).toString -> r.getString(1))
    assert(changes.count(_._2 == "UPDATE") === 1)
    assert(changes.filter(_._2 == "UPDATE").head._1 === "2024-01-05")
    assert(changes.filter(_._2 == "DELETE").forall(_._1 > "2024-01-25"))
    assert(!changes.exists(_._2 == "INSERT"))
  }
}
