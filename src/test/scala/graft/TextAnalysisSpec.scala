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
}
