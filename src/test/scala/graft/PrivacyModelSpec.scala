package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables
import graft.text.{DsirWeights, LmBatchScorer, PiiRedaction, QualityFilters}

/** PII redaction on organic text, DSIR direction, and the
  * broadcast-model batch scorer's exact parity with the relational LM. */
class PrivacyModelSpec extends AnyFunSuite {
  import TestSession._

  test("pii: organic emails/phones/ips are counted and scrubbed") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail me at jane.doe+x@sub.example.org today"),
      (2L, "call 555-867-5309 or visit 192.168.1.7 now"),
      (3L, "nothing sensitive here at all"),
      (4L, "two mails a@b.io c@d.co one ip 8.8.8.8 and 555-111-2222"))
      .toDF("doc_id", "text")
    val out = PiiRedaction.redact(df, col("text")).cache()
    val m = out.collect().map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Int]("n_emails"), r.getAs[Int]("n_phones"), r.getAs[Int]("n_ips")))).toMap
    assert(m(1L) === ((1, 0, 0)))
    assert(m(2L) === ((0, 1, 1)))
    assert(m(3L) === ((0, 0, 0)))
    assert(m(4L) === ((2, 1, 1)))
    assert(out.filter(col("doc_id") === 3L).select("has_pii").first().getBoolean(0) === false)
    // redaction removes every match: re-running detection on the
    // redacted text finds nothing
    val redacted = df.withColumn("text",
      regexp_replace(regexp_replace(regexp_replace(col("text"),
        PiiRedaction.EmailRe, "[EMAIL]"), PiiRedaction.Ipv4Re, "[IP]"),
        PiiRedaction.PhoneRe, "[PHONE]"))
    val recheck = PiiRedaction.redact(redacted, col("text"))
    assert(recheck.filter(col("has_pii")).count() === 0)
  }

  test("pii: driver query flags every augmented doc") {
    val out = PiiRedaction.redactionQuery(spark, sf)
    assert(out.filter(!col("has_pii")).count() === 0)
    assert(out.filter(col("n_emails") < 1 || col("n_phones") < 1 || col("n_ips") < 1)
      .count() === 0)
  }

  test("dsir: target-domain docs score higher on average than non-target") {
    val w = DsirWeights.dsirWeights(Tables.documents(spark, sf)).cache()
    val avg = w.groupBy("is_target")
      .agg(org.apache.spark.sql.functions.avg("dsir_logweight").as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    // importance weighting must pull toward the target slice
    assert(avg(true) >= avg(false),
      s"target mean ${avg(true)} should be >= non-target ${avg(false)}")
  }

  test("batch scorer equals the relational LM exactly (same decimal path)") {
    val rel = QualityFilters.lmScores(Tables.documents(spark, sf))
    val batch = LmBatchScorer.lmScoresBatch(Tables.documents(spark, sf))
    assert(rel.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(rel).count() === 0)
  }

  test("capped-vocab batch scorer: fit is deterministic and the OOV floor binds") {
    def run() = LmBatchScorer.lmScoresBatch(
      Tables.documents(spark, sf), vocabCap = LmBatchScorer.TestVocabCap)
    val a = run()
    val b = run()
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0,
      "top-K fit with (tf DESC, token ASC) tie-break must be deterministic")
    val uncapped = LmBatchScorer.lmScoresBatch(Tables.documents(spark, sf))
    assert(a.count() === uncapped.count(), "cap must not drop documents")
    assert(a.exceptAll(uncapped).count() > 0,
      s"${LmBatchScorer.TestVocabCap}-token cap must bind on the 31-token corpus")
  }
}
