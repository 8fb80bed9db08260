package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** PII detection + redaction — the privacy scrub every public-crawl
  * training pipeline runs before anything else sees the text: find
  * emails / phone numbers / IPv4 addresses, count them per document,
  * and replace them with typed placeholder tokens.
  *
  * Pure per-row regexp expressions (codegen'd, no shuffle, no UDF).
  * The patterns stay in the Java∩RE2 common dialect (`\b`, `\d`,
  * bounded repetition — no lookarounds) so the DuckDB oracle replays
  * them byte-for-byte.
  *
  * The synthetic driver corpus contains no organic PII, so the driver
  * query first APPENDS a deterministic contact line derived from
  * doc_id (replayed identically in the oracle SQL) — the redaction
  * then has real work to do on every row; organic-text behavior is
  * covered by the constructed-corpus spec.
  */
object PiiRedaction {

  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Counts + redacted fingerprint for a text column. Redaction order
    * matters only across overlapping classes: emails first (their
    * domains contain dots an IP pattern could nibble), then IPs, then
    * phones. */
  def redact(df: DataFrame, text: Column): DataFrame =
    df.withColumn("n_emails", size(regexp_extract_all(text, lit(EmailRe), lit(0))))
      .withColumn("n_phones", size(regexp_extract_all(text, lit(PhoneRe), lit(0))))
      .withColumn("n_ips", size(regexp_extract_all(text, lit(Ipv4Re), lit(0))))
      .withColumn("__red",
        regexp_replace(regexp_replace(regexp_replace(text,
          EmailRe, "[EMAIL]"), Ipv4Re, "[IP]"), PhoneRe, "[PHONE]"))
      .withColumn("has_pii", col("n_emails") + col("n_phones") + col("n_ips") > 0)
      .withColumn("redacted_md5", md5(col("__red")))
      .drop("__red")

  /** The deterministic contact-line augmentation for the driver corpus
    * (mirrored in [[redactionSql]]). */
  private[text] def augmentedText: Column =
    concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com or 555-"),
      lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 3, "0"),
      lit("-"),
      lpad(pmod(col("doc_id") * 7, lit(10000)).cast("string"), 4, "0"),
      lit(" from 10."), pmod(col("doc_id"), lit(256)).cast("string"), lit(".0.42"))

  def redactionQuery(s: SparkSession, dir: String): DataFrame =
    redact(Tables.documents(s, dir), augmentedText)
      .select("doc_id", "source", "n_emails", "n_phones", "n_ips", "has_pii",
        "redacted_md5")
      .orderBy(col("doc_id"))

  val redactionSql: String =
    """WITH aug AS (
      |  SELECT doc_id, source,
      |    text || ' contact user' || CAST(doc_id AS VARCHAR)
      |      || '@example.com or 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
      |      || '-' || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
      |      || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.42' AS t
      |  FROM documents
      |)
      |SELECT doc_id, source,
      |  CAST(len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INT) AS n_emails,
      |  CAST(len(regexp_extract_all(t, '\b\d{3}-\d{3}-\d{4}\b')) AS INT) AS n_phones,
      |  CAST(len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ips,
      |  (CAST(len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INT)
      |   + CAST(len(regexp_extract_all(t, '\b\d{3}-\d{3}-\d{4}\b')) AS INT)
      |   + CAST(len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT)) > 0 AS has_pii,
      |  md5(regexp_replace(regexp_replace(regexp_replace(t,
      |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
      |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
      |    '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g')) AS redacted_md5
      |FROM aug
      |ORDER BY doc_id""".stripMargin
}
