package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Text-analysis operators for training-data pipelines (north-star
  * scope, SURVEY §7.5 (d)): token counting, quality scoring,
  * language-ID heuristic, document fingerprinting — all pure
  * `functions._` column expressions (codegen'd, no UDFs), so they
  * vectorize inside whole-stage codegen and scale linearly with no
  * shuffle (per-row maps).
  *
  * Token extraction uses regexp_extract_all rather than split():
  * Java's split drops trailing empty strings while other engines keep
  * them — extract-all has identical semantics everywhere.
  */
object TextAnalysis {

  /** Normalized word tokens (lowercase alphanumeric runs). */
  def tokensCol(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Language marker lexicons (tiny stopword lists — the classic
    * cheap language-ID heuristic). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "and", "of"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "la", "y", "los", "las"),
    "de" -> Seq("der", "die", "und", "das", "ein"))

  private def countIn(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => t.isInCollection(words)))

  /** Composite quality score in EXACT decimal arithmetic — shared
    * verbatim between Spark (`expr`) and the DuckDB oracle, so the
    * .xxxx5 rounding ties that a double-arithmetic version hits are
    * resolved identically (decimal round is half-up in both engines
    * for positive values). Weights: 40% length (capped at 50 tokens =
    * token_count*0.02), 30% stopword density (×10 cap), 30% mean token
    * length (/8 expressed as ×0.125 to stay in exact decimals). */
  // capped(x) is CASE-based rather than least(): DuckDB's least()
  // degrades decimals to DOUBLE, reintroducing the rounding ties.
  private def capped(xSql: String, typ: String): String =
    s"(CASE WHEN CAST($xSql AS $typ) > 1 THEN CAST(1.0 AS $typ) ELSE CAST($xSql AS $typ) END)"

  val QualityScoreSql: String =
    s"""CAST(round(
       |  ${capped("token_count * CAST(0.02 AS DECIMAL(3,2))", "DECIMAL(18,6)")} * CAST(0.4 AS DECIMAL(2,1))
       |  + ${capped("CAST(stopword_ratio AS DECIMAL(18,4)) * 10", "DECIMAL(18,6)")} * CAST(0.3 AS DECIMAL(2,1))
       |  + ${capped("CAST(avg_token_len AS DECIMAL(18,4)) * CAST(0.125 AS DECIMAL(4,3))", "DECIMAL(18,7)")} * CAST(0.3 AS DECIMAL(2,1))
       |, 4) AS DOUBLE)""".stripMargin

  /** Per-document stats: token counts, unique/stopword/character
    * ratios, a composite quality score, and an md5 fingerprint of the
    * whitespace-collapsed text (exact-dedup key). */
  def docStats(documents: DataFrame): DataFrame = {
    val toks = tokensCol(col("text"))
    documents
      .withColumn("char_len", length(col("text")))
      .withColumn("tokens", toks)
      .withColumn("token_count", size(col("tokens")))
      .withColumn("unique_token_count", size(array_distinct(col("tokens"))))
      .withColumn("alpha_chars", length(regexp_replace(lower(col("text")), "[^a-z0-9]", "")))
      .withColumn("stopword_count", countIn(col("tokens"), Stopwords))
      .withColumn("avg_token_len",
        graft.ops.ConditionalAgg.ratio(col("alpha_chars"), col("token_count"), 4))
      .withColumn("stopword_ratio",
        graft.ops.ConditionalAgg.ratio(col("stopword_count"), col("token_count"), 4))
      .withColumn("type_token_ratio",
        graft.ops.ConditionalAgg.ratio(col("unique_token_count"), col("token_count"), 4))
      .withColumn("quality_score", expr(QualityScoreSql))
      .withColumn("fingerprint", graft.dedup.NearDup.fingerprintCol(col("text")))
      .select("doc_id", "lang", "source", "n_chars", "char_len", "token_count",
        "unique_token_count", "alpha_chars", "stopword_count", "avg_token_len",
        "stopword_ratio", "type_token_ratio", "quality_score", "fingerprint")
      .orderBy(col("doc_id"))
  }

  def docStatsQuery(s: SparkSession, dir: String): DataFrame =
    docStats(Tables.documents(s, dir))

  val docStatsSql: String =
    """WITH t AS (
      |  SELECT *,
      |    regexp_extract_all(lower(text), '[a-z0-9]+') AS tokens,
      |    length(text) AS char_len,
      |    length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS alpha_chars
      |  FROM documents
      |), c AS (
      |  SELECT *,
      |    CAST(len(tokens) AS INT) AS token_count,
      |    CAST(len(list_distinct(tokens)) AS INT) AS unique_token_count,
      |    CAST(len(list_filter(tokens, x -> x IN ('the','a','of','and','to','in','is','it'))) AS INT)
      |      AS stopword_count
      |  FROM t
      |), r AS (
      |  SELECT *,
      |    CAST(round(CAST(CAST(alpha_chars AS DOUBLE) / nullif(CAST(token_count AS DOUBLE), 0)
      |      AS DECIMAL(28,10)), 4) AS DOUBLE) AS avg_token_len,
      |    CAST(round(CAST(CAST(stopword_count AS DOUBLE) / nullif(CAST(token_count AS DOUBLE), 0)
      |      AS DECIMAL(28,10)), 4) AS DOUBLE) AS stopword_ratio,
      |    CAST(round(CAST(CAST(unique_token_count AS DOUBLE) / nullif(CAST(token_count AS DOUBLE), 0)
      |      AS DECIMAL(28,10)), 4) AS DOUBLE) AS type_token_ratio
      |  FROM c
      |)
      |SELECT doc_id, lang, source, n_chars,
      |  CAST(char_len AS INT) AS char_len,
      |  token_count, unique_token_count,
      |  CAST(alpha_chars AS INT) AS alpha_chars,
      |  stopword_count, avg_token_len, stopword_ratio, type_token_ratio,
      |  __QUALITY__ AS quality_score,
      |  md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fingerprint
      |FROM r
      |ORDER BY doc_id""".stripMargin
      .replace("__QUALITY__", QualityScoreSql)

  /** N-gram-lexicon language ID: score = marker-token hits per
    * language, argmax with a fixed precedence chain for ties,
    * 'und' when nothing matches. Compared against the table's `lang`
    * label for an agreement flag. */
  def langId(documents: DataFrame): DataFrame = {
    val toks = tokensCol(col("text"))
    val scored = documents
      .withColumn("tokens", toks)
      .withColumn("s_en", countIn(col("tokens"), LangMarkers(0)._2))
      .withColumn("s_fr", countIn(col("tokens"), LangMarkers(1)._2))
      .withColumn("s_es", countIn(col("tokens"), LangMarkers(2)._2))
      .withColumn("s_de", countIn(col("tokens"), LangMarkers(3)._2))
    scored
      .withColumn("lang_guess",
        when(col("s_en") + col("s_fr") + col("s_es") + col("s_de") === 0, "und")
          .when(col("s_en") >= col("s_fr") && col("s_en") >= col("s_es") && col("s_en") >= col("s_de"), "en")
          .when(col("s_fr") >= col("s_es") && col("s_fr") >= col("s_de"), "fr")
          .when(col("s_es") >= col("s_de"), "es")
          .otherwise("de"))
      .withColumn("matches_label", (col("lang_guess") === col("lang")).cast("boolean"))
      .select("doc_id", "lang", "s_en", "s_fr", "s_es", "s_de", "lang_guess", "matches_label")
      .orderBy(col("doc_id"))
  }

  def langIdQuery(s: SparkSession, dir: String): DataFrame =
    langId(Tables.documents(s, dir))

  val langIdSql: String =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |    regexp_extract_all(lower(text), '[a-z0-9]+') AS tokens
      |  FROM documents
      |), s AS (
      |  SELECT doc_id, lang,
      |    CAST(len(list_filter(tokens, x -> x IN ('the','a','is','and','of'))) AS INT) AS s_en,
      |    CAST(len(list_filter(tokens, x -> x IN ('le','la','et','les','des'))) AS INT) AS s_fr,
      |    CAST(len(list_filter(tokens, x -> x IN ('el','la','y','los','las'))) AS INT) AS s_es,
      |    CAST(len(list_filter(tokens, x -> x IN ('der','die','und','das','ein'))) AS INT) AS s_de
      |  FROM t
      |)
      |SELECT doc_id, lang, s_en, s_fr, s_es, s_de,
      |  CASE WHEN s_en + s_fr + s_es + s_de = 0 THEN 'und'
      |       WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de THEN 'en'
      |       WHEN s_fr >= s_es AND s_fr >= s_de THEN 'fr'
      |       WHEN s_es >= s_de THEN 'es'
      |       ELSE 'de' END AS lang_guess,
      |  (CASE WHEN s_en + s_fr + s_es + s_de = 0 THEN 'und'
      |        WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de THEN 'en'
      |        WHEN s_fr >= s_es AND s_fr >= s_de THEN 'fr'
      |        WHEN s_es >= s_de THEN 'es'
      |        ELSE 'de' END) = lang AS matches_label
      |FROM s
      |ORDER BY doc_id""".stripMargin

  /** Corpus-level quality rollup by source — the aggregation a data
    * curation pipeline runs before filtering (beyond-reference, but
    * same A-family agg shapes as the gold marts). */
  def sourceQuality(documents: DataFrame): DataFrame =
    docStats(documents)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("doc_count"),
        sum(col("token_count").cast("long")).as("total_tokens"),
        // decimal sum → order-independent average (scores are exact 4dp)
        graft.ops.ConditionalAgg.ratio(
          sum(col("quality_score").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
            .cast("double"), count(lit(1)), 4).as("avg_quality"),
        min(col("quality_score")).as("min_quality"),
        max(col("quality_score")).as("max_quality"),
        count_distinct(col("fingerprint")).as("distinct_fingerprints"))
      .orderBy(col("source"))

  def sourceQualityQuery(s: SparkSession, dir: String): DataFrame =
    sourceQuality(Tables.documents(s, dir))

  val sourceQualitySql: String = {
    val stats = docStatsSql.replace("ORDER BY doc_id", "")
    s"""WITH stats AS ($stats)
       |SELECT source,
       |  count(*) AS doc_count,
       |  CAST(sum(token_count) AS BIGINT) AS total_tokens,
       |  CAST(round(CAST(CAST(sum(CAST(quality_score AS DECIMAL(18,4))) AS DOUBLE)
       |        / nullif(CAST(count(*) AS DOUBLE), 0) AS DECIMAL(28,10)), 4) AS DOUBLE) AS avg_quality,
       |  min(quality_score) AS min_quality,
       |  max(quality_score) AS max_quality,
       |  count(DISTINCT fingerprint) AS distinct_fingerprints
       |FROM stats
       |GROUP BY source
       |ORDER BY source""".stripMargin
  }

  // --------------------------------- rolling-hash fingerprinting

  /** Winnowing-style rolling-hash fingerprint (the MOSS idea): hash
    * every 64-char window at stride 32 with the mod-prime polynomial
    * fold, keep the MINIMUM window hash as the document fingerprint
    * (robust to insertions outside the minimizing window, unlike a
    * whole-document digest). All higher-order Column expressions —
    * codegen'd, no UDF; the ragged tail past the last full window is
    * ignored (standard winnowing). */
  // window/stride/mod constants live in graftext.RollingFp; the HOF
  // reference formulation (slice + aggregate fold per window) is kept
  // in VectorCodecSpec as the bit-identity pin

  def rollingFingerprints(documents: DataFrame): DataFrame = {
    // r19 (guide §4): the former per-row codes array
    // (`transform(split(text,''), ascii)`) plus one interpreted
    // `aggregate(slice(codes, start, 64), fold)` PER WINDOW is now one
    // compiled pass per document ([[graftext.RollingFp]] — same window
    // grid, same mod-prime fold, bit-identical; VectorCodecSpec pins
    // it against this HOF formulation)
    documents
      .withColumn("__fp",
        org.apache.spark.sql.graftext.VectorCodec.rollingFp(col("text")))
      .select(
        col("doc_id"),
        col("__fp.n_windows").as("n_windows"),
        col("__fp.min_window_hash").as("min_window_hash"),
        col("__fp.full_hash").as("full_hash"))
      .orderBy(col("doc_id"))
  }

  def rollingFingerprintsQuery(s: SparkSession, dir: String): DataFrame =
    rollingFingerprints(graft.sources.Tables.documents(s, dir))

  val rollingFingerprintsSql: String =
    """WITH base AS (
      |  SELECT doc_id, text, length(text) AS len,
      |    CASE WHEN length(text) <= 64 THEN 1
      |         ELSE CAST((length(text) - 64) // 32 AS INT) + 1 END AS n_windows
      |  FROM documents
      |)
      |SELECT doc_id, n_windows,
      |  list_min(list_transform(range(n_windows), k ->
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(
      |        substr(text, CAST(1 + 32 * k AS INT), least(64, CAST(len AS INT))), ''),
      |        c -> ord(c))),
      |      (a, b) -> (a * 31 + b) % 1000000007))) AS min_window_hash,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(string_split(text, ''), c -> ord(c))),
      |    (a, b) -> (a * 31 + b) % 1000000007) AS full_hash
      |FROM base
      |ORDER BY doc_id""".stripMargin
}
