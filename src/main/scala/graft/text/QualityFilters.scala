package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.ConditionalAgg
import graft.sources.Tables

/** Corpus-curation filters in the C4/Gopher style (public filtering
  * rules: doc length bounds, mean word length bounds, repetition
  * detection) — the pre-training data-quality pass a 100 TB text
  * pipeline runs before tokenization. All column expressions +
  * one explode/agg for the repetition stats; no UDFs.
  */
object QualityFilters {

  /** Per-doc repetition stats: top 2-gram frequency share (Gopher's
    * duplicate-n-gram-fraction family). One explode → two-level agg,
    * shuffles on doc_id only. NOTE: unlike NearDup.shingles this keeps
    * duplicate grams — the duplicates ARE the signal here. */
  def repetitionStats(documents: DataFrame): DataFrame = {
    val toks = TextAnalysis.tokensCol(col("text"))
    // r18 (guide §4): native ShinglesOf in non-distinct mode — one
    // compiled window walk instead of an interpreted transform
    // building |doc| concat_ws trees per row (VectorCodecSpec pins
    // value identity; duplicates kept — they ARE the signal)
    val grams = documents
      .withColumn("__toks", toks)
      .withColumn("shingle", explode(org.apache.spark.sql.graftext.VectorCodec
        .shinglesOf(col("__toks"), 2, distinct = false)))
      .select(col("doc_id"), col("shingle"))
    val counts = grams.groupBy(col("doc_id"), col("shingle"))
      .agg(count(lit(1)).as("n"))
    counts.groupBy(col("doc_id"))
      .agg(
        sum(col("n")).as("total_2grams"),
        max(col("n")).as("top_2gram_count"),
        count(lit(1)).as("distinct_2grams"))
      .withColumn("top_2gram_share",
        ConditionalAgg.ratio(col("top_2gram_count"), col("total_2grams"), 4))
  }

  /** Gopher-ish accept/reject flags; thresholds as parameters with
    * public-rule-like defaults. */
  def filterFlags(documents: DataFrame,
                  minTokens: Int = 20, maxTokens: Int = 100000,
                  minMeanWordLen: Double = 2.0, maxMeanWordLen: Double = 10.0,
                  maxTopGramShare: Double = 0.20): DataFrame = {
    val stats = TextAnalysis.docStats(documents)
      .select("doc_id", "token_count", "avg_token_len")
    val rep = repetitionStats(documents)
    stats.join(rep, Seq("doc_id"), "left")
      .withColumn("pass_length",
        col("token_count") >= minTokens && col("token_count") <= maxTokens)
      .withColumn("pass_word_len",
        col("avg_token_len") >= minMeanWordLen && col("avg_token_len") <= maxMeanWordLen)
      .withColumn("pass_repetition",
        coalesce(col("top_2gram_share") <= maxTopGramShare, lit(true)))
      .withColumn("pass_all",
        col("pass_length") && col("pass_word_len") && col("pass_repetition"))
      .select("doc_id", "token_count", "avg_token_len", "top_2gram_share",
        "pass_length", "pass_word_len", "pass_repetition", "pass_all")
      .orderBy(col("doc_id"))
  }

  def filterFlagsQuery(s: SparkSession, dir: String): DataFrame =
    filterFlags(Tables.documents(s, dir))

  val filterFlagsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tokens,
      |    length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS alpha_chars
      |  FROM documents
      |), stats AS (
      |  SELECT doc_id,
      |    CAST(len(tokens) AS INT) AS token_count,
      |    CAST(round(CAST(CAST(alpha_chars AS DOUBLE) / nullif(CAST(len(tokens) AS DOUBLE), 0)
      |      AS DECIMAL(28,10)), 4) AS DOUBLE) AS avg_token_len
      |  FROM toks
      |), grams AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(tokens) - 1),
      |    i -> concat_ws(' ', tokens[i], tokens[i+1]))) AS shingle
      |  FROM toks WHERE len(tokens) >= 2
      |), gcounts AS (
      |  SELECT doc_id, shingle, count(*) AS n FROM grams GROUP BY doc_id, shingle
      |), rep AS (
      |  SELECT doc_id,
      |    CAST(sum(n) AS BIGINT) AS total_2grams,
      |    CAST(max(n) AS BIGINT) AS top_2gram_count
      |  FROM gcounts GROUP BY doc_id
      |)
      |SELECT s.doc_id, s.token_count, s.avg_token_len,
      |  CAST(round(CAST(CAST(top_2gram_count AS DOUBLE) / nullif(CAST(total_2grams AS DOUBLE), 0)
      |    AS DECIMAL(28,10)), 4) AS DOUBLE) AS top_2gram_share,
      |  s.token_count >= 20 AND s.token_count <= 100000 AS pass_length,
      |  s.avg_token_len >= 2.0 AND s.avg_token_len <= 10.0 AS pass_word_len,
      |  coalesce(CAST(round(CAST(CAST(top_2gram_count AS DOUBLE) / nullif(CAST(total_2grams AS DOUBLE), 0)
      |    AS DECIMAL(28,10)), 4) AS DOUBLE) <= 0.20, TRUE) AS pass_repetition,
      |  (s.token_count >= 20 AND s.token_count <= 100000)
      |    AND (s.avg_token_len >= 2.0 AND s.avg_token_len <= 10.0)
      |    AND coalesce(CAST(round(CAST(CAST(top_2gram_count AS DOUBLE) / nullif(CAST(total_2grams AS DOUBLE), 0)
      |      AS DECIMAL(28,10)), 4) AS DOUBLE) <= 0.20, TRUE) AS pass_all
      |FROM stats s LEFT JOIN rep USING (doc_id)
      |ORDER BY s.doc_id""".stripMargin

  /** Full Gopher-family repetition profile (Rae et al. 2021, public
    * filtering rules): per doc, type-token ratio, most-common-word
    * share, duplicate-2-gram occurrence fraction, and top-3-gram share.
    * The corpus texts are single-line, so the line/paragraph variants
    * of the rules collapse to their n-gram forms — these four are the
    * informative family members here.
    *
    * Shape: MAP-ONLY — every stat is per-document, so nothing needs a
    * shuffle — and the per-row kernel is ONE native codegen'd
    * expression ([[org.apache.spark.sql.graftext.NgramStats]]): a
    * single hash-count pass per document computes (distinct, top, dup)
    * for n ∈ {1,2,3} in O(total grams), no sort, no per-gram
    * allocation beyond the gram keys; totals derive from
    * `size(tokens)`. This replaces the former explode + two grouped
    * aggs, which shuffled the whole gram stream twice — at corpus
    * scale the profile is embarrassingly parallel and this plan keeps
    * it that way: the only Exchange left is the final presentation
    * ORDER BY (no hash exchange, no grouped aggregation — spec-pinned
    * in PlanContractSpec). No UDFs, no windows. */
  def repetitionProfile(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftext.NgramStats.ngramStats
    def stat(n: Int, field: String) =
      element_at(col("__ns"), n).getField(field)
    documents
      .withColumn("__toks", TextAnalysis.tokensCol(col("text")))
      // the previous explode-based plan dropped zero-token docs (explode
      // of an empty array emits no rows), as does the oracle — keep that
      .filter(size(col("__toks")) > 0)
      .withColumn("__ns", ngramStats(col("__toks"), 3))
      .withColumn("__t1", size(col("__toks")).cast("long"))
      .withColumn("__t2", greatest(size(col("__toks")) - 1, lit(0)).cast("long"))
      .withColumn("__t3", greatest(size(col("__toks")) - 2, lit(0)).cast("long"))
      .select(col("doc_id"),
        col("__t1").as("token_count"),
        ConditionalAgg.ratio(stat(1, "distinct"), col("__t1"), 4).as("type_token_ratio"),
        ConditionalAgg.ratio(stat(1, "top"), col("__t1"), 4).as("top_word_share"),
        ConditionalAgg.ratio(stat(2, "dup"), col("__t2"), 4).as("dup_2gram_frac"),
        ConditionalAgg.ratio(stat(3, "top"), col("__t3"), 4).as("top_3gram_share"))
      .orderBy(col("doc_id"))
  }

  def repetitionProfileQuery(s: SparkSession, dir: String): DataFrame =
    repetitionProfile(Tables.documents(s, dir))

  val repetitionProfileSql: String = {
    import graft.ops.ConditionalAgg.roundPortableSql
    def ratio(num: String, den: String) =
      roundPortableSql(s"CAST($num AS DOUBLE) / nullif(CAST($den AS DOUBLE), 0)", 4)
    s"""WITH toks AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tokens
      |  FROM documents
      |), grams AS (
      |  SELECT doc_id, 1 AS n, unnest(tokens) AS gram FROM toks
      |  UNION ALL
      |  SELECT doc_id, 2, unnest(list_transform(generate_series(1, len(tokens) - 1),
      |    i -> concat_ws(' ', tokens[i], tokens[i+1])))
      |  FROM toks WHERE len(tokens) >= 2
      |  UNION ALL
      |  SELECT doc_id, 3, unnest(list_transform(generate_series(1, len(tokens) - 2),
      |    i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2])))
      |  FROM toks WHERE len(tokens) >= 3
      |), counts AS (
      |  SELECT doc_id, n, gram, count(*) AS c FROM grams GROUP BY 1, 2, 3
      |), per AS (
      |  SELECT doc_id, n, sum(c) AS total, max(c) AS top,
      |    count(*) AS distinct_grams,
      |    sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_occ
      |  FROM counts GROUP BY 1, 2
      |)
      |SELECT doc_id,
      |  CAST(max(CASE WHEN n = 1 THEN total END) AS BIGINT) AS token_count,
      |  ${ratio("max(CASE WHEN n = 1 THEN distinct_grams END)", "max(CASE WHEN n = 1 THEN total END)")} AS type_token_ratio,
      |  ${ratio("max(CASE WHEN n = 1 THEN top END)", "max(CASE WHEN n = 1 THEN total END)")} AS top_word_share,
      |  ${ratio("max(CASE WHEN n = 2 THEN dup_occ END)", "max(CASE WHEN n = 2 THEN total END)")} AS dup_2gram_frac,
      |  ${ratio("max(CASE WHEN n = 3 THEN top END)", "max(CASE WHEN n = 3 THEN total END)")} AS top_3gram_share
      |FROM per GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin
  }

  /** Tokenizer-vocabulary coverage: per doc, how many tokens fall
    * outside the corpus top-K vocabulary (the OOV-rate check run before
    * committing to a tokenizer/vocab size). The vocab is the SAME
    * deterministic top-K as [[vocabulary]] (term_freq DESC, token ASC —
    * the total order makes the K-boundary engine-portable) and is
    * BROADCAST to the token stream: one explode, one broadcast join,
    * one per-doc agg — linear, no windows. */
  def vocabCoverage(documents: DataFrame, topK: Int = 20): DataFrame = {
    val toks = documents.select(col("doc_id"),
      explode(TextAnalysis.tokensCol(col("text"))).as("token"))
    val vocab = vocabulary(documents, topK)
      .select(col("token"), lit(1).as("__in_vocab"))
    toks.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        ConditionalAgg.countIf(col("__in_vocab").isNull).as("n_oov"))
      .withColumn("oov_rate", ConditionalAgg.ratio(col("n_oov"), col("n_tokens"), 4))
      .orderBy(col("doc_id"))
  }

  def vocabCoverageQuery(s: SparkSession, dir: String): DataFrame =
    vocabCoverage(Tables.documents(s, dir))

  val vocabCoverageSql: String = {
    import graft.ops.ConditionalAgg.roundPortableSql
    s"""WITH tok AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
      |  FROM documents
      |), vocab AS (
      |  SELECT token, 1 AS in_vocab FROM (
      |    SELECT token, count(*) AS term_freq FROM tok GROUP BY token
      |    ORDER BY term_freq DESC, token ASC LIMIT 20)
      |)
      |SELECT doc_id, count(*) AS n_tokens,
      |  CAST(sum(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
      |  ${roundPortableSql(
           "CAST(sum(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / nullif(CAST(count(*) AS DOUBLE), 0)", 4)} AS oov_rate
      |FROM tok LEFT JOIN vocab USING (token)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin
  }

  /** BPE-ish token-count estimation (prompt/training-cost budgeting
    * without running a tokenizer): whitespace words contribute
    * ceil(len/4) subword units (the ~4-chars-per-BPE-token heuristic),
    * floored by the word count; plus the chars/4 global estimate for
    * comparison. Pure higher-order array math — no tokenizer library,
    * no UDF, linear scan. */
  /** Per-text BPE-unit estimate (the ~4-chars-per-token heuristic),
    * shared by [[tokenEstimates]] and [[CurationOps.packSequences]].
    * r19: the `aggregate(transform(...))` HOF pair ran interpreted
    * per token (guide §4) — the native [[graftext.BpeEstimate]] is
    * one compiled fold, bit-identical (VectorCodecSpec pin). */
  private[text] def bpeEstimateCol(text: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graftext.VectorCodec.bpeEstimate(TextAnalysis.tokensCol(text))

  def tokenEstimates(documents: DataFrame): DataFrame = {
    val toks = TextAnalysis.tokensCol(col("text"))
    documents
      .withColumn("word_tokens", size(toks))
      .withColumn("bpe_estimate", bpeEstimateCol(col("text")))
      .withColumn("char_estimate", ceil(length(col("text")).cast("double") / 4.0).cast("long"))
      .select("doc_id", "word_tokens", "bpe_estimate", "char_estimate")
      .orderBy(col("doc_id"))
  }

  def tokenEstimatesQuery(s: SparkSession, dir: String): DataFrame =
    tokenEstimates(Tables.documents(s, dir))

  val tokenEstimatesSql: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS INT) AS word_tokens,
      |  CAST(list_sum(list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'),
      |    t -> CAST(ceil(CAST(length(t) AS DOUBLE) / 4.0) AS BIGINT))) AS BIGINT) AS bpe_estimate,
      |  CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS char_estimate
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Per-doc unigram language-model score (the CCNet-style quality
    * signal: docs far from the corpus distribution — gibberish or
    * boilerplate — score high): avg −ln p(token) under the corpus
    * unigram model. Two grouped aggs + one token-frequency join; the
    * per-row NLL is summed as DECIMAL(28,12) so the per-doc score is
    * independent of partition/add order (a raw double sum would drift
    * run to run at 100 TB). A real pipeline swaps the unigram model
    * for KenLM scores — the Spark shape (broadcast model join or
    * mapPartitions batch scoring) is identical. */
  def lmScores(documents: DataFrame): DataFrame = {
    val tok = documents.select(col("doc_id"),
      explode(TextAnalysis.tokensCol(col("text"))).as("token"))
    // the vocab-sized frequency table is the model — materialize it so
    // the total and the scoring join read it rather than each
    // re-tokenizing the corpus (build-model / score-corpus, two scans)
    val freqs = tok.groupBy(col("token")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val total = freqs.agg(sum(col("tf")).as("n_total"))
    tok.join(freqs, "token")
      .crossJoin(broadcast(total))
      .withColumn("nll",
        (-log(col("tf").cast("double") / col("n_total").cast("double")))
          .cast(org.apache.spark.sql.types.DecimalType(28, 12)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("nll")).as("nll_sum"))
      .select(col("doc_id"), col("n_tokens"),
        ConditionalAgg.roundPortable(
          col("nll_sum").cast("double") / col("n_tokens").cast("double"), 4).as("avg_nll"))
      .orderBy(col("doc_id"))
  }

  def lmScoresQuery(s: SparkSession, dir: String): DataFrame =
    lmScores(Tables.documents(s, dir))

  val lmScoresSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
      |  FROM documents
      |),
      |freqs AS (SELECT token, count(*) AS tf FROM tok GROUP BY token),
      |tot AS (SELECT sum(tf) AS n_total FROM freqs)
      |SELECT doc_id, count(*) AS n_tokens,
      |  CAST(round(CAST(
      |    CAST(sum(CAST(-ln(CAST(tf AS DOUBLE) / CAST(n_total AS DOUBLE)) AS DECIMAL(28,12))) AS DOUBLE)
      |      / CAST(count(*) AS DOUBLE)
      |    AS DECIMAL(28,10)), 4) AS DOUBLE) AS avg_nll
      |FROM tok JOIN freqs USING (token), tot
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** Bigram-LM quality score — one step closer to the CCNet/KenLM
    * n-gram signal than [[lmScores]]'s unigram: per doc, avg
    * −ln p(wᵢ | wᵢ₋₁) under the corpus bigram model with add-α
    * smoothing, p = (c₂(prev,cur)+α) / (c₁(prev)+α·V). Boilerplate and
    * templated text score LOW (their transitions are corpus-frequent);
    * shuffled/gibberish text scores HIGH even when its unigrams are
    * common — exactly the case the unigram model cannot see.
    *
    * Shape: one bigram explode (linear), two grouped counts, two key
    * joins + a broadcast 1-row vocabulary size; per-row NLL summed as
    * DECIMAL(28,12) so the per-doc score is partition-order-invariant
    * (same determinism contract as [[lmScores]]). Docs with <2 tokens
    * have no bigrams and drop out, in both engines. */
  def bigramLmScores(documents: DataFrame, alpha: Double = 0.5): DataFrame = {
    val toksArr = TextAnalysis.tokensCol(col("text"))
    // r18 (guide §4): native ShinglesOf (non-distinct) emits each
    // bigram as "prev cur"; tokens are [a-z0-9]+ runs so the space
    // split is bijective and substring_index recovers the exact pair
    // — same rows as the previous interpreted struct transform
    val bigrams = documents
      .withColumn("__toks", toksArr)
      .select(col("doc_id"), explode(org.apache.spark.sql.graftext.VectorCodec
        .shinglesOf(col("__toks"), 2, distinct = false)).as("bg"))
      .select(col("doc_id"), substring_index(col("bg"), " ", 1).as("prev"),
        substring_index(col("bg"), " ", -1).as("cur"))
    // the bigram count table is the LM — materialize it once and
    // derive the context marginals from it (c1(prev) ≡ Σ_cur
    // c2(prev, cur)) instead of a second bigram pass; the corpus is
    // then re-tokenized exactly once more for scoring (pre-round-9:
    // four corpus tokenizations; now three — bigram build, vocab,
    // scoring)
    val c2 = bigrams.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("c2"))
      .localCheckpoint()
    val c1 = c2.groupBy(col("prev")).agg(sum(col("c2")).as("c1"))
    val vocab = documents
      .select(explode(TextAnalysis.tokensCol(col("text"))).as("token"))
      .agg(count_distinct(col("token")).as("v_size"))
    bigrams.join(c2, Seq("prev", "cur")).join(c1, Seq("prev"))
      .crossJoin(broadcast(vocab))
      .withColumn("nll",
        (-log((col("c2").cast("double") + lit(alpha)) /
          (col("c1").cast("double") + lit(alpha) * col("v_size").cast("double"))))
          .cast(org.apache.spark.sql.types.DecimalType(28, 12)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("nll")).as("nll_sum"))
      .select(col("doc_id"), col("n_bigrams"),
        ConditionalAgg.roundPortable(
          col("nll_sum").cast("double") / col("n_bigrams").cast("double"), 4).as("avg_nll"))
      .orderBy(col("doc_id"))
  }

  def bigramLmScoresQuery(s: SparkSession, dir: String): DataFrame =
    bigramLmScores(Tables.documents(s, dir))

  val bigramLmScoresSql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      |  FROM documents
      |), bigrams AS (
      |  SELECT doc_id, t[i] AS prev, t[i+1] AS cur
      |  FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
      |  WHERE len(t) >= 2
      |), c2 AS (
      |  SELECT prev, cur, count(*) AS c2 FROM bigrams GROUP BY prev, cur
      |), c1 AS (
      |  SELECT prev, count(*) AS c1 FROM bigrams GROUP BY prev
      |), voc AS (
      |  SELECT count(DISTINCT token) AS v_size FROM (
      |    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
      |    FROM documents)
      |)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  CAST(round(CAST(
      |    CAST(sum(CAST(-ln((CAST(c2 AS DOUBLE) + 0.5) /
      |      (CAST(c1 AS DOUBLE) + 0.5 * CAST(v_size AS DOUBLE))) AS DECIMAL(28,12))) AS DOUBLE)
      |      / CAST(count(*) AS DOUBLE)
      |    AS DECIMAL(28,10)), 4) AS DOUBLE) AS avg_nll
      |FROM bigrams JOIN c2 USING (prev, cur) JOIN c1 USING (prev), voc
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** Per-doc character-entropy quality signal — the compression-ratio
    * proxy (low entropy ⇒ repetitive/templated or degenerate text;
    * natural prose sits in a narrow band): Shannon entropy in nats
    * over the doc's character distribution. One char explode + two
    * grouped counts; the per-character −p·ln p terms are summed as
    * DECIMAL(28,12), so the score is partition-order-invariant (same
    * determinism contract as the LM scores). */
  def charEntropy(documents: DataFrame): DataFrame = {
    val chars = documents.select(col("doc_id"),
      explode(split(col("text"), "")).as("ch"))
    val counts = chars.groupBy(col("doc_id"), col("ch"))
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("doc_id")).agg(sum(col("c")).as("n"))
    counts.join(totals, "doc_id")
      .withColumn("term",
        (-(col("c").cast("double") / col("n").cast("double")) *
          log(col("c").cast("double") / col("n").cast("double")))
          .cast(org.apache.spark.sql.types.DecimalType(28, 12)))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).cast("long").as("n_chars"),
        count(lit(1)).as("distinct_chars"),
        ConditionalAgg.roundPortable(sum(col("term")).cast("double"), 4).as("entropy_nats"))
      .orderBy(col("doc_id"))
  }

  def charEntropyQuery(s: SparkSession, dir: String): DataFrame =
    charEntropy(Tables.documents(s, dir))

  val charEntropySql: String = {
    import graft.ops.ConditionalAgg.roundPortableSql
    s"""WITH chars AS (
      |  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
      |), counts AS (
      |  SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch
      |), totals AS (
      |  SELECT doc_id, sum(c) AS n FROM counts GROUP BY doc_id
      |)
      |SELECT doc_id,
      |  CAST(max(n) AS BIGINT) AS n_chars,
      |  count(*) AS distinct_chars,
      |  ${roundPortableSql(
           "CAST(sum(CAST(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) AS DECIMAL(28,12))) AS DOUBLE)", 4)} AS entropy_nats
      |FROM counts JOIN totals USING (doc_id)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin
  }

  /** 1-based position of a lowercase hex digit in the hex alphabet —
    * the engine-portable digit value (DuckDB `strpos` twin). */
  private[text] def hexPos(c: org.apache.spark.sql.Column) =
    array_position(typedLit("0123456789abcdef".map(_.toString)), c)

  /** First-two-hex-digits md5 bucket of a key → 0..255; the shared
    * deterministic-hash primitive behind [[splitAssign]] and
    * [[CurationOps.sampleMixture]]. */
  private[graft] def md5Bucket(key: org.apache.spark.sql.Column) = {
    val h = md5(key.cast("string"))
    ((hexPos(substring(h, 1, 1)) - 1) * 16 + (hexPos(substring(h, 2, 1)) - 1)).cast("int")
  }

  /** Deterministic train/val/test split assignment — the standard
    * hash-split a training pipeline uses so membership is a pure
    * function of the EXAMPLE, stable across reruns, machines and
    * engines (never `rand()`: nondeterministic under retries, and a
    * re-shard reshuffles the holdout). Bucket = first two hex digits
    * of md5(doc_id) → 0..255; cut at 205/230 ≈ 80/10/10. Narrow
    * per-row expressions only — no shuffle, no UDF; the md5 bucketing
    * replays exactly in DuckDB. */
  def splitAssign(documents: DataFrame,
                  trainCut: Int = 205, valCut: Int = 230): DataFrame = {
    documents
      .withColumn("bucket", md5Bucket(col("doc_id")))
      .withColumn("split",
        when(col("bucket") < trainCut, "train")
          .when(col("bucket") < valCut, "val")
          .otherwise("test"))
      .select("doc_id", "source", "bucket", "split")
      .orderBy(col("doc_id"))
  }

  def splitAssignQuery(s: SparkSession, dir: String): DataFrame =
    splitAssign(Tables.documents(s, dir))

  val splitAssignSql: String =
    """SELECT doc_id, source, bucket,
      |  CASE WHEN bucket < 205 THEN 'train'
      |       WHEN bucket < 230 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM (
      |  SELECT doc_id, source,
      |    CAST((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      |       + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS INT) AS bucket
      |  FROM documents
      |)
      |ORDER BY doc_id""".stripMargin

  /** Deterministic uniform k-sample per source — the eval-set /
    * inspection-sample builder: rank docs inside each source by
    * md5(doc_id) (a uniform, engine-portable pseudo-order — the
    * distributed equivalent of per-stratum reservoir sampling, but
    * reproducible across reruns and engines) and keep the k smallest.
    * One WindowGroupLimit-pushed rank per source — linear, no global
    * sort, no rand(). */
  def samplePerSource(documents: DataFrame, k: Int = 10): DataFrame =
    graft.ops.TopK.perGroup(
        documents.select(col("doc_id"), col("source"),
          md5(col("doc_id").cast("string")).as("sample_key")),
        groupKeys = Seq("source"),
        order = Seq(col("sample_key").asc, col("doc_id").asc), k = k)
      .select("source", "rank", "doc_id", "sample_key")
      .orderBy(col("source"), col("rank"))

  def samplePerSourceQuery(s: SparkSession, dir: String): DataFrame =
    samplePerSource(Tables.documents(s, dir))

  val samplePerSourceSql: String =
    """SELECT source, rank, doc_id, sample_key FROM (
      |  SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS sample_key,
      |    CAST(row_number() OVER (
      |      PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS INT) AS rank
      |  FROM documents
      |)
      |WHERE rank <= 10
      |ORDER BY source, rank""".stripMargin

  /** Corpus vocabulary: global top-k tokens by frequency with doc
    * frequency — the tokenizer-training / stopword-discovery stat.
    * Explode → two grouped aggs; partial aggregation absorbs the
    * per-token fan-out map-side. */
  def vocabulary(documents: DataFrame, topK: Int = 50): DataFrame = {
    val toks = documents.select(col("doc_id"),
      explode(TextAnalysis.tokensCol(col("text"))).as("token"))
    graft.ops.TopK.global(
      toks.groupBy(col("token"))
        .agg(count(lit(1)).as("term_freq"),
             count_distinct(col("doc_id")).as("doc_freq")),
      order = Seq(col("term_freq").desc, col("token").asc), k = topK)
  }

  def vocabularyQuery(s: SparkSession, dir: String): DataFrame =
    vocabulary(Tables.documents(s, dir))

  /** Per-source top-5 tokens via the native SpaceSaving aggregate
    * (graftext.ApproxTopK). With capacity far above the corpus
    * vocabulary the sketch is in its exact regime, so the DuckDB
    * oracle can reproduce it with a plain grouped rank. */
  def topTokensSketch(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftext.ApproxTopK.approxTopK
    Tables.documents(s, dir)
      .select(col("source"), explode(TextAnalysis.tokensCol(col("text"))).as("token"))
      .groupBy(col("source"))
      .agg(approxTopK(col("token"), 5, 2048).as("top"))
      .select(col("source"), posexplode(col("top")).as(Seq("rank0", "e")))
      .select(col("source"), (col("rank0") + 1).cast("int").as("rnk"),
        col("e.item"), col("e.count_est"), col("e.count_err"))
      .orderBy(col("source"), col("rnk"))
  }

  val topTokensSketchSql: String =
    """SELECT source, CAST(rnk AS INT) AS rnk, item, count_est, CAST(0 AS BIGINT) AS count_err
      |FROM (
      |  SELECT source, shingle AS item, CAST(count(*) AS BIGINT) AS count_est,
      |    row_number() OVER (PARTITION BY source ORDER BY count(*) DESC, shingle ASC) AS rnk
      |  FROM (
      |    SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS shingle
      |    FROM documents)
      |  GROUP BY source, shingle)
      |WHERE rnk <= 5
      |ORDER BY source, rnk""".stripMargin

  val vocabularySql: String =
    """SELECT shingle AS token, count(*) AS term_freq,
      |  count(DISTINCT doc_id) AS doc_freq
      |FROM (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS shingle
      |  FROM documents)
      |GROUP BY shingle
      |ORDER BY term_freq DESC, token ASC
      |LIMIT 50""".stripMargin

  /** TF-IDF top terms per source, in the determinism-safe
    * factorization: per-(source, term) term counts are EXACT long
    * sums, and the smoothed IDF `ln((N+1)/(df+1)) + 1` multiplies the
    * summed count ONCE — never a float accumulated across rows, so the
    * score is order-independent (a per-row tfidf sum would float-drift
    * under repartitioning). The 6-dp portable round keeps the ranking
    * hash-comparable; ties break on term.
    *
    * Scale: tokens explode linearly; two hash aggregations (doc-term,
    * source-term) + one shuffle join on term; the 1-row corpus size is
    * a broadcast cross join, the same watermark-scalar pattern as
    * Incremental. */
  def tfidfTopTerms(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import graft.ops.ConditionalAgg.roundPortable
    val docs = Tables.documents(s, dir)
    // the (doc, term) frequency table is the inverted-index build —
    // materialize it so document frequency and the per-source rollup
    // read IT instead of each re-tokenizing the corpus (pre-round-9:
    // three corpus tokenizations; now one)
    val tf = docs
      .select(col("doc_id"), col("source"),
        explode(TextAnalysis.tokensCol(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("source"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("dfreq"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    val agg = tf.groupBy(col("source"), col("term"))
      .agg(sum(col("tf")).as("term_count"))
    val scored = agg.join(dfreq, "term")
      .crossJoin(broadcast(total))
      .withColumn("score", roundPortable(
        col("term_count") *
          (log((col("n_docs") + 1).cast("double") / (col("dfreq") + 1).cast("double")) + 1), 6))
      .select("source", "term", "term_count", "score")
    graft.ops.TopK.perGroup(scored, Seq("source"),
        Seq(col("score").desc, col("term").asc), k)
      .orderBy(col("source"), col("rank"))
  }

  val tfidfTopTermsSql: String = {
    import graft.ops.ConditionalAgg.roundPortableSql
    s"""WITH tokens AS (
      |  SELECT doc_id, source,
      |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, source, term, count(*) AS tf FROM tokens GROUP BY 1, 2, 3
      |), dfreq AS (
      |  SELECT term, count(*) AS dfreq FROM tf GROUP BY term
      |), tot AS (SELECT count(*) AS n_docs FROM documents),
      |agg AS (
      |  SELECT source, term, CAST(sum(tf) AS BIGINT) AS term_count
      |  FROM tf GROUP BY 1, 2
      |), scored AS (
      |  SELECT source, term, term_count,
      |    ${roundPortableSql(
             "term_count * (ln(CAST(n_docs + 1 AS DOUBLE) / CAST(dfreq + 1 AS DOUBLE)) + 1)", 6)} AS score
      |  FROM agg JOIN dfreq USING (term) CROSS JOIN tot
      |), ranked AS (
      |  SELECT *, CAST(row_number() OVER (
      |    PARTITION BY source ORDER BY score DESC, term ASC) AS INT) AS rank
      |  FROM scored
      |)
      |SELECT source, term, term_count, score, rank FROM ranked
      |WHERE rank <= 5
      |ORDER BY source, rank""".stripMargin
  }
}
