package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.ConditionalAgg
import graft.sources.Tables

/** The post-verdict half of the curation pipeline: actually APPLY the
  * verdicts (emit the clean corpus), report the result per source (the
  * mixing dashboard a data-curation team watches), re-weight sources
  * into a training mixture (with upsampling), and pack the surviving
  * docs into fixed-token-budget training sequences.
  *
  * All four are verdict/stat compositions — narrow joins on doc_id,
  * grouped aggregates, and per-source windows. Nothing here introduces
  * a global window or a driver loop: mixture weights and packing are
  * per-source parallel, which is exactly how a 100 TB corpus shards.
  */
object CurationOps {

  // ---------------------------------------------------------------- apply

  /** Emit the cleaned corpus: documents whose curation verdict is
    * `kept` ([[Curation.verdictsWith]]), fingerprinted rather than
    * re-materialized (the driver output stays narrow; a real pipeline
    * writes the full rows with the same join). One hash join on
    * doc_id against the verdict frame. */
  def applyCuration(documents: DataFrame, verdicts: DataFrame): DataFrame =
    documents
      .join(verdicts.filter(col("verdict") === "kept").select("doc_id"), Seq("doc_id"))
      .select(col("doc_id"), col("source"),
        size(TextAnalysis.tokensCol(col("text"))).as("n_tokens"),
        md5(col("text")).as("text_md5"))
      .orderBy(col("doc_id"))

  private def indent(sql: String) = sql.replace("\n", "\n  ")

  val applyCurationSql: String =
    s"""WITH v AS (
       |  ${indent(Curation.verdictsSql)}
       |)
       |SELECT d.doc_id, d.source,
       |  CAST(len(regexp_extract_all(lower(d.text), '[a-z0-9]+')) AS INT) AS n_tokens,
       |  md5(d.text) AS text_md5
       |FROM documents d JOIN v ON d.doc_id = v.doc_id AND v.verdict = 'kept'
       |ORDER BY d.doc_id""".stripMargin

  // ------------------------------------------------------------ dashboard

  /** Per-source curation dashboard: doc counts by verdict, kept rate,
    * token totals before/after curation, mean quality score. The
    * numbers a curation team tracks per crawl/source to decide mixture
    * weights. Quality scores sum as exact decimals so the per-source
    * mean is partition-order independent. */
  def sourceDashboard(documents: DataFrame, verdicts: DataFrame): DataFrame = {
    val stats = TextAnalysis.docStats(documents)
      .select("doc_id", "token_count", "quality_score")
    verdicts.join(stats, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        ConditionalAgg.countIf(col("verdict") === "kept").as("n_kept"),
        ConditionalAgg.countIf(col("verdict") === "duplicate").as("n_duplicate"),
        ConditionalAgg.countIf(col("verdict") === "contaminated").as("n_contaminated"),
        ConditionalAgg.countIf(col("verdict") === "quality_reject").as("n_quality_reject"),
        ConditionalAgg.countIf(col("verdict") === "eval_holdout").as("n_eval_holdout"),
        sum(col("token_count").cast("long")).as("total_tokens"),
        ConditionalAgg.sumIf(col("verdict") === "kept", col("token_count").cast("long"))
          .as("kept_tokens"),
        sum(col("quality_score").cast(DecimalType(18, 6))).as("__qsum"))
      .withColumn("kept_pct", ConditionalAgg.pct(col("n_kept"), col("n_docs"), 2))
      .withColumn("avg_quality", ConditionalAgg.roundPortable(
        col("__qsum").cast("double") / col("n_docs").cast("double"), 4))
      .drop("__qsum")
      .orderBy(col("source"))
  }

  val sourceDashboardSql: String =
    s"""WITH stats AS (
       |  ${indent(TextAnalysis.docStatsSql)}
       |), v AS (
       |  ${indent(Curation.verdictsSql)}
       |)
       |SELECT v.source,
       |  count(*) AS n_docs,
       |  count(CASE WHEN verdict = 'kept' THEN 1 END) AS n_kept,
       |  count(CASE WHEN verdict = 'duplicate' THEN 1 END) AS n_duplicate,
       |  count(CASE WHEN verdict = 'contaminated' THEN 1 END) AS n_contaminated,
       |  count(CASE WHEN verdict = 'quality_reject' THEN 1 END) AS n_quality_reject,
       |  count(CASE WHEN verdict = 'eval_holdout' THEN 1 END) AS n_eval_holdout,
       |  CAST(sum(token_count) AS BIGINT) AS total_tokens,
       |  CAST(sum(CASE WHEN verdict = 'kept' THEN token_count ELSE 0 END) AS BIGINT) AS kept_tokens,
       |  ${ConditionalAgg.roundPortableSql(
            "100.0 * CAST(count(CASE WHEN verdict = 'kept' THEN 1 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 2)} AS kept_pct,
       |  ${ConditionalAgg.roundPortableSql(
            "CAST(sum(CAST(quality_score AS DECIMAL(18,6))) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 4)} AS avg_quality
       |FROM v JOIN stats ON v.doc_id = stats.doc_id
       |GROUP BY v.source
       |ORDER BY v.source""".stripMargin

  // -------------------------------------------------------------- mixture

  /** Domain-mixture sampling with upsampling: each source gets a
    * deterministic weight (here a function of the source id standing in
    * for a tuned mixture table); weight < 1 downsamples by hashed
    * doc_id, weight > 1 REPLICATES docs (`copy_idx` distinguishes
    * epochs of the same doc in the training stream — the standard way
    * high-quality domains are over-represented).
    *
    * Membership is a pure function of (doc_id, source) — md5-bucket
    * thresholding, never `rand()` — so the mixture is reproducible
    * across reruns, shards, and engines. Per-row expressions + one
    * explode; no shuffle at all. */
  def sampleMixture(documents: DataFrame): DataFrame = {
    val srcNum = regexp_extract(col("source"), "(\\d+)", 1).cast("int")
    val weight = (pmod(srcNum, lit(7)) + 1).cast("double") * 0.25 // 0.25 .. 1.75
    val baseCopies = floor(col("weight")).cast("int")
    // fractional part as a /256 threshold: frac(weight)*256 ∈ {0,64,128,192}
    val frac256 = pmod(pmod(srcNum, lit(7)) + 1, lit(4)) * 64
    val nCopies = (baseCopies +
      when(QualityFilters.md5Bucket(col("doc_id")) < frac256, 1).otherwise(0)).cast("int")
    documents.select(col("doc_id"), col("source"))
      .withColumn("weight", weight)
      .withColumn("n_copies", nCopies)
      .withColumn("copy_idx",
        explode(when(col("n_copies") >= 1, sequence(lit(1), col("n_copies")))
          .otherwise(typedLit(Seq.empty[Int]))))
      .withColumn("copy_idx", col("copy_idx").cast("int"))
      .orderBy(col("doc_id"), col("copy_idx"))
  }

  val sampleMixtureSql: String =
    """WITH base AS (
      |  SELECT doc_id, source,
      |    CAST(regexp_extract(source, '(\d+)', 1) AS INT) % 7 + 1 AS m,
      |    CAST((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      |       + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS INT) AS bucket
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, source,
      |    CAST(m * 0.25 AS DOUBLE) AS weight,
      |    CAST(m // 4 + CASE WHEN bucket < (m % 4) * 64 THEN 1 ELSE 0 END AS INT) AS n_copies
      |  FROM base
      |)
      |SELECT doc_id, source, weight, n_copies,
      |  CAST(unnest(generate_series(1, n_copies)) AS INT) AS copy_idx
      |FROM c
      |WHERE n_copies >= 1
      |ORDER BY doc_id, copy_idx""".stripMargin

  // -------------------------------------------------------------- packing

  /** Pack documents into fixed-token-budget training sequences:
    * contiguous greedy fill in deterministic doc_id order WITHIN each
    * source — a doc starts in the sequence where its running offset
    * falls, so the last doc of a sequence may overflow the budget
    * (overflow-tolerant packing; `fill_pct` > 100 marks those).
    *
    * The window partitions by source, so packing is embarrassingly
    * parallel across sources; a 100 TB corpus adds a shard key to the
    * partition spec (source, shard) and packs each shard the same
    * way — no global cumulative sum anywhere. */
  def packSequences(documents: DataFrame, capacity: Int = 512): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents
      .select(col("doc_id"), col("source"),
        QualityFilters.bpeEstimateCol(col("text")).as("doc_tokens"))
      .withColumn("cum", sum(col("doc_tokens")).over(w))
      .withColumn("seq_id",
        floor((col("cum") - col("doc_tokens")).cast("double") / capacity).cast("int"))
      .groupBy(col("source"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_tokens")).as("seq_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .withColumn("fill_pct", ConditionalAgg.pct(col("seq_tokens"), lit(capacity), 2))
      .orderBy(col("source"), col("seq_id"))
  }

  val packSequencesSql: String =
    s"""WITH perdoc AS (
       |  SELECT doc_id, source,
       |    CAST(list_sum(list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'),
       |      t -> CAST(ceil(CAST(length(t) AS DOUBLE) / 4.0) AS BIGINT))) AS BIGINT) AS doc_tokens
       |  FROM documents
       |), cum AS (
       |  SELECT doc_id, source, doc_tokens,
       |    sum(doc_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM perdoc
       |)
       |SELECT source,
       |  CAST(floor(CAST(cum - doc_tokens AS DOUBLE) / 512) AS INT) AS seq_id,
       |  count(*) AS n_docs,
       |  CAST(sum(doc_tokens) AS BIGINT) AS seq_tokens,
       |  min(doc_id) AS first_doc,
       |  max(doc_id) AS last_doc,
       |  ${ConditionalAgg.roundPortableSql(
            "100.0 * CAST(sum(doc_tokens) AS DOUBLE) / 512.0", 2)} AS fill_pct
       |FROM cum
       |GROUP BY source, seq_id
       |ORDER BY source, seq_id""".stripMargin

  // ------------------------------------------------------- passage dedup

  /** C4-style passage-level global dedup: chunk every document into
    * consecutive `stride`-token passages, drop every passage that
    * already occurred earlier in the corpus (first occurrence by
    * (doc_id, passage_idx) keeps), report the per-doc damage. Catches
    * boilerplate shared across documents that document-level dedup
    * misses.
    *
    * Shape: one explode (linear), one hash shuffle keyed by passage
    * text for the first-occurrence window — each passage group is tiny
    * (its duplicate count), so no skew risk beyond a df-cap which
    * [[graft.dedup.NearDup.candidatePairs]]-style hardening could add
    * if a pathological boilerplate line dominated. */
  def passageDedup(documents: DataFrame, stride: Int = 10): DataFrame = {
    val nChunks = ceil(size(col("__toks")).cast("double") / stride).cast("int")
    // r19 (guide §4): explode the chunk INDEX, not a transform-built
    // passage array — the slice+concat_ws then run as post-explode
    // projections under whole-stage codegen instead of inside an
    // interpreted lambda (same chunks, same order)
    val passages = documents
      .withColumn("__toks", TextAnalysis.tokensCol(col("text")))
      .filter(size(col("__toks")) >= 1)
      .withColumn("__c", explode(sequence(lit(0), nChunks - 1)))
      .withColumn("passage",
        concat_ws(" ", slice(col("__toks"), col("__c") * stride + 1, lit(stride))))
      .select(col("doc_id"), col("passage"))
    // first occurrence by doc order keeps; within a doc the tie order
    // among identical passages doesn't change the per-doc counts
    val w = Window.partitionBy(col("passage")).orderBy(col("doc_id"))
    passages
      .withColumn("occ", row_number().over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_passages"),
        ConditionalAgg.countIf(col("occ") > 1).as("n_dropped"))
      .withColumn("drop_pct", ConditionalAgg.pct(col("n_dropped"), col("n_passages"), 2))
      .orderBy(col("doc_id"))
  }

  val passageDedupSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
       |  FROM documents
       |), passages AS (
       |  SELECT doc_id,
       |    unnest(list_transform(generate_series(0, CAST(ceil(len(t) / 10.0) AS INT) - 1),
       |      c -> array_to_string(t[c * 10 + 1 : c * 10 + 10], ' '))) AS passage
       |  FROM toks WHERE len(t) >= 1
       |), occ AS (
       |  SELECT doc_id,
       |    row_number() OVER (PARTITION BY passage ORDER BY doc_id) AS occ
       |  FROM passages
       |)
       |SELECT doc_id, count(*) AS n_passages,
       |  count(CASE WHEN occ > 1 THEN 1 END) AS n_dropped,
       |  ${ConditionalAgg.roundPortableSql(
            "100.0 * CAST(count(CASE WHEN occ > 1 THEN 1 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 2)} AS drop_pct
       |FROM occ
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  /** Overlapping token-window chunking — the RAG / long-context
    * training chunker (complement of [[passageDedup]]'s non-overlapping
    * stride): a fixed `window` of tokens advancing by `stride`
    * (stride < window ⇒ overlap), emitting per-chunk token spans and
    * the reconstructed chunk text. Chunks per doc =
    * ceil(max(n−window,0)/stride)+1 — every token is covered; the last
    * chunk may be short.
    *
    * Shape: pure per-row array expressions + ONE explode — no shuffle
    * at all before the presentation sort; the fan-out is rows
    * ×(n/stride), the unavoidable chunking volume. */
  def chunkWindows(documents: DataFrame, window: Int = 32, stride: Int = 24): DataFrame = {
    // stride > window would silently leave token gaps between chunks,
    // violating the every-token-covered contract
    require(stride >= 1 && stride <= window,
      s"stride must be in [1, window]: stride=$stride window=$window")
    val n = size(col("__toks"))
    val nChunks =
      ceil(greatest(n - window, lit(0)).cast("double") / stride).cast("int") + 1
    documents
      .withColumn("__toks", TextAnalysis.tokensCol(col("text")))
      .filter(size(col("__toks")) >= 1)
      .withColumn("chunk_idx", explode(sequence(lit(0), nChunks - 1)))
      .withColumn("start_token", col("chunk_idx") * stride + 1)
      .withColumn("n_tokens",
        least(lit(window), n - col("start_token") + 1).cast("int"))
      .withColumn("chunk_text",
        concat_ws(" ", slice(col("__toks"), col("start_token"), lit(window))))
      .select("doc_id", "chunk_idx", "start_token", "n_tokens", "chunk_text")
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  def chunkWindowsQuery(s: SparkSession, dir: String): DataFrame =
    chunkWindows(Tables.documents(s, dir))

  val chunkWindowsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, t,
      |    unnest(generate_series(0,
      |      CAST(ceil(CAST(greatest(len(t) - 32, 0) AS DOUBLE) / 24.0) AS INT))) AS chunk_idx
      |  FROM toks WHERE len(t) >= 1
      |)
      |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
      |  CAST(chunk_idx * 24 + 1 AS INT) AS start_token,
      |  CAST(least(32, len(t) - (chunk_idx * 24 + 1) + 1) AS INT) AS n_tokens,
      |  array_to_string(t[chunk_idx * 24 + 1 : chunk_idx * 24 + 32], ' ') AS chunk_text
      |FROM c
      |ORDER BY doc_id, chunk_idx""".stripMargin

  // ------------------------------------------------------ shuffle shards

  /** Deterministic global training shuffle: every doc lands in one of
    * `nShards` output shards by hashed doc_id, ordered inside the
    * shard by a second hash — a reproducible corpus-wide permutation
    * (identical across reruns and engines, unlike `rand()` or
    * `repartition`'s round-robin) that breaks source/temporal
    * clustering before sequence packing.
    *
    * Shape: per-row hash expressions + one row_number window
    * PARTITIONED BY shard — parallel across shards; at 100 TB raise
    * nShards so each shard's window sort fits an executor (the same
    * contract as any per-shard operation). */
  def shuffleShards(documents: DataFrame, nShards: Int = 8): DataFrame = {
    val shard = pmod(QualityFilters.md5Bucket(col("doc_id")), lit(nShards)).cast("int")
    val w = Window.partitionBy(col("shard"))
      .orderBy(md5(concat(lit("pos|"), col("doc_id").cast("string"))), col("doc_id"))
    documents
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(w))
      .select(col("doc_id"), col("source"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  val shuffleShardsSql: String =
    """WITH b AS (
      |  SELECT doc_id, source,
      |    CAST(((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      |       + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)) % 8 AS INT) AS shard
      |  FROM documents
      |)
      |SELECT doc_id, source, shard,
      |  CAST(row_number() OVER (PARTITION BY shard
      |    ORDER BY md5('pos|' || CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS pos
      |FROM b
      |ORDER BY shard, pos""".stripMargin

  // ------------------------------------------------------ shard manifest

  /** Per-(shard, source) PROVENANCE manifest for the shuffled corpus —
    * the reproducibility artifact a training-data release ships next
    * to its shards: document counts, id ranges, char volumes, and an
    * order-independent content fingerprint (XOR of each doc's portable
    * 60-bit hash over `doc_id|text` — id-salted so byte-identical
    * twin docs cannot cancel out). Same corpus + same pipeline config
    * ⇒ byte-identical manifest; ANY dropped, duplicated or mutated
    * document flips its (shard, source) fingerprint.
    *
    * Scale: one hash-aggregate over the corpus (map-side combinable —
    * XOR and sums are associative/commutative), output = shards ×
    * sources metadata rows. Lineage audits diff manifests, never
    * corpora. */
  def shardManifest(documents: DataFrame, nShards: Int = 8): DataFrame = {
    val shard = pmod(QualityFilters.md5Bucket(col("doc_id")), lit(nShards)).cast("int")
    val contentHash = graft.dedup.NearDup.h60(
      concat(col("doc_id").cast("string"), lit("|"), col("text")))
    documents
      .withColumn("shard", shard)
      .withColumn("h", contentHash)
      .groupBy(col("shard"), col("source"))
      .agg(
        count(lit(1)).as("doc_count"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"),
        sum(length(col("text")).cast("long")).as("total_chars"),
        expr("bit_xor(h)").as("content_xor"))
      .orderBy(col("shard"), col("source"))
  }

  /** DuckDB twin: identical md5-bucket shard key, identical id-salted
    * h60 fold, BIGINT-cast sums (DuckDB widens SUM(BIGINT) to
    * HUGEINT). */
  val shardManifestSql: String =
    """WITH m AS (
      |  SELECT doc_id, source,
      |    CAST(((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      |       + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)) % 8 AS INT) AS shard,
      |    CAST(length(text) AS BIGINT) AS chars,
      |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || text), 1, 15) AS BIGINT) AS h
      |  FROM documents
      |)
      |SELECT shard, source,
      |  count(*) AS doc_count,
      |  min(doc_id) AS min_doc_id,
      |  max(doc_id) AS max_doc_id,
      |  CAST(sum(chars) AS BIGINT) AS total_chars,
      |  bit_xor(h) AS content_xor
      |FROM m
      |GROUP BY shard, source
      |ORDER BY shard, source""".stripMargin

  // ------------------------------------------------------- query wrappers

  def passageDedupQuery(s: SparkSession, dir: String): DataFrame =
    passageDedup(Tables.documents(s, dir))

  def shuffleShardsQuery(s: SparkSession, dir: String): DataFrame =
    shuffleShards(Tables.documents(s, dir))

  def shardManifestQuery(s: SparkSession, dir: String): DataFrame =
    shardManifest(Tables.documents(s, dir))

  def sampleMixtureQuery(s: SparkSession, dir: String): DataFrame =
    sampleMixture(Tables.documents(s, dir))

  def packSequencesQuery(s: SparkSession, dir: String): DataFrame =
    packSequences(Tables.documents(s, dir))
}
