package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.ConditionalAgg
import graft.sources.Tables

/** Data Selection with Importance Resampling (DSIR, Xie et al. 2023,
  * public method): score every raw document by how much more likely it
  * is under a TARGET-domain unigram model than under the raw-corpus
  * model — the standard cheap way to up-select "looks like my target
  * domain" data from a 100 TB crawl.
  *
  * weight(doc) = mean over tokens of
  *   ln p_target(tok) − ln p_raw(tok),   add-1 smoothed.
  *
  * Shape at scale: two token-frequency aggregates (the "models" stay
  * distributed — only the 1-row totals broadcast), one shuffle join of
  * the token stream against the model frames, then a per-doc decimal
  * sum. The per-token log-ratio is computed as ONE ln() call and cast
  * to DECIMAL(28,12) before summing, so the per-doc mean is
  * independent of partition order and replays exactly in DuckDB.
  *
  * The target slice here is the `src_num % 5 == 0` source group —
  * standing in for "quality domain" the way the curation stages pin
  * their eval slice to `doc_id % 50`.
  */
object DsirWeights {

  def dsirWeights(documents: DataFrame): DataFrame = {
    val srcNum = regexp_extract(col("source"), "(\\d+)", 1).cast("int")
    val tok = documents
      .withColumn("is_target", pmod(srcNum, lit(5)) === 0)
      .select(col("doc_id"), col("source"), col("is_target"),
        explode(TextAnalysis.tokensCol(col("text"))).as("token"))
    // model build: ONE pass folds raw and target term frequencies
    // together (a conditional sum instead of a second tokenize +
    // aggregate); the vocab-sized tf table is materialized as the
    // importance model — the corpus is then tokenized exactly once
    // more to score against it (build-model / score-corpus, two total
    // scans — the pre-round-9 shape re-tokenized the corpus 5×)
    val tf = tok.groupBy(col("token")).agg(
        count(lit(1)).as("tf_raw"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("tf_tgt"))
      .localCheckpoint()
    val totals = tf
      .agg(sum(col("tf_raw")).as("n_raw"),
        sum(col("tf_tgt")).as("n_tgt"),
        count(lit(1)).as("vocab"))
    val ratio =
      ((col("tf_tgt") + 1).cast("double") *
        (col("n_raw") + col("vocab")).cast("double")) /
        ((col("n_tgt") + col("vocab")).cast("double") *
          (col("tf_raw") + 1).cast("double"))
    tok.join(tf, "token")
      .crossJoin(broadcast(totals))
      .withColumn("lr", log(ratio).cast(DecimalType(28, 12)))
      .groupBy(col("doc_id"), col("source"), col("is_target"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("lr")).as("lr_sum"))
      .select(col("doc_id"), col("source"), col("is_target"), col("n_tokens"),
        ConditionalAgg.roundPortable(
          col("lr_sum").cast("double") / col("n_tokens").cast("double"), 4)
          .as("dsir_logweight"))
      .orderBy(col("doc_id"))
  }

  def dsirWeightsQuery(s: SparkSession, dir: String): DataFrame =
    dsirWeights(Tables.documents(s, dir))

  val dsirWeightsSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, source,
       |    CAST(regexp_extract(source, '(\\d+)', 1) AS INT) % 5 = 0 AS is_target,
       |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
       |  FROM documents
       |), raw_tf AS (
       |  SELECT token, count(*) AS tf_raw FROM tok GROUP BY token
       |), tgt_tf AS (
       |  SELECT token, count(*) AS tf_tgt FROM tok WHERE is_target GROUP BY token
       |), totals AS (
       |  SELECT CAST(sum(tf_raw) AS BIGINT) AS n_raw,
       |    CAST(sum(coalesce(tf_tgt, 0)) AS BIGINT) AS n_tgt,
       |    count(*) AS vocab
       |  FROM raw_tf LEFT JOIN tgt_tf USING (token)
       |)
       |SELECT doc_id, source, is_target, count(*) AS n_tokens,
       |  ${ConditionalAgg.roundPortableSql(
            "CAST(sum(CAST(ln(" +
              "(CAST(coalesce(tf_tgt, 0) + 1 AS DOUBLE) * CAST(n_raw + vocab AS DOUBLE))" +
              " / (CAST(n_tgt + vocab AS DOUBLE) * CAST(tf_raw + 1 AS DOUBLE))" +
              ") AS DECIMAL(28,12))) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 4)} AS dsir_logweight
       |FROM tok
       |JOIN raw_tf USING (token)
       |LEFT JOIN tgt_tf USING (token)
       |CROSS JOIN totals
       |GROUP BY doc_id, source, is_target
       |ORDER BY doc_id""".stripMargin
}
