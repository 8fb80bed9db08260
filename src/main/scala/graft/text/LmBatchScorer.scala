package graft.text

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Broadcast-model batch scoring — the Spark shape for running a
  * trained model (KenLM, a quality classifier, a tokenizer) over a
  * 100 TB corpus: fit/load the model ONCE, broadcast it to every
  * executor, and score documents partition-batched with
  * `mapPartitions` so per-partition setup (model lookup structures,
  * JNI handles for a real KenLM) is paid once per task, not per row.
  *
  * The fitted vocabulary is CAPPED at the top-`vocabCap` tokens by
  * corpus frequency (ties broken by token, so the fit is
  * deterministic); everything else scores at an out-of-vocabulary
  * floor probability of 0.5/n_total — strictly below the rarest kept
  * token's 1/n_total. That bound is what makes the broadcast safe at
  * scale: a 100 TB web corpus has 10⁸⁺ distinct tokens, and an
  * uncapped fit would be a driver OOM, while the capped model is
  * ≤ vocabCap entries no matter the corpus (exactly how real LMs ship
  * — a fixed vocabulary plus an UNK bucket). The driver-side
  * `collect()` is bounded by `vocabCap` rows, not the data.
  *
  * Scoring is verified EXACTLY (DuckDB oracle, green hash row): the
  * driver query passes a cap that BINDS on the test corpus so both
  * the in-vocabulary and the OOV floor paths are hash-checked, and
  * per-token NLL contributions replicate Spark's double→DECIMAL(28,12)
  * cast via the shortest-string `BigDecimal.valueOf` so the decimal
  * sum is bit-identical and partition-order independent.
  *
  * A real KenLM swap-in changes only `scoreTokens` (model lookup →
  * FFI call); the fit/broadcast/mapPartitions plumbing is the
  * production shape already.
  */
object LmBatchScorer {

  private val TokenRe = "[a-z0-9]+".r

  /** Tokenizer twin of [[TextAnalysis.tokensCol]] (Spark's lower() is
    * locale-independent simple case mapping — Locale.ROOT matches). */
  private[text] def tokenize(text: String): Seq[String] =
    TokenRe.findAllIn(text.toLowerCase(java.util.Locale.ROOT)).toSeq

  /** Driver-query cap: binds on the 31-token synthetic corpus so the
    * OOV floor path is exercised and oracle-verified at every SF. */
  private[graft] val TestVocabCap = 24

  def lmScoresBatch(documents: DataFrame, vocabCap: Int = 1 << 20): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._

    // ---- fit: top-vocabCap unigram model (bounded driver artifact;
    // ordering (tf DESC, token ASC) is a total order → deterministic)
    val freqs = documents
      .select(explode(TextAnalysis.tokensCol(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("token"))
      .limit(vocabCap)
    val model: Map[String, Long] =
      freqs.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nTotal: Long = model.valuesIterator.sum
    val bcModel = spark.sparkContext.broadcast((model, nTotal))

    // ---- score: partition-batched inference over the broadcast model
    val scored = documents.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val (m, n) = bcModel.value
        it.map { case (docId, text) =>
          val toks = tokenize(text)
          var acc = JBigDecimal.ZERO
          toks.foreach { t =>
            // OOV floor 0.5/n: below every kept token's 1/n, and the
            // same double path (divide, then log) the oracle computes
            val p = m.get(t) match {
              case Some(tf) => tf.toDouble / n.toDouble
              case None     => 0.5 / n.toDouble
            }
            val nll = -math.log(p)
            // Spark's double→DECIMAL(28,12) cast rounds the double's
            // SHORTEST decimal string (BigDecimal.valueOf), not its
            // exact binary expansion — mirror it or hashes drift.
            acc = acc.add(JBigDecimal.valueOf(nll).setScale(12, RoundingMode.HALF_UP))
          }
          (docId, toks.size.toLong, acc)
        }
      }
      .toDF("doc_id", "n_tokens", "nll_sum")

    scored.select(col("doc_id"), col("n_tokens"),
        graft.ops.ConditionalAgg.roundPortable(
          col("nll_sum").cast("double") / col("n_tokens").cast("double"), 4).as("avg_nll"))
      .orderBy(col("doc_id"))
  }

  def lmScoresBatchQuery(s: SparkSession, dir: String): DataFrame =
    lmScoresBatch(Tables.documents(s, dir), vocabCap = TestVocabCap)

  /** DuckDB twin of [[lmScoresBatchQuery]]: same top-K fit (tf DESC,
    * token ASC), same capped-vocabulary total, same 0.5/n_total OOV
    * floor, same DECIMAL(28,12) per-token rounding. */
  val lmScoresBatchSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
       |  FROM documents
       |),
       |vocab AS (
       |  SELECT token, count(*) AS tf FROM tok GROUP BY token
       |  ORDER BY tf DESC, token LIMIT $TestVocabCap
       |),
       |tot AS (SELECT sum(tf) AS n_total FROM vocab)
       |SELECT doc_id, count(*) AS n_tokens,
       |  CAST(round(CAST(
       |    CAST(sum(CAST(-ln(CASE WHEN tf IS NULL
       |        THEN 0.5 / CAST(n_total AS DOUBLE)
       |        ELSE CAST(tf AS DOUBLE) / CAST(n_total AS DOUBLE) END)
       |      AS DECIMAL(28,12))) AS DOUBLE)
       |      / CAST(count(*) AS DOUBLE)
       |    AS DECIMAL(28,10)), 4) AS DOUBLE) AS avg_nll
       |FROM tok LEFT JOIN vocab USING (token), tot
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin
}
