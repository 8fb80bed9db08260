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
  * The model here is the same corpus unigram LM the expression-based
  * [[QualityFilters.lmScores]] computes relationally — deliberately,
  * so this scorer is verified EXACTLY (same DuckDB oracle, green hash
  * row): the driver-side `collect()` is vocabulary-sized (the model
  * artifact, not the data), and per-token NLL contributions replicate
  * Spark's double→DECIMAL(28,12) cast via the shortest-string
  * `BigDecimal.valueOf` so the decimal sum is bit-identical and
  * partition-order independent.
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

  def lmScoresBatch(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._

    // ---- fit: the unigram model (vocabulary-sized driver artifact)
    val freqs = documents
      .select(explode(TextAnalysis.tokensCol(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("tf"))
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
            val nll = -math.log(m(t).toDouble / n.toDouble)
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
    lmScoresBatch(Tables.documents(s, dir))
}
