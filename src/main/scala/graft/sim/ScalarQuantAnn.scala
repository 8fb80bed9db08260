package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.CosineSimilarity.cosineSim
import graft.ops.TopK
import graft.sources.Tables

/** SQ8 scalar-quantized similarity search — the compressed-scan
  * companion to [[IvfAnn]]: each float dimension is affinely mapped to
  * an 8-bit code using per-dimension [min, max] trained over the
  * corpus. A 64-float embedding becomes 64 bytes (4× less memory
  * bandwidth — at 100 TB the scan is bandwidth-bound, so this is the
  * classic first ANN compression step, cf. FAISS SQ8 / Milvus
  * IVF_SQ8), candidates are scored on DEQUANTIZED codes, and the
  * top `refine × k` per probe are re-ranked with exact cosine on the
  * original floats so the final ordering is exact over the candidate
  * set.
  *
  * Scale shape: training is one posexplode + 64-group aggregate
  * (narrow shuffle); quantization and approx scoring are per-row
  * codegen'd transforms (no shuffle); the refine step joins the
  * candidate ids back to the full-precision table — at production
  * scale that is a hash join on vec_id against the (much larger)
  * float table, touching only `probes × refine·k` rows of it.
  *
  * Determinism: the trained bounds are exact min/max (order-
  * independent), codes are exact integer arithmetic, and ties in the
  * approx ranking break on vec_id — rows-only checked (float-fold
  * portability), recall-verified in DedupSimSpec vs the oracle-checked
  * brute-force baseline. */
object ScalarQuantAnn {

  /** Per-dimension [min, max] over the corpus, collected as two
    * Dim-length arrays (metadata-sized, like IVF centroids). */
  def trainBounds(embeddings: DataFrame): (Seq[Double], Seq[Double]) = {
    val stats = embeddings
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      .orderBy(col("pos"))
      .collect()
    (stats.map(_.getAs[Float]("lo").toDouble).toSeq,
      stats.map(_.getAs[Float]("hi").toDouble).toSeq)
  }

  /** 8-bit codes: code[i] = round(255 · (x[i] − lo[i]) / (hi[i] − lo[i])),
    * constant dimensions map to 0. Exact integer output in [0, 255]. */
  def quantize(emb: org.apache.spark.sql.Column,
               lo: Seq[Double], hi: Seq[Double]): org.apache.spark.sql.Column = {
    val loC = typedLit(lo)
    val hiC = typedLit(hi)
    zip_with(emb, sequence(lit(0), lit(lo.size - 1)), (x, i) => {
      val l = element_at(loC, i + 1)
      val h = element_at(hiC, i + 1)
      when(h === l, lit(0))
        .otherwise(round(lit(255.0) * (x.cast("double") - l) / (h - l)).cast("int"))
    })
  }

  /** Dequantized reconstruction (float array) for approximate scoring. */
  def dequantize(code: org.apache.spark.sql.Column,
                 lo: Seq[Double], hi: Seq[Double]): org.apache.spark.sql.Column = {
    val loC = typedLit(lo)
    val hiC = typedLit(hi)
    zip_with(code, sequence(lit(0), lit(lo.size - 1)), (c, i) => {
      val l = element_at(loC, i + 1)
      val h = element_at(hiC, i + 1)
      (l + c.cast("double") * (h - l) / 255.0).cast("float")
    })
  }

  /** Compressed-scan top-k with exact re-rank: approx-score the SQ8
    * codes, keep `refine × k` candidates per probe, re-rank those on
    * the original floats. */
  def sq8TopK(embeddings: DataFrame, nProbes: Int = 10, k: Int = 5,
              refine: Int = 4): DataFrame = {
    val (lo, hi) = trainBounds(embeddings)
    val coded = embeddings.select(col("vec_id"), col("label"),
      dequantize(quantize(col("embedding"), lo, hi), lo, hi).as("approx_emb"))
    val probes = embeddings.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"))
    // compressed scan: approx cosine over dequantized codes
    val approx = coded.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .withColumn("approx_cos", cosineSim(col("approx_emb"), col("probe_emb")))
    val cand = TopK.perGroup(
        approx.select(col("probe_id"), col("vec_id"), col("label"), col("approx_cos")),
        groupKeys = Seq("probe_id"),
        order = Seq(col("approx_cos").desc, col("vec_id").asc), k = refine * k)
      .select("probe_id", "vec_id", "label")
    // exact re-rank of the surviving candidates on full-precision floats
    val exact = cand
      .join(embeddings.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(probes), Seq("probe_id"))
      .withColumn("cosine", graft.ops.ConditionalAgg.roundPortable(
        cosineSim(col("embedding"), col("probe_emb")), 6))
    TopK.perGroup(
        exact.select(col("probe_id"), col("vec_id"), col("label"), col("cosine")),
        groupKeys = Seq("probe_id"),
        order = Seq(col("cosine").desc, col("vec_id").asc), k = k)
      .orderBy(col("probe_id"), col("rank"))
  }

  def sq8TopKQuery(s: SparkSession, dir: String): DataFrame =
    sq8TopK(Tables.embeddings(s, dir))
}
