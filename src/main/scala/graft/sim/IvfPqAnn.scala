package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.CosineSimilarity.cosineSim
import graft.ops.TopK
import graft.sources.Tables

/** IVF-PQ: the [[IvfAnn]] coarse quantizer composed with
  * [[ProductQuantAnn]] codebooks trained on RESIDUALS (vector −
  * assigned centroid) — the architecture FAISS calls IVFPQ and the
  * standard billion-vector index layout (Jégou et al. 2011 §IV:
  * coarse quantizer prunes the scan to `nprobe` inverted lists,
  * residual PQ compresses what remains; residuals are smaller than
  * raw vectors so the same codebook budget spends on a tighter
  * distribution).
  *
  * Search: a probe scores only the lists of its `nprobe` nearest
  * centroids (the IVF prune), each candidate is scored on
  * `centroid + PQ-reconstructed residual` against the full-precision
  * probe (ADC), and the top `refine × k` per probe are re-ranked with
  * exact cosine — final ordering exact over the candidate set.
  *
  * Scale shape: centroids and codebooks are metadata-sized broadcast
  * state; assignment, residual encode and ADC scoring are per-row
  * codegen-able projections; the only joins are the same
  * broadcast-probe-lists ⋈ inverted-lists hash join as IVF plus the
  * narrow refine join back to full precision. Memory per corpus
  * vector in the scanned lists: 8-byte PQ code + 4-byte list id vs
  * 256-byte floats.
  *
  * Determinism: same caveats as its two components (k-means and Lloyd
  * means are float-fold sensitive — shapes only) → rows-only checked,
  * recall-gated by the `ivfpq` floor in the oracle-checked
  * `sim_recall_report`. */
object IvfPqAnn {

  /** Corpus assignment with residuals: (centroid_id, vec_id, label,
    * embedding, centroid, residual) — residual in exact double
    * arithmetic; the centroid column stays so the ADC reconstruction
    * doesn't re-join the centroid table it just left. */
  private[sim] def assignedWithResiduals(embeddings: DataFrame,
                                         cents: DataFrame): DataFrame =
    IvfAnn.assign(embeddings, cents)
      .join(broadcast(cents), "centroid_id")
      .withColumn("residual", zip_with(col("embedding"), col("centroid"),
        (x, c) => x.cast("double") - c.cast("double")))

  /** `centsOpt` lets a caller pin a pre-materialized centroid frame
    * (k-means is float-fold sensitive, so recomputation is not
    * guaranteed bit-identical — the spec's list-membership audit
    * passes the same frame it checks against). */
  def ivfPqTopK(embeddings: DataFrame, nProbes: Int = 10, k: Int = 5,
                nClusters: Int = 16, nprobe: Int = 4, refine: Int = 32,
                iters: Int = 2, trainSampleMod: Int = 4,
                centsOpt: Option[DataFrame] = None): DataFrame = {
    val cents = centsOpt.getOrElse(
      IvfAnn.centroids(embeddings, nClusters).localCheckpoint())
    val assigned = assignedWithResiduals(embeddings, cents)
    val books = ProductQuantAnn.trainCodebooksOn(
      assigned, col("residual"), iters, trainSampleMod)
    // ADC representation: centroid + reconstructed residual, per row
    val coded = assigned
      .select(col("centroid_id"), col("vec_id"), col("label"),
        transform(zip_with(
          ProductQuantAnn.reconstructionOf(col("residual"), books),
          col("centroid"), (r, c) => r + c.cast("double")),
          x => x.cast("float")).as("approx_emb"))
    val probes = embeddings.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"))
    // IVF prune: each probe visits its nprobe nearest lists only
    val probeLists = TopK.perGroup(
        probes.crossJoin(broadcast(cents))
          .withColumn("sim", cosineSim(col("probe_emb"), col("centroid"))),
        groupKeys = Seq("probe_id"),
        order = Seq(col("sim").desc, col("centroid_id").asc), k = nprobe)
      .select(col("probe_id"), col("probe_emb"), col("centroid_id"))
    val approx = coded.join(broadcast(probeLists), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("approx_cos", cosineSim(col("approx_emb"), col("probe_emb")))
    val cand = TopK.perGroup(
        approx.select(col("probe_id"), col("vec_id"), col("label"), col("approx_cos")),
        groupKeys = Seq("probe_id"),
        order = Seq(col("approx_cos").desc, col("vec_id").asc), k = refine * k)
      .select("probe_id", "vec_id", "label")
    // exact re-rank of survivors on the original floats
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

  def ivfPqTopKQuery(s: SparkSession, dir: String): DataFrame =
    ivfPqTopK(Tables.embeddings(s, dir))
}
