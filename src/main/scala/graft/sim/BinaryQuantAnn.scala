package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.CosineSimilarity.cosineSim
import graft.ops.TopK
import graft.sources.Tables

/** Binary-quantized similarity search — the 1-bit extreme of the
  * quantization spectrum (brute → SQ8 → PQ → IVF-PQ → BQ; cf. FAISS
  * binary indexes / the sign-random-projection family): each
  * dimension keeps ONE bit (above/below its corpus mean), so a
  * 64-float embedding collapses into a SINGLE BIGINT code. The scan
  * is then `bit_count(xor(code, probe_code))` per row — one codegen'd
  * instruction pair on a packed long, 256× less memory traffic than
  * the float scan — and the top `refine × k` hamming candidates per
  * probe are re-ranked with exact cosine on the original floats.
  *
  * Scale shape: training is one posexplode + Dim-group average
  * (narrow shuffle, Dim doubles of broadcast state — even smaller
  * than SQ8's bounds); coding and the hamming scan are per-row
  * transforms with NO shuffle; the refine join touches only
  * `probes × refine·k` rows of the float table. At 100 TB this is
  * the cheapest possible first-pass filter — the packed codes for
  * 10⁹ vectors fit in 8 GB.
  *
  * Determinism: the mean thresholds are a float-sum aggregate, so the
  * trained state carries the documented k-means-style fold-order
  * caveat; the hamming ranking breaks ties on vec_id and the final
  * ordering is exact over the candidate set. The result is gated by
  * the oracle-side recall gate ([[EmbeddingSim.annGateSql]]) at the
  * calibrated floor, like every trained-state method. 64-bit hamming
  * is COARSE (many ties at Dim=64), so the refine pool is deliberately
  * deep — recall comes from the exact re-rank, the bits only prune. */
object BinaryQuantAnn {

  /** Per-dimension mean thresholds over the corpus (Dim doubles —
    * broadcast-sized trained state). */
  def trainThresholds(embeddings: DataFrame): Seq[Double] = {
    embeddings
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(avg(col("v")).as("m"))
      .orderBy(col("pos"))
      .collect()
      .map(_.getAs[Double]("m")).toSeq
  }

  /** The packed sign code: bit i set iff x[i] > thr[i]. Disjoint
    * powers of two, so the aggregate sum is a bitwise OR. */
  def binaryCode(emb: Column, thr: Seq[Double]): Column = {
    val thrC = typedLit(thr)
    aggregate(
      zip_with(emb, sequence(lit(0), lit(thr.size - 1)), (x, i) =>
        when(x.cast("double") > element_at(thrC, i + 1),
          // shiftleft's Scala binding takes only a literal shift; the
          // SQL function accepts a column amount
          call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc + b)
  }

  /** Hamming-pruned top-k with exact re-rank. `refine` is deeper than
    * SQ8/PQ's because 64-bit hamming buckets many candidates at the
    * same distance — the pool must cross the tie plateaus. */
  def bqTopK(embeddings: DataFrame, nProbes: Int = 10, k: Int = 5,
             refine: Int = 48): DataFrame = {
    val thr = trainThresholds(embeddings)
    val coded = embeddings.select(col("vec_id"), col("label"),
      binaryCode(col("embedding"), thr).as("code"))
    val probes = embeddings.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"),
        binaryCode(col("embedding"), thr).as("probe_code"))
    // packed-code scan: one xor + popcount per (probe, vector)
    val approx = coded.join(broadcast(probes.select("probe_id", "probe_code")),
        col("vec_id") =!= col("probe_id"))
      .withColumn("hamming", bit_count(col("code").bitwiseXOR(col("probe_code"))))
    val cand = TopK.perGroup(
        approx.select(col("probe_id"), col("vec_id"), col("label"), col("hamming")),
        groupKeys = Seq("probe_id"),
        order = Seq(col("hamming").asc, col("vec_id").asc), k = refine * k)
      .select("probe_id", "vec_id", "label")
    // exact re-rank of the surviving candidates on full-precision floats
    val exact = cand
      .join(embeddings.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(probes.select("probe_id", "probe_emb")), Seq("probe_id"))
      .withColumn("cosine", graft.ops.ConditionalAgg.roundPortable(
        cosineSim(col("embedding"), col("probe_emb")), 6))
    TopK.perGroup(
        exact.select(col("probe_id"), col("vec_id"), col("label"), col("cosine")),
        groupKeys = Seq("probe_id"),
        order = Seq(col("cosine").desc, col("vec_id").asc), k = k)
      .orderBy(col("probe_id"), col("rank"))
  }

  def bqTopKQuery(s: SparkSession, dir: String): DataFrame =
    bqTopK(Tables.embeddings(s, dir))
}
