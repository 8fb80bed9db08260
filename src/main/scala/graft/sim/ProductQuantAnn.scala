package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.CosineSimilarity.cosineSim
import graft.ops.TopK
import graft.sources.Tables

/** PQ (product quantization) similarity search — the high-compression
  * companion to [[ScalarQuantAnn]] (SQ8) and [[IvfAnn]]: the 64-dim
  * vector is split into `M`=16 contiguous 4-dim subvectors, each
  * quantized independently against a per-subspace codebook of `K`=16
  * centroids learned by Lloyd's algorithm, so a 256-byte float vector
  * becomes 16 4-bit codes = 8 bytes (32× compression; cf. Jégou,
  * Douze, Schmid, "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011 — the codebook layout FAISS calls PQ16x4).
  *
  * Search is asymmetric (ADC): probes stay full-precision, corpus
  * vectors are scored on their codebook RECONSTRUCTION (one
  * codegen'd cosine over the reconstructed floats — no shuffle), the
  * top `refine × k` candidates per probe are re-ranked with exact
  * cosine on the original floats, so the final ordering is exact over
  * the candidate set (same refine contract as SQ8).
  *
  * Scale shape: codebooks are trained on a DETERMINISTIC hash sample
  * of the corpus (`pmod(xxhash64(vec_id), trainSampleMod) = 0` — at
  * 100 TB nobody Lloyd-iterates the full corpus; the sample bound
  * keeps training constant-cost while encode/scan stay linear), the
  * trained books are metadata-sized driver state broadcast into a
  * codegen'd argmin projection (encode touches each row once, no
  * shuffle), and the scan is the same broadcast-probe single pass as
  * brute force but over 8-byte codes instead of 256-byte floats —
  * memory-bandwidth-bound scans run ~32× lighter, which is the whole
  * point of PQ at petabyte scale.
  *
  * Determinism: seeds are the first `K` sample vectors by vec_id,
  * argmin ties break to the lowest code (array_position returns the
  * FIRST minimum), but Lloyd means average floats (fold-order
  * sensitive) — like IVF, codebook SHAPES only; the query is
  * rows-only checked and recall-gated in `sim_recall_report` against
  * the oracle-checked brute-force baseline. */
object ProductQuantAnn {

  val Dim = 64
  val M = 16
  val SubDim = 4
  val K = 16

  /** Unit-L2 normalization in double. Cosine is invariant to scaling
    * the corpus vector, but subspace codebooks are shared across
    * vectors of different magnitudes — normalizing first removes the
    * magnitude axis from what the codebooks must spend centroids on
    * (the standard pre-step for PQ under cosine/IP metrics).
    *
    * r18: the native fused [[graftext.L2NormalizeDouble]] Expression
    * replaces the interpreted transform→aggregate→divide HOF chain —
    * same double widening, Σx² fold order and zero-norm branch
    * (bit-identity pinned in VectorCodecSpec), one JIT'd loop. */
  private[sim] def normalized(emb: Column): Column =
    org.apache.spark.sql.graftext.VectorCodec.l2normalize(emb)

  /** (vec_id, m, sub) rows: the given double-array vector column
    * exploded into its M contiguous subvectors. */
  private def subRowsOf(df: DataFrame, vec: Column): DataFrame =
    df.select(col("vec_id"), vec.as("__v"))
      .select(col("vec_id"),
        posexplode(array((0 until M).map(m =>
          slice(col("__v"), m * SubDim + 1, SubDim)): _*)).as(Seq("m", "sub")))

  /** argmin code (0-based) of `sub` against the codebook of runtime
    * subspace `m`; ties → lowest code (first minimum). r18: native
    * [[graftext.PqArgminAt]] — the same Σ(x−c)² fold order and
    * first-minimum tie-break as the previous array_min/array_position
    * HOF tree (bit-identity pinned in VectorCodecSpec), evaluated as
    * one compiled loop instead of K interpreted l2sq folds. The
    * single source of encode truth is now [[graftext.PqBooks]] —
    * training assignment and scan reconstruction share its loop. */
  private def argminCode(books: Seq[Seq[Seq[Double]]], m: Column,
                         sub: Column): Column =
    org.apache.spark.sql.graftext.VectorCodec.pqArgminAt(m, sub, books)

  /** Train per-subspace codebooks over the unit-normalized embedding
    * column (the cosine-metric default). */
  def trainCodebooks(embeddings: DataFrame, iters: Int = 2,
                     trainSampleMod: Int = 4): Seq[Seq[Seq[Double]]] =
    trainCodebooksOn(embeddings, normalized(col("embedding")), iters, trainSampleMod)

  /** Train per-subspace codebooks with Lloyd iterations over the
    * deterministic hash sample of any double-array vector column
    * (IVF-PQ trains on RESIDUALS — no normalization there). Empty
    * clusters keep their previous centroid. Returns M × K × SubDim
    * (metadata-sized). */
  def trainCodebooksOn(df: DataFrame, vec: Column, iters: Int = 2,
                       trainSampleMod: Int = 4): Seq[Seq[Seq[Double]]] = {
    val sample =
      if (trainSampleMod <= 1) df
      else df.filter(pmod(xxhash64(col("vec_id")), lit(trainSampleMod)) === 0)
    val subs = subRowsOf(sample, vec).localCheckpoint()
    // seeds: subvectors of the first K sample vectors by vec_id —
    // ranked driver-side inside the one collect (K×M rows), no
    // unpartitioned window in the plan
    var books = seedBooks(
      subs.join(broadcast(subs.select("vec_id").distinct()
        .orderBy("vec_id").limit(K)), "vec_id")
        .select("m", "vec_id", "sub"))
    for (_ <- 1 to iters) {
      val assigned = subs.select(col("m"),
        argminCode(books, col("m"), col("sub")).as("code"), col("sub"))
      val means = assigned
        .select(col("m"), col("code"), posexplode(col("sub")).as(Seq("pos", "v")))
        .groupBy("m", "code", "pos").agg(avg(col("v")).as("mu"))
        .groupBy("m", "code")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mu")))),
          x => x.getField("mu")).as("sub"))
      books = meanBooks(means, prev = books)
    }
    books
  }

  /** The one driver-side materialization site (metadata-sized either
    * way: ≤ M×K rows of SubDim doubles — 1 024 values, same class as
    * ScalarQuantAnn's 64 trained bounds). */
  private def rows(df: DataFrame): Array[org.apache.spark.sql.Row] = df.collect()

  /** Seed codebooks from (m, vec_id, sub) rows of the first K sample
    * vectors: code = rank of vec_id, assigned driver-side. */
  private def seedBooks(df: DataFrame): Seq[Seq[Seq[Double]]] = {
    val byM = rows(df).map { r =>
      (r.getAs[Int]("m"), r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Double]]("sub").toSeq)
    }.groupBy(_._1)
    Seq.tabulate(M) { m =>
      val sorted = byM.getOrElse(m, Array.empty).sortBy(_._2).map(_._3).toSeq
      Seq.tabulate(K)(k => if (k < sorted.size) sorted(k)
        else Seq.fill(SubDim)(0.0))
    }
  }

  /** (m, code, sub) mean rows → nested M × K × SubDim books. Codes
    * absent from `df` (empty clusters) keep their `prev` centroid. */
  private def meanBooks(df: DataFrame,
                        prev: Seq[Seq[Seq[Double]]]): Seq[Seq[Seq[Double]]] = {
    val got = rows(df).map { r =>
      (r.getAs[Int]("m"), r.getAs[Int]("code")) ->
        r.getAs[scala.collection.Seq[Double]]("sub").toSeq
    }.toMap
    Seq.tabulate(M, K)((m, k) => got.getOrElse((m, k), prev(m)(k)))
  }

  /** Reconstruction of any double-array vector column under trained
    * books: per subspace, the argmin code's centroid, concatenated —
    * one fused encode+decode projection (doubles out), no shuffle.
    * r18: native [[graftext.PqReconstruct]] (one compiled loop, one
    * plan node) replaces the flatten-of-M-argmin-HOF-trees form —
    * same math, bit-identity pinned in VectorCodecSpec. */
  def reconstructionOf(vec: Column, books: Seq[Seq[Seq[Double]]]): Column =
    org.apache.spark.sql.graftext.VectorCodec.pqReconstruct(vec, books)

  def reconstruct(embeddings: DataFrame,
                  books: Seq[Seq[Seq[Double]]]): DataFrame =
    embeddings.select(col("vec_id"), col("label"),
      normalized(col("embedding")).as("nemb"))
      .select(col("vec_id"), col("label"),
        transform(reconstructionOf(col("nemb"), books),
          x => x.cast("float")).as("approx_emb"))

  /** ADC top-k with exact re-rank: approx-score probes against the PQ
    * reconstructions, keep `refine × k` per probe, re-rank on the
    * original floats (same contract as [[ScalarQuantAnn.sq8TopK]]).
    *
    * `refine = 48` / `iters = 4` are deliberately generous: PQ on
    * near-random unit vectors is the hardest quantizer regime, and the
    * driver regenerates the corpus each round, so recall must survive
    * data-seed wobble, not just one measurement (refine = 16 measured
    * 0.66–1.00 at sf0.1 across two data seeds; refine = 48 measures
    * 0.94–1.00). The re-rank cost is refine·k rows per probe — noise
    * next to the corpus-wide ADC scan, which is unchanged. */
  def pqTopK(embeddings: DataFrame, nProbes: Int = 10, k: Int = 5,
             refine: Int = 48, iters: Int = 4, trainSampleMod: Int = 4): DataFrame = {
    val books = trainCodebooks(embeddings, iters, trainSampleMod)
    val coded = reconstruct(embeddings, books)
    val probes = embeddings.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"))
    val approx = coded.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .withColumn("approx_cos", cosineSim(col("approx_emb"), col("probe_emb")))
    val cand = TopK.perGroup(
        approx.select(col("probe_id"), col("vec_id"), col("label"), col("approx_cos")),
        groupKeys = Seq("probe_id"),
        order = Seq(col("approx_cos").desc, col("vec_id").asc), k = refine * k)
      .select("probe_id", "vec_id", "label")
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

  def pqTopKQuery(s: SparkSession, dir: String): DataFrame =
    pqTopK(Tables.embeddings(s, dir))
}
