package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.CosineSimilarity.cosineSim
import graft.ops.TopK
import graft.sources.Tables

/** IVF (inverted-file) approximate nearest neighbour — the
  * cluster-then-probe alternative to hyperplane LSH
  * ([[EmbeddingSim.lshTopK]]): a small coarse quantizer (k-means-style
  * centroids) partitions the corpus into inverted lists; a probe
  * scores only the lists of its `nprobe` nearest centroids.
  *
  * Scale shape: the centroid table is tiny and BROADCAST everywhere;
  * corpus assignment is one narrow pass + a window top-1 per vector
  * (shuffle on vec_id); the search itself is a hash join
  * probe-lists ⋈ inverted-lists on centroid_id — linear in the corpus
  * slices actually probed, never all-pairs. Recall/latency trade is
  * `nClusters` × `nprobe` (classic IVF tuning), measured in
  * DedupSimSpec against the oracle-verified brute-force baseline.
  *
  * Determinism: seeds are the first `nClusters` vectors by vec_id and
  * Lloyd refinement uses order-independent per-dimension means
  * (avg over doubles is Spark-deterministic only in exact arithmetic —
  * here means feed only CLUSTER SHAPES, and assignments compare
  * rounded similarities, so signature-level portability is not
  * claimed: the query is rows-only checked, recall-verified in sbt.) */
object IvfAnn {

  /** Assign every vector to its max-cosine centroid (shared with
    * [[SemDedup]] and [[IvfPqAnn]], which reuse the same coarse
    * quantizer; public — list assignment is part of the IVF API). */
  def assign(embeddings: DataFrame, cents: DataFrame): DataFrame = {
    val scored = embeddings.crossJoin(broadcast(cents))
      .withColumn("sim", cosineSim(col("embedding"), col("centroid")))
    TopK.perGroup(scored, groupKeys = Seq("vec_id"),
        order = Seq(col("sim").desc, col("centroid_id").asc), k = 1)
      .select(col("centroid_id"), col("vec_id"), col("label"), col("embedding"))
  }

  /** Coarse quantizer: deterministic seeds (first `nClusters` vectors)
    * refined with `iters` Lloyd steps (assign → per-dimension mean). */
  def centroids(embeddings: DataFrame, nClusters: Int = 16, iters: Int = 2): DataFrame = {
    var cents = embeddings.orderBy(col("vec_id")).limit(nClusters)
      .select(col("vec_id").cast("int").as("centroid_id"),
        col("embedding").as("centroid"))
    for (_ <- 1 to iters) {
      cents = assign(embeddings, cents)
        .select(col("centroid_id"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(avg(col("v")).as("m"))
        .groupBy(col("centroid_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m").cast("float")).as("centroid"))
    }
    cents
  }

  /** Probe the inverted lists: each probe scores only the lists of
    * its `nprobe` nearest centroids — the IVF search tail, shared by
    * the train-and-search path ([[ivfTopK]]) and the index-maintenance
    * path ([[ivfUpsertTopK]]). */
  def searchLists(inverted: DataFrame, probeSource: DataFrame, cents: DataFrame,
                  nProbes: Int, k: Int, nprobe: Int): DataFrame = {
    val probes = probeSource.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"))
    val probeLists = TopK.perGroup(
        probes.crossJoin(broadcast(cents))
          .withColumn("sim", cosineSim(col("probe_emb"), col("centroid"))),
        groupKeys = Seq("probe_id"),
        order = Seq(col("sim").desc, col("centroid_id").asc), k = nprobe)
      .select(col("probe_id"), col("probe_emb"), col("centroid_id"))
    val cand = inverted.join(broadcast(probeLists), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cosine", graft.ops.ConditionalAgg.roundPortable(
        cosineSim(col("embedding"), col("probe_emb")), 6))
    TopK.perGroup(
        cand.select(col("probe_id"), col("vec_id"), col("label"), col("cosine")),
        groupKeys = Seq("probe_id"),
        order = Seq(col("cosine").desc, col("vec_id").asc), k = k)
      .orderBy(col("probe_id"), col("rank"))
  }

  /** IVF top-k: each probe scores only the inverted lists of its
    * `nprobe` nearest centroids. */
  def ivfTopK(embeddings: DataFrame, nProbes: Int = 10, k: Int = 5,
              nClusters: Int = 16, nprobe: Int = 4,
              centsOpt: Option[DataFrame] = None): DataFrame = {
    // pin the fallback: k-means is float-fold sensitive and the cents
    // feed BOTH the inverted-list and probe-list branches — without a
    // checkpoint the two evaluations could disagree on a borderline
    // vector's list (the SemDedup.candidatePairs contract)
    val cents = centsOpt.getOrElse(
      centroids(embeddings, nClusters).localCheckpoint())
    searchLists(assign(embeddings, cents), embeddings, cents, nProbes, k, nprobe)
  }

  def ivfTopKQuery(s: SparkSession, dir: String): DataFrame =
    ivfTopK(Tables.embeddings(s, dir))

  /** INCREMENTAL index maintenance — the ANN counterpart of
    * `NearDup.incrementalMinhashDedup`: the persisted index state
    * (centroids + inverted lists, trained BEFORE the arrivals) absorbs
    * a new embedding batch by assigning ONLY the batch against the
    * broadcast centroid table and appending to the lists. No retrain,
    * and the corpus-sized side is never rescanned — at 100 TB the
    * update cost is linear in the BATCH (×·k centroid scores), which
    * is what makes nightly index refresh affordable; periodic full
    * retrain (drifted centroids) is a separate offline job, exactly
    * as in production IVF serving stacks.
    *
    * The arriving batch is the deterministic vec_id % 10 == 7 slice;
    * the index is trained on the remaining 90 %. Because the search
    * tail is [[searchLists]] over the appended lists, the query result
    * is IDENTICAL to rebuilding the whole index with the same
    * quantizer (spec-pinned in DedupSimSpec) — assignment is
    * per-vector, so append ≡ rebuild given fixed centroids. */
  def ivfUpsertTopK(embeddings: DataFrame, nProbes: Int = 10, k: Int = 5,
                    nClusters: Int = 16, nprobe: Int = 4): DataFrame = {
    val corpus = embeddings.filter(pmod(col("vec_id"), lit(10)) =!= 7)
    val batch = embeddings.filter(pmod(col("vec_id"), lit(10)) === 7)
    // persisted pre-arrival state: quantizer trained on the corpus only
    val cents = centroids(corpus, nClusters).localCheckpoint()
    val updated = assign(corpus, cents).unionByName(assign(batch, cents))
    searchLists(updated, embeddings, cents, nProbes, k, nprobe)
  }

  def ivfUpsertTopKQuery(s: SparkSession, dir: String): DataFrame =
    ivfUpsertTopK(Tables.embeddings(s, dir))
}
