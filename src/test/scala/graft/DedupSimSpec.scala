package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.NearDup
import graft.sim.EmbeddingSim
import graft.sources.Tables

class DedupSimSpec extends AnyFunSuite {
  import TestSession._

  // docs/embs come cached from TestSession (shared across suites)

  private lazy val jacPairs = NearDup.jaccardPairs(docs).cache()
  private lazy val bruteSel = EmbeddingSim.bruteForceTopK(embs, nProbes = 5, k = 3)
    .select("probe_id", "vec_id").cache()

  test("exact groups partition the corpus") {
    val g = NearDup.exactGroups(docs)
    assert(g.agg(sum("doc_count")).first().getLong(0) === docs.count())
  }

  test("jaccard pairs are symmetric-canonical and above threshold") {
    val p = jacPairs
    assert(p.filter(col("doc_a") >= col("doc_b")).count() === 0)
    assert(p.filter(col("jaccard") < 0.8 || col("jaccard") > 1.0).count() === 0)
    assert(p.filter(col("intersection") > col("size_a") ||
      col("intersection") > col("size_b")).count() === 0)
  }

  test("minhash LSH candidates recover the exact-jaccard pairs (recall)") {
    val exact = NearDup.jaccardPairs(docs).select("doc_a", "doc_b")
    val lsh = NearDup.minhashPairs(docs).select("doc_a", "doc_b")
    val nExact = exact.count()
    val recovered = lsh.join(exact, Seq("doc_a", "doc_b"), "left_semi").count()
    // LSH output is defined as a subset of the exact pairs (verified);
    // on the planted near-identical dups recall should be total.
    assert(lsh.count() === recovered)
    assert(nExact === 0 || recovered.toDouble / nExact >= 0.9,
      s"recall $recovered/$nExact")
  }

  test("incremental minhash dedup: batch-only flags, correct orientation, exact scores") {
    val hist = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val inc = NearDup.incrementalMinhashDedup(hist, batch).cache()
    // only batch docs are ever flagged
    assert(inc.join(batch.select("doc_id"), Seq("doc_id"), "left_anti").count() === 0)
    // corpus rows point at history docs; batch rows at EARLIER batch docs
    assert(inc.filter(col("src") === "corpus")
      .join(hist.select(col("doc_id").as("dup_of")), Seq("dup_of"), "left_anti")
      .count() === 0)
    assert(inc.filter(col("src") === "batch" && col("dup_of") >= col("doc_id"))
      .count() === 0)
    // every claimed score is a real >= threshold Jaccard
    assert(inc.filter(col("jaccard") < 0.8 || col("jaccard") > 1.0).count() === 0)
    // parity with the full-corpus pass: every within-batch incremental
    // pair appears in minhashPairs over the batch alone
    val full = NearDup.minhashPairs(batch).select(
      col("doc_b").as("doc_id"), col("doc_a").as("dup_of"))
    assert(inc.filter(col("src") === "batch").select("doc_id", "dup_of")
      .join(full, Seq("doc_id", "dup_of"), "left_anti").count() === 0)
  }

  test("duplicate clustering: min-label components across chained pairs") {
    import spark.implicits._
    // chain 1-2-3-4-5-6 (diameter 5) + isolated pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val got = NearDup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 1L,
      10L -> 10L, 11L -> 10L))
    // keep-list: exactly one kept doc per component
    val kept = NearDup.duplicateClusters(pairs)
      .filter(col("is_kept")).count()
    assert(kept === 2)
    // pointer doubling: a 120-node chain (diameter 119) must converge
    // well inside the round cap (O(log d) rounds)
    val chain = (1 until 120).map(i => (i.toLong, (i + 1).toLong)).toDF("doc_a", "doc_b")
    val labels = NearDup.duplicateClusters(chain)
    assert(labels.filter(col("cluster_rep") =!= 1L).count() === 0)
    assert(labels.count() === 120)
  }

  test("hot-bucket cap bounds pair generation on a degenerate corpus") {
    import spark.implicits._
    // 200 near-identical docs: every band bucket collapses to one hash
    val degenerate = (1 to 200)
      .map(i => (i.toLong, s"the quick brown fox jumps over the lazy dog $i"))
      .toDF("doc_id", "text")
    // tiny cap: pair generation must stay ~sum of per-salt C(cap', 2),
    // far below the uncapped C(200,2)=19900 per band
    val capped = NearDup.minhashPairs(degenerate, threshold = 0.0, bucketCap = 10)
    val nPairs = capped.count()
    assert(nPairs > 0, "salt split must keep intra-bucket pairs")
    assert(nPairs < 4000, s"cap failed to bound pair explosion: $nPairs")
    // and with the default cap the query is unaffected on real data
    val dflt = NearDup.minhashPairs(docs).select("doc_a", "doc_b")
    val exact = NearDup.jaccardPairs(docs).select("doc_a", "doc_b")
    assert(dflt.join(exact, Seq("doc_a", "doc_b"), "left_anti").count() === 0)
  }

  test("shingle df-cap bounds exact-Jaccard candidate generation on a stop-phrase corpus") {
    import spark.implicits._
    // 60 docs share an 8-token stop phrase (every stop shingle df=60);
    // tails are unique (df=1). Plus one true duplicate pair whose
    // shingles have df=2 — well under any sane cap.
    val stop = "please read these terms and conditions very carefully"
    val corpus = ((1 to 60)
      .map(i => (i.toLong, s"$stop unique$i tail$i token$i")) ++
      Seq((100L, "identical duplicated content appears twice here"),
          (101L, "identical duplicated content appears twice here")))
      .toDF("doc_id", "text")
    val sets = NearDup.shingleSets(corpus).cache()
    // uncapped: the hot shingles alone emit C(60,2)=1770 candidates
    assert(NearDup.candidatePairs(sets, 1000).count() === 1770 + 1)
    // capped at 10: the stop-phrase pairs vanish, the real dup survives
    val capped = NearDup.candidatePairs(sets, 10)
    assert(capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((100L, 101L)))
    // end-to-end: exact Jaccard of the surviving pair is exact (1.0)
    val pairs = NearDup.jaccardPairs(corpus, threshold = 0.8, maxShingleDf = 10).collect()
    assert(pairs.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSeq === Seq((100L, 101L)))
    assert(pairs.head.getAs[Double]("jaccard") === 1.0)
  }

  test("simhash pairs respect the hamming bound") {
    val p = NearDup.simhashPairs(docs)
    assert(p.filter(col("hamming") > 3 || col("hamming") < 0).count() === 0)
  }

  test("brute-force topk: k rows per probe, cosine in [-1,1], ranked desc") {
    val t = EmbeddingSim.bruteForceTopK(embs, nProbes = 5, k = 3).cache()
    val perProbe = t.groupBy("probe_id").count()
    assert(perProbe.filter(col("count") =!= 3).count() === 0)
    assert(t.filter(col("cosine") < -1.0 || col("cosine") > 1.0).count() === 0)
    // rank 1 cosine >= rank k cosine within each probe
    val r1 = t.filter(col("rank") === 1).select(col("probe_id"), col("cosine").as("c1"))
    val rk = t.filter(col("rank") === 3).select(col("probe_id"), col("cosine").as("ck"))
    assert(r1.join(rk, "probe_id").filter(col("c1") < col("ck")).count() === 0)
  }

  test("IVF topk: recall vs brute force, k rows per probe, dominated by exact") {
    import graft.sim.IvfAnn
    val brute = bruteSel
    val ivf = IvfAnn.ivfTopK(embs, nProbes = 5, k = 3).cache()
    assert(ivf.groupBy("probe_id").count().filter(col("count") > 3).count() === 0)
    val recovered = ivf.select("probe_id", "vec_id")
      .join(brute, Seq("probe_id", "vec_id"), "left_semi").count()
    val recall = recovered.toDouble / brute.count()
    assert(recall >= 0.7, s"IVF recall $recall too low for nprobe=4/16 (measured 0.88+)")
    // no candidate may beat the exact baseline's best
    val bestExact = EmbeddingSim.bruteForceTopK(embs, nProbes = 5, k = 1)
      .select(col("probe_id"), col("cosine").as("c_exact"))
    assert(ivf.filter(col("rank") === 1).join(bestExact, "probe_id")
      .filter(col("cosine") > col("c_exact")).count() === 0)
    // classic IVF trade: widening the probe set can only help recall
    def recallAt(nprobe: Int): Double = {
      val r = IvfAnn.ivfTopK(embs, nProbes = 5, k = 3, nprobe = nprobe)
        .select("probe_id", "vec_id")
        .join(brute, Seq("probe_id", "vec_id"), "left_semi").count()
      r.toDouble / brute.count()
    }
    assert(recallAt(8) >= recallAt(2), "recall must be monotone in nprobe")
  }

  test("IVF upsert: incremental append ≡ full rebuild under the same quantizer") {
    import graft.sim.IvfAnn
    // the maintenance path: quantizer trained on the pre-arrival corpus,
    // batch assigned incrementally and appended to the lists
    val upsert = IvfAnn.ivfUpsertTopK(embs, nProbes = 5, k = 3).cache()
    // rebuild path: same (corpus-trained) centroids, whole table re-assigned
    val corpus = embs.filter(pmod(col("vec_id"), lit(10)) =!= 7)
    val cents = IvfAnn.centroids(corpus, 16).localCheckpoint()
    val rebuild = IvfAnn.ivfTopK(embs, nProbes = 5, k = 3, centsOpt = Some(cents))
    // assignment is per-vector given fixed centroids, so append ≡ rebuild
    assert(upsert.except(rebuild).count() === 0)
    assert(rebuild.except(upsert).count() === 0)
    // the updated index actually serves arrivals: batch rows are indexed
    val batchListed = IvfAnn.assign(
      embs.filter(pmod(col("vec_id"), lit(10)) === 7), cents)
    assert(batchListed.count() ===
      embs.filter(pmod(col("vec_id"), lit(10)) === 7).count())
    // recall vs exact stays useful with a 90%-trained quantizer
    val recovered = upsert.select("probe_id", "vec_id")
      .join(bruteSel, Seq("probe_id", "vec_id"), "left_semi").count()
    val recall = recovered.toDouble / bruteSel.count()
    assert(recall >= 0.6, s"IVF-upsert recall $recall below floor 0.60")
  }

  test("SQ8: codes bounded, round-trip error bounded, high recall after refine") {
    import graft.sim.ScalarQuantAnn
    val (lo, hi) = ScalarQuantAnn.trainBounds(embs)
    assert(lo.size === EmbeddingSim.Dim && hi.size === EmbeddingSim.Dim)
    assert(lo.zip(hi).forall { case (l, h) => l <= h })
    // codes integral in [0,255]; dequantized values inside trained bounds
    val coded = embs.select(col("vec_id"),
      ScalarQuantAnn.quantize(col("embedding"), lo, hi).as("code"))
    assert(coded.filter(exists(col("code"), c => c < 0 || c > 255)).isEmpty)
    // max reconstruction error per dim is half a quantization step
    val err = embs
      .select(zip_with(col("embedding"),
        ScalarQuantAnn.dequantize(
          ScalarQuantAnn.quantize(col("embedding"), lo, hi), lo, hi),
        (x, y) => abs(x.cast("double") - y.cast("double"))).as("errs"))
      .select(array_max(col("errs")).as("e"))
      .agg(max(col("e"))).first().getDouble(0)
    val maxStep = lo.zip(hi).map { case (l, h) => (h - l) / 255.0 }.max
    assert(err <= maxStep / 2 + 1e-6, s"reconstruction error $err > half-step")
    // refined SQ8 search recovers nearly all of the exact top-k
    val brute = bruteSel
    val sq8 = ScalarQuantAnn.sq8TopK(embs, nProbes = 5, k = 3)
    val recovered = sq8.select("probe_id", "vec_id")
      .join(brute, Seq("probe_id", "vec_id"), "left_semi").count()
    val recall = recovered.toDouble / brute.count()
    assert(recall >= 0.85, s"SQ8 recall $recall too low for refine=4")
  }

  test("PQ: codebook shape, reconstruction in-span, recall after refine, sample-bound training") {
    import graft.sim.ProductQuantAnn
    val books = ProductQuantAnn.trainCodebooks(embs)
    assert(books.size === ProductQuantAnn.M)
    assert(books.forall(_.size === ProductQuantAnn.K))
    assert(books.forall(_.forall(_.size === ProductQuantAnn.SubDim)))
    // reconstruction emits full-width float vectors whose every value
    // is one of the trained centroid values (codebook membership)
    val recon = ProductQuantAnn.reconstruct(embs, books).cache()
    assert(recon.filter(size(col("approx_emb")) =!= ProductQuantAnn.Dim).count() === 0)
    val allCentroidVals = books.flatten.flatten.map(_.toFloat).toSet
    val reconVals = recon.select(explode(col("approx_emb")).as("v"))
      .distinct().collect().map(_.getFloat(0)).toSet
    assert(reconVals.subsetOf(allCentroidVals),
      s"${(reconVals -- allCentroidVals).size} reconstructed values outside the codebooks")
    // refined PQ search recovers most of the exact top-k, and is
    // dominated by it (exact re-rank can't beat the exact best)
    val brute = bruteSel
    val pq = ProductQuantAnn.pqTopK(embs, nProbes = 5, k = 3).cache()
    assert(pq.groupBy("probe_id").count().filter(col("count") > 3).count() === 0)
    val recall = pq.select("probe_id", "vec_id")
      .join(brute, Seq("probe_id", "vec_id"), "left_semi").count().toDouble / brute.count()
    assert(recall >= 0.7, s"PQ recall $recall too low for 16x16 books with refine=16")
    val bestExact = EmbeddingSim.bruteForceTopK(embs, nProbes = 5, k = 1)
      .select(col("probe_id"), col("cosine").as("c_exact"))
    assert(pq.filter(col("rank") === 1).join(bestExact, "probe_id")
      .filter(col("cosine") > col("c_exact")).count() === 0)
    // training is sample-bound: a coarser sample still yields valid books
    val sparse = ProductQuantAnn.trainCodebooks(embs, trainSampleMod = 8)
    assert(sparse.size === ProductQuantAnn.M &&
      sparse.forall(_.size === ProductQuantAnn.K))
  }

  test("IVF-PQ: k rows per probe, dominated by exact, candidates only from probed lists") {
    import graft.sim.{IvfAnn, IvfPqAnn}
    val brute = bruteSel
    val cents = IvfAnn.centroids(embs, 16).localCheckpoint()
    val ivfpq = IvfPqAnn.ivfPqTopK(embs, nProbes = 5, k = 3,
      centsOpt = Some(cents)).cache()
    assert(ivfpq.groupBy("probe_id").count().filter(col("count") > 3).count() === 0)
    // recall floor: list-prune ceiling is IVF's; re-rank is exact
    val recall = ivfpq.select("probe_id", "vec_id")
      .join(brute, Seq("probe_id", "vec_id"), "left_semi").count().toDouble / brute.count()
    assert(recall >= 0.7, s"IVF-PQ recall $recall below the nprobe=4/16 floor (measured 0.88+)")
    // exact domination: rank-1 can't beat the exact best
    val bestExact = EmbeddingSim.bruteForceTopK(embs, nProbes = 5, k = 1)
      .select(col("probe_id"), col("cosine").as("c_exact"))
    assert(ivfpq.filter(col("rank") === 1).join(bestExact, "probe_id")
      .filter(col("cosine") > col("c_exact")).count() === 0)
    // the IVF prune is real: every returned candidate sits in one of
    // its probe's nprobe=4 nearest inverted lists (same pinned cents)
    val lists = graft.ops.TopK.perGroup(
        embs.filter(col("vec_id") < 5)
          .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"))
          .crossJoin(broadcast(cents))
          .withColumn("sim", org.apache.spark.sql.graftext.CosineSimilarity
            .cosineSim(col("probe_emb"), col("centroid"))),
        groupKeys = Seq("probe_id"),
        order = Seq(col("sim").desc, col("centroid_id").asc), k = 4)
      .select(col("probe_id"), col("centroid_id"))
    val assigned = IvfAnn.assign(embs, cents).select("centroid_id", "vec_id")
    val offList = ivfpq.select("probe_id", "vec_id")
      .join(assigned, "vec_id")
      .join(lists, Seq("probe_id", "centroid_id"), "left_anti")
    assert(offList.count() === 0, "IVF-PQ returned a vector outside its probed lists")
  }

  test("recall report: every ANN method clears its floor at spec scale (the oracle surface)") {
    // the driver's oracle pins (method, floor, true) — prove the same
    // pass/fail surface holds here so a floor regression fails in sbt
    // before it turns the CORRECTNESS row red
    val report = EmbeddingSim.recallReport(spark, sf).cache()
    assert(report.count() === EmbeddingSim.annFloors.size)
    val failing = report.filter(!col("meets_floor")).collect()
    assert(failing.isEmpty,
      s"methods below floor: ${failing.map(_.getString(0)).mkString(",")}")
  }

  test("LSH topk is dominated by brute-force topk (no better-than-exact)") {
    val brute = EmbeddingSim.bruteForceTopK(embs, nProbes = 5, k = 3)
      .groupBy("probe_id").agg(min("cosine").as("worst_exact"))
    val lsh = EmbeddingSim.lshTopK(embs, nProbes = 5, k = 3)
      .groupBy("probe_id").agg(max("cosine").as("best_lsh"))
    val brute1 = EmbeddingSim.bruteForceTopK(embs, nProbes = 5, k = 1)
      .select(col("probe_id"), col("cosine").as("best_exact"))
    assert(lsh.join(brute1, "probe_id").filter(col("best_lsh") > col("best_exact")).count() === 0)
  }

  test("embedding neardup pairs canonical and ranked") {
    val p = EmbeddingSim.nearDupPairs(embs, topPairs = 10).collect()
    assert(p.length <= 10 && p.nonEmpty)
    assert(p.forall(r => r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b")))
    val cosines = p.map(_.getAs[Double]("cosine"))
    assert(cosines.sameElements(cosines.sortBy(-_)))
  }

  test("crossmodal agreement: one row per text pair with embeddings, flag matches tau") {
    import graft.sim.SemDedup
    val pairs = jacPairs
    val n = embs.count()
    val expected = pairs.filter(col("doc_a") < n && col("doc_b") < n).count()
    val rep = SemDedup.crossModalAgreement(pairs, embs).cache()
    assert(rep.count() === expected)
    assert(rep.filter(col("cosine") < -1 || col("cosine") > 1).count() === 0)
    assert(rep.filter(col("modalities_agree") =!= (col("cosine") >= 0.4)).count() === 0)
  }

  test("incremental dedup: batch dedupes within itself then against history") {
    import spark.implicits._
    val hist = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha  beta"),   // dup of history (whitespace-normalized)
      (11L, "epsilon zeta"),  // new
      (12L, "epsilon zeta"),  // in-batch dup of 11
      (13L, "eta theta"))     // new
      .toDF("doc_id", "text")
    val out = NearDup.incrementalDedup(hist, batch)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === Map(11L -> 2L, 13L -> 1L))
  }

  test("decontamination: bloom-pruned train stream is exactly the unpruned join") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val pruned = NearDup.decontamination(docs)
    val plain = NearDup.decontamination(docs, bloomFpp = None)
    assert(pruned.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(pruned).count() === 0)
  }

  test("incremental dedup: bloom-pruned index path is exactly the unpruned path") {
    // the bloom pre-filter may keep extra index rows (fp) but never
    // drop a matching one, so the anti-join output must be identical —
    // asserted on the real corpus split, not a toy
    val docs = graft.sources.Tables.documents(spark, sf)
    val hist = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val pruned = NearDup.incrementalDedup(hist, batch)
    val plain = NearDup.incrementalDedup(hist, batch, bloomFpp = None)
    assert(pruned.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(pruned).count() === 0)
  }

  test("semdedup: exact-duplicate vectors are dropped, one survivor each") {
    import spark.implicits._
    import graft.sim.SemDedup
    // two identical pairs ((1,2) and (3,4)) plus orthogonal singletons;
    // identical vectors always co-cluster (same argmax centroid, same
    // tie-break), so both pairs MUST be caught regardless of k-means
    val vecs = Seq(
      1L -> Seq(1f, 0f, 0f, 0f), 2L -> Seq(1f, 0f, 0f, 0f),
      3L -> Seq(0f, 1f, 0f, 0f), 4L -> Seq(0f, 1f, 0f, 0f),
      5L -> Seq(0f, 0f, 1f, 0f), 6L -> Seq(0f, 0f, 0f, 1f),
      7L -> Seq(0.7f, 0.7f, 0.1f, 0f))
      .toDF("vec_id", "embedding").withColumn("label", lit(0))
    val drops = SemDedup.drops(vecs, nClusters = 4, tau = 0.99)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // drop rule: equal centroid similarity -> the HIGHER vec_id goes
    assert(drops.keySet === Set(2L, 4L))
    assert(drops(2L) === 1L && drops(4L) === 3L)
  }

  test("semdedup: candidate pairs subset of exact tau-pairs; recall floors on testdata") {
    import graft.sim.SemDedup
    val rep = SemDedup.semDedupReportWith(spark, embs,
        SemDedup.candidatePairs(embs), EmbeddingSim.nearDupPairs(embs))
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(rep === Map(
      "lsh_neardup_top_recall" -> true,
      "semdedup_drops_nonempty" -> true,
      "semdedup_pair_recall" -> true,
      "semdedup_pairs_subset_exact" -> true))
  }

  test("semdedup: oversized clusters are salt-split (bounded pair generation)") {
    import spark.implicits._
    import graft.sim.SemDedup
    // 60 near-identical vectors in ONE cluster with clusterCap=10:
    // uncapped would give C(60,2)=1770 pairs; split into ceil(60/10)=6
    // salt buckets the count is bounded by 6 * C(~10,2) ≈ 330
    val vecs = (1L to 60L).map(i => i -> Seq(1f, 0.001f * i, 0f, 0f))
      .toDF("vec_id", "embedding").withColumn("label", lit(0))
    val n = SemDedup.candidatePairs(vecs, nClusters = 2, tau = 0.9, clusterCap = 10).count()
    assert(n > 0 && n <= 400, s"expected salt-bounded pair count, got $n")
  }
}
