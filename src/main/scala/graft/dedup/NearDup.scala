package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.text.TextAnalysis

/** Document deduplication operators for training-data curation
  * (north-star scope, SURVEY §7.5 (a)): exact, n-gram Jaccard,
  * MinHash+LSH, and SimHash near-dup detection — all expressed with
  * DataFrame built-ins (no UDFs): higher-order array functions build
  * shingles/signatures per row (codegen'd, shuffle-free), then the
  * candidate generation is a hash shuffle on shingle / band keys.
  *
  * Scale shape (the LSH point): exact-Jaccard all-pairs is O(n²);
  * MinHash banding turns it into "explode to n×bands rows, hash
  * shuffle, join within buckets" — linear in corpus size with
  * per-bucket quadratic only on collisions, which is the standard
  * 100 TB dedup architecture (the reference has only the W1 exact
  * path, silver_ecommerce_events.sql:111-123).
  */
object NearDup {

  // ---------------------------------------------------------------- exact

  /** THE normalized-text fingerprint — the single definition every
    * exact-dedup surface shares (exactGroups, incrementalDedup, the
    * streaming index, TextAnalysis.docStats): batch/streaming parity
    * and the DuckDB oracles all assume this expression stays
    * byte-identical across call sites. */
  private[graft] def fingerprintCol(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** Exact dedup over normalized-text fingerprints: one row per
    * distinct fingerprint with the min-doc_id representative (the
    * deterministic survivor rule). */
  def exactGroups(documents: DataFrame): DataFrame =
    documents
      .withColumn("fingerprint", fingerprintCol(col("text")))
      .groupBy(col("fingerprint"))
      .agg(min(col("doc_id")).as("rep_doc_id"),
           count(lit(1)).as("doc_count"))
      .orderBy(col("rep_doc_id"))

  def exactGroupsQuery(s: SparkSession, dir: String): DataFrame =
    exactGroups(Tables.documents(s, dir))

  val exactGroupsSql: String =
    """SELECT
      |  md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fingerprint,
      |  min(doc_id) AS rep_doc_id,
      |  count(*) AS doc_count
      |FROM documents
      |GROUP BY fingerprint
      |ORDER BY rep_doc_id""".stripMargin

  /** Incremental exact dedup — dedupe an arriving batch against the
    * already-ingested corpus WITHOUT rescanning corpus text: the
    * history side reduces to its distinct fingerprint set (the running
    * dedup INDEX a 100 TB pipeline maintains between deliveries), the
    * batch first dedupes within itself (min doc_id per fingerprint,
    * counting suppressed copies), then anti-joins the index. Two hash
    * aggregations + one anti join, all keyed on the 32-char
    * fingerprint — text never moves twice.
    *
    * With `bloomFpp` set (the default), the index scan is additionally
    * pruned by a Bloom filter of the BATCH keys before the
    * distinct/anti-join shuffles — the "bloom pre-filter in front of
    * the index" a 100 TB pipeline runs, since the index is
    * corpus-sized while a delivery is not. The result stays EXACT for
    * any fpp: a false positive only retains an index row that then
    * matches nothing, and false negatives are impossible, so no true
    * duplicate can slip through ([[graft.ops.BloomJoin]]; parity with
    * the unpruned form is spec-asserted). */
  def incrementalDedup(history: DataFrame, newBatch: DataFrame,
                       bloomFpp: Option[Double] = Some(0.01)): DataFrame = {
    def fp(df: DataFrame) = df.withColumn("fingerprint", fingerprintCol(col("text")))
    val batch0 = fp(newBatch)
      .groupBy(col("fingerprint"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("batch_copies"))
    val index = fp(history).select("fingerprint")
    val (batch, seen) = bloomFpp match {
      case Some(fpp) =>
        // materialize the (small) batch aggregate once: the bloom
        // build sizes + sketches it, then the anti-join probes it
        val b = batch0.localCheckpoint()
        (b, graft.ops.BloomJoin.prune(
          index, col("fingerprint"), b, col("fingerprint"), fpp).distinct())
      case None => (batch0, index.distinct())
    }
    batch.join(seen, Seq("fingerprint"), "left_anti")
      .select("doc_id", "fingerprint", "batch_copies")
      .orderBy(col("doc_id"))
  }

  /** Driver query: the corpus split into an 80% "already ingested"
    * history and a 20% arriving batch by doc_id mod 5 (deterministic,
    * engine-portable). */
  def incrementalDedupQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    incrementalDedup(
      docs.filter(pmod(col("doc_id"), lit(5)) =!= 0),
      docs.filter(pmod(col("doc_id"), lit(5)) === 0))
  }

  val incrementalDedupSql: String =
    """WITH fp AS (
      |  SELECT doc_id,
      |    md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fingerprint
      |  FROM documents
      |), hist AS (
      |  SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 5 <> 0
      |), batch AS (
      |  SELECT fingerprint, min(doc_id) AS doc_id, count(*) AS batch_copies
      |  FROM fp WHERE doc_id % 5 = 0 GROUP BY fingerprint
      |)
      |SELECT doc_id, fingerprint, batch_copies FROM batch b
      |WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.fingerprint = b.fingerprint)
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------- shingling

  /** Distinct word k-shingles per document: (doc_id, shingle).
    * Built with sequence+transform (codegen'd); empty for docs with
    * fewer than k tokens. */
  def shingles(documents: DataFrame, k: Int = 3): DataFrame = {
    val toks = TextAnalysis.tokensCol(col("text"))
    // r18 (guide §4): native ShinglesOf — one compiled window walk per
    // row instead of an interpreted transform building |doc| concat_ws
    // trees (short-token and null-text rows still explode to nothing;
    // bit-identity incl. first-occurrence dedup order pinned in
    // VectorCodecSpec)
    documents
      .withColumn("__toks", toks)
      .withColumn("shingle", explode(
        org.apache.spark.sql.graftext.VectorCodec.shinglesOf(col("__toks"), k)))
      .select(col("doc_id"), col("shingle"))
  }

  /** DuckDB equivalent of [[shingles]] as a CTE body (k=3). */
  private val shinglesCte: String =
    """sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |      generate_series(1, len(toks) - 2),
      |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS shingle
      |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      |        FROM documents)
      |  WHERE len(toks) >= 3
      |)""".stripMargin

  // --------------------------------------------------- n-gram Jaccard

  /** Shared-shingle candidate pairs with a document-frequency cap.
    * Shingles held by more than `maxDf` docs are stop-phrases: a
    * shingle shared by k docs emits k² join rows, so ONE hot 3-gram
    * ("terms and conditions") makes the uncapped self-join quadratic
    * in corpus size — the plan that dies first at 100 TB. Dropping
    * them from candidate generation bounds the join at maxDf² rows
    * per shingle while `df >= 2` prunes the (majority) singleton
    * shingles that cannot form a pair at all.
    *
    * Exactness contract: Jaccard values of surviving pairs are later
    * computed over the FULL sets (hot shingles included), so they are
    * exact; only a pair whose shared shingles are ALL hotter than
    * `maxDf` is missed — by then the docs belong to a >maxDf-member
    * boilerplate family, which is [[minhashPairs]]'s job (its
    * `bucketCap` salt-split keeps those families connected). The
    * DuckDB oracle in [[jaccardPairsSql]] mirrors the cap. */
  /** Candidate pairs surviving a LOSSLESS Jaccard upper-bound prune.
    *
    * The shared-shingle self-join yields ~1M raw candidates per 5k
    * docs; hauling both docs' shingle arrays to every candidate for
    * exact scoring is the dominant dedup cost. Instead the join rows
    * aggregate to a per-pair CAPPED intersection count `i_capped`
    * (narrow rows, map-side combined), and each doc carries a profile
    * (set size, hot-shingle count). Since the true intersection obeys
    * `i_capped ≤ I ≤ i_capped + min(hot_a, hot_b)` and Jaccard is
    * increasing in I, `J ≤ jaccard(i_max)` — and rounding is monotone,
    * so dropping pairs with `round(jaccard(i_max)) < threshold` can
    * never drop a reported pair. Exact array scoring then runs on the
    * survivors only (hundreds, not millions). The DuckDB oracle needs
    * no mirror of the prune — it is semantically a no-op. */
  private[graft] def prunedCandidates(sets: DataFrame, maxDf: Long,
                                      threshold: Double): DataFrame = {
    val sh = sets.select(col("doc_id"), explode(col("sh_set")).as("shingle"))
    // df frame feeds both the rare slice and the hot profile; the rare
    // occurrence slice is materialized because the self-join below
    // evaluates its child twice
    val dfreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .localCheckpoint()
    val rare = sh
      .join(dfreq.filter(col("df") >= 2 && col("df") <= maxDf).select("shingle"), "shingle")
      .localCheckpoint()
    val counted = rare.as("a").join(rare.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("i_capped"))
    val hot = sh
      .join(dfreq.filter(col("df") > maxDf).select("shingle"), "shingle")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hot"))
    val prof = sets.select(col("doc_id"), size(col("sh_set")).cast("long").as("set_size"))
      .join(hot, Seq("doc_id"), "left")
      .withColumn("n_hot", coalesce(col("n_hot"), lit(0L)))
    // prof is |docs|-sized: no broadcast hint — locally AQE broadcasts
    // it from stats, at cluster scale it hash-joins on the pair keys
    counted
      .join(prof.select(col("doc_id").as("doc_a"),
        col("set_size").as("sa"), col("n_hot").as("ha")), "doc_a")
      .join(prof.select(col("doc_id").as("doc_b"),
        col("set_size").as("sb"), col("n_hot").as("hb")), "doc_b")
      .withColumn("i_max", col("i_capped") + least(col("ha"), col("hb")))
      .filter(graft.ops.ConditionalAgg.roundPortable(col("i_max").cast("double") /
        (col("sa") + col("sb") - col("i_max")).cast("double"), 4) >= threshold)
      .select("doc_a", "doc_b")
  }

  /** All df-capped shared-shingle candidate pairs (no threshold
    * prune) — the raw candidate surface, property-tested against
    * stop-phrase corpora. */
  private[graft] def candidatePairs(sets: DataFrame, maxDf: Long): DataFrame =
    prunedCandidates(sets, maxDf, threshold = 0.0)

  /** Exact-Jaccard verification of candidate pairs: join each pair to
    * its two (sorted, distinct) shingle-set arrays and score with
    * `array_intersect` — narrow per-row work on |candidates| rows, the
    * shared tail of [[jaccardPairs]] and [[minhashPairs]]. */
  private[graft] def verifiedJaccard(cand: DataFrame, sets: DataFrame,
                                     threshold: Double): DataFrame =
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("sh_set").as("set_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh_set").as("set_b")), "doc_b")
      .withColumn("intersection", size(array_intersect(col("set_a"), col("set_b"))).cast("long"))
      .withColumn("size_a", size(col("set_a")).cast("long"))
      .withColumn("size_b", size(col("set_b")).cast("long"))
      .withColumn("jaccard",
        graft.ops.ConditionalAgg.roundPortable(col("intersection").cast("double") /
          (col("size_a") + col("size_b") - col("intersection")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "intersection", "size_a", "size_b", "jaccard")
      .orderBy(col("doc_a"), col("doc_b"))

  /** Exact pairwise Jaccard over 3-gram shingle sets, for pairs above
    * `threshold`. Candidate pairs come from a df-capped self-join on
    * shared shingles ([[candidatePairs]]); scores are computed over
    * the full sets, so every reported pair's Jaccard is exact. */
  def jaccardPairs(documents: DataFrame, threshold: Double = 0.8,
                   maxShingleDf: Long = 1000): DataFrame = {
    // ONE shingling pass: the set frame feeds candidate generation AND
    // both verification joins — materialize it (per-doc rows, the
    // standard staged-signatures shape of large-scale dedup) instead
    // of betting on exchange reuse across five consumers
    val sets = shingleSets(documents).localCheckpoint()
    verifiedJaccard(prunedCandidates(sets, maxShingleDf, threshold), sets, threshold)
  }

  def jaccardPairsQuery(s: SparkSession, dir: String): DataFrame =
    jaccardPairs(Tables.documents(s, dir))

  /** Mirrors [[jaccardPairs]] incl. the df cap (BETWEEN 2 AND 1000)
    * and full-set `list_intersect` scoring. */
  val jaccardPairsSql: String =
    s"""WITH $shinglesCte,
       |sets AS (SELECT doc_id, list(shingle) AS sh_set FROM sh GROUP BY doc_id),
       |keep AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) BETWEEN 2 AND 1000),
       |rare AS (SELECT s.doc_id, s.shingle FROM sh s JOIN keep k ON s.shingle = k.shingle),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |),
       |scored AS (
       |  SELECT doc_a, doc_b,
       |    CAST(len(list_intersect(sa.sh_set, sb.sh_set)) AS BIGINT) AS intersection,
       |    CAST(len(sa.sh_set) AS BIGINT) AS size_a,
       |    CAST(len(sb.sh_set) AS BIGINT) AS size_b
       |  FROM cand
       |  JOIN sets sa ON cand.doc_a = sa.doc_id
       |  JOIN sets sb ON cand.doc_b = sb.doc_id
       |)
       |SELECT doc_a, doc_b, intersection, size_a, size_b,
       |  CAST(round(CAST(CAST(intersection AS DOUBLE)
       |        / CAST(size_a + size_b - intersection AS DOUBLE)
       |      AS DECIMAL(28,10)), 4) AS DOUBLE) AS jaccard
       |FROM scored
       |WHERE CAST(round(CAST(CAST(intersection AS DOUBLE)
       |        / CAST(size_a + size_b - intersection AS DOUBLE)
       |      AS DECIMAL(28,10)), 4) AS DOUBLE) >= 0.8
       |ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------ duplicate clustering

  /** Connected components over duplicate pairs — the keep-list builder
    * (each doc labeled with its component's min doc_id; keep the label
    * row, drop the rest). Iterative min-label propagation, the
    * GraphX/Pregel pattern in plain DataFrames: each round every node
    * takes the min label among itself and its neighbours; converged
    * when nothing changes. Rounds needed ≈ graph diameter (dup
    * clusters are near-cliques, so 2–3 in practice); `localCheckpoint`
    * per round truncates the growing lineage. One hash shuffle per
    * round on the node id — the standard large-scale CC shape (the
    * large-star/small-star optimization drops in here if components
    * ever get web-scale deep). */
  def duplicateClusters(pairs: DataFrame, maxIters: Int = 40): DataFrame = {
    // materialize the pair source once — the symmetrizing union would
    // otherwise evaluate the upstream pair query in BOTH branches
    val p = pairs.select(col("doc_a"), col("doc_b")).localCheckpoint()
    val edges = p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(p.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val nbrMin = edges.join(labels, col("dst") === col("node"))
        .groupBy(col("src")).agg(min(col("label")).as("nbr_min"))
      val propagated = labels
        .join(nbrMin, col("node") === col("src"), "left")
        .select(col("node"), col("label"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("mid_label"))
      // pointer doubling: follow the label's OWN label (labels are
      // always live node ids, so the self-join resolves) — turns the
      // per-round one-hop spread into label(label(x)), giving
      // O(log diameter) convergence instead of O(diameter) (a 1000-doc
      // duplicate chain converges in ~10 rounds, not ~1000)
      val updated = propagated.as("a")
        .join(labels.select(col("node").as("pnode"), col("label").as("plabel")).as("p"),
          col("a.mid_label") === col("p.pnode"))
        .select(col("a.node").as("node"), col("a.label").as("label"),
          least(col("a.mid_label"), col("p.plabel")).as("new_label"))
        .localCheckpoint()
      converged = updated.filter(col("new_label") < col("label")).isEmpty
      labels = updated.select(col("node"), col("new_label").as("label"))
      i += 1
    }
    require(converged,
      s"duplicateClusters did not converge in $maxIters rounds — raise maxIters")
    labels.select(col("node").as("doc_id"), col("label").as("cluster_rep"))
      .withColumn("is_kept", col("doc_id") === col("cluster_rep"))
      .orderBy(col("doc_id"))
  }

  /** Cluster the exact-Jaccard duplicate pairs (every doc that appears
    * in some duplicate pair, labeled by component). */
  def clustersQuery(s: SparkSession, dir: String): DataFrame =
    duplicateClusters(jaccardPairs(Tables.documents(s, dir)))

  /** DuckDB oracle: transitive closure by recursive CTE (min reachable
    * id per node == the component representative). */
  val clustersSql: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT doc_a, doc_b FROM (${jaccardPairsSql.replace("\n", "\n  ")})
       |), edges AS (
       |  SELECT doc_a AS s, doc_b AS d FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs
       |), reach(s, l) AS (
       |  SELECT s, s FROM (SELECT DISTINCT s FROM edges)
       |  UNION
       |  SELECT e.s, r.l FROM edges e JOIN reach r ON e.d = r.s
       |)
       |SELECT s AS doc_id, min(l) AS cluster_rep,
       |  s = min(l) AS is_kept
       |FROM reach GROUP BY s
       |ORDER BY doc_id""".stripMargin

  /** Eval-set decontamination — the training-data curation pass that
    * finds training documents leaking n-grams from a held-out eval
    * set (the standard pre-training hygiene step: if eval text
    * appears verbatim in training data, benchmark scores are
    * meaningless). Train docs are flagged with how many distinct
    * 5-grams they share with the eval slice and how many eval docs
    * are implicated.
    *
    * Scale shape: the eval set is tiny relative to training (here the
    * `doc_id % evalMod == 0` slice); its shingle frame broadcasts, so
    * the contamination check is a broadcast semi-join over the
    * training shingle stream — no shuffle of the training corpus. */
  def decontamination(documents: DataFrame, k: Int = 5, evalMod: Long = 50,
                      bloomFpp: Option[Double] = Some(0.01)): DataFrame = {
    val isEval = pmod(col("doc_id"), lit(evalMod)) === 0
    // materialize the (tiny) eval shingle frame once: without this the
    // tokenize+explode plan runs three times — the bloom sizing count,
    // the bloom aggregate, and the contamination join each re-evaluate
    val evalSh = shingles(documents.filter(isEval), k)
      .select(col("shingle"), col("doc_id").as("eval_doc"))
      .localCheckpoint()
    val trainSh0 = shingles(documents.filter(!isEval), k)
    // The train side is the CORPUS-sized shingle stream; the eval
    // benchmark is tiny by construction — so prune the train stream
    // with a Bloom filter of the eval shingles BEFORE the join
    // shuffle (the canonical 100 TB decontamination shape: nobody
    // shuffles the whole corpus's 5-grams against a benchmark set).
    // Exact for any fpp: surviving non-matches are removed by the
    // equi-join, and false negatives are impossible. On local[N] the
    // avoided exchange is in-memory and the prune measures neutral;
    // the payoff is CLUSTER shuffle bytes (~corpus shingles → ~matches
    // + fpp), which single-JVM wall time cannot show.
    val trainSh = bloomFpp match {
      case Some(fpp) => graft.ops.BloomJoin.prune(
        trainSh0, col("shingle"), evalSh, col("shingle"), fpp)
      case None => trainSh0
    }
    trainSh.join(evalSh, "shingle")
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("shingle")).as("n_shared_5grams"),
           count_distinct(col("eval_doc")).as("n_eval_docs"))
      .orderBy(col("doc_id"))
  }

  def decontaminationQuery(s: SparkSession, dir: String): DataFrame =
    decontamination(Tables.documents(s, dir))

  val decontaminationSql: String =
    """WITH sh5 AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |      generate_series(1, len(toks) - 4),
      |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4])))) AS shingle
      |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      |        FROM documents)
      |  WHERE len(toks) >= 5
      |),
      |ev AS (SELECT doc_id AS eval_doc, shingle FROM sh5 WHERE doc_id % 50 = 0),
      |tr AS (SELECT doc_id, shingle FROM sh5 WHERE doc_id % 50 <> 0)
      |SELECT tr.doc_id,
      |  count(DISTINCT tr.shingle) AS n_shared_5grams,
      |  count(DISTINCT ev.eval_doc) AS n_eval_docs
      |FROM tr JOIN ev ON tr.shingle = ev.shingle
      |GROUP BY tr.doc_id
      |ORDER BY doc_id""".stripMargin

  /** Apply the duplicate keep-list — the step that actually SHRINKS
    * the corpus: cluster members drop unless they are their cluster's
    * representative; docs in no cluster pass through. Completes the
    * dedup story (pairs → clusters → filtered corpus). One hash join
    * on doc_id; the cluster frame is |docs-in-some-cluster|-sized
    * (usually a small fraction of the corpus, broadcastable). */
  def applyKeepList(documents: DataFrame, clusters: DataFrame): DataFrame =
    documents
      .join(clusters.select(col("doc_id"), col("cluster_rep"), col("is_kept")),
        Seq("doc_id"), "left")
      .filter(col("is_kept").isNull || col("is_kept"))
      .select(col("doc_id"),
        when(col("is_kept").isNull, lit("unique")).otherwise(lit("cluster_rep"))
          .as("keep_reason"),
        coalesce(col("cluster_rep"), col("doc_id")).as("cluster_rep"),
        col("source"))
      .orderBy(col("doc_id"))

  /** The deduplicated corpus over the exact-Jaccard clusters. */
  def dedupedCorpusQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    applyKeepList(docs, duplicateClusters(jaccardPairs(docs)))
  }

  val dedupedCorpusSql: String =
    s"""WITH comp AS (SELECT * FROM (${clustersSql.replace("\n", "\n  ")}))
       |SELECT d.doc_id,
       |  CASE WHEN c.doc_id IS NULL THEN 'unique' ELSE 'cluster_rep' END AS keep_reason,
       |  coalesce(c.cluster_rep, d.doc_id) AS cluster_rep,
       |  d.source
       |FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
       |WHERE c.is_kept IS NULL OR c.is_kept
       |ORDER BY d.doc_id""".stripMargin

  // ----------------------------------------------------- MinHash LSH

  /** ENGINE-PORTABLE 60-bit string hash: the first 15 hex chars of
    * md5, parsed base-16. Value < 2^60 (never negative, no 64-bit
    * overflow in downstream arithmetic), and DuckDB reproduces it
    * bit-for-bit as `('0x' || substr(md5(x), 1, 15))::BIGINT` — which
    * is what lets the MinHash and SimHash ORACLES recompute the whole
    * sketch pipeline independently instead of settling for rows-only
    * (xxhash64, the previous hash, has no DuckDB twin). md5 is ~3×
    * xxhash64's cost per call, but both sketches hash each distinct
    * token/shingle exactly once — noise against the candidate joins. */
  private[graft] def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** [[h60]]'s DuckDB twin over a SQL expression string. */
  private[graft] def h60Sql(expr: String): String =
    s"CAST('0x' || substr(md5($expr), 1, 15) AS BIGINT)"

  /** Deterministic affine hash family over a 31-bit fold of
    * h60(shingle): h_i(x) = (a_i * x + b_i) mod p with Mersenne
    * prime p = 2^31 - 1 and a,b < p, so every product stays < 2^62 —
    * no long overflow under Spark 4's default ANSI mode (and none in
    * DuckDB, which ERRORS on BIGINT overflow rather than wrapping). */
  private val MinhashP = (1L << 31) - 1
  private def hashParams(k: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(k)((math.abs(rnd.nextLong()) % (MinhashP - 1)) + 1 ->
                 math.abs(rnd.nextLong()) % MinhashP)
  }

  /** Per-shingle h60 folds as an array column — computed ONCE per
    * element and shared by every affine signature (md5 costs ~16× the
    * affine transform and Catalyst does not CSE across the k
    * independent lambda trees; hashing inside each sig column made
    * the md5 pass the dominant signature cost).
    *
    * r18 (guide §4): native [[graftext.H60FoldArray]] — the first 15
    * hex chars of an md5 ARE its top 60 bits, so the fold reads the
    * digest bytes directly instead of materializing a 32-char hex
    * string + conv() per shingle; exact integer arithmetic,
    * bit-identity pinned in VectorCodecSpec. */
  private def h60Folds(set: Column): Column =
    org.apache.spark.sql.graftext.VectorCodec.h60Fold(set)

  /** All k signature minima from the pre-hashed fold array in ONE
    * native pass ([[graftext.MinhashSigs]], r18): the previous k
    * independent `array_min(transform(hashes, affine))` columns each
    * re-walked the fold array interpreted; same exact integer
    * arithmetic (bit-identity pinned in VectorCodecSpec). */
  private def sigsArray(hashes: Column, k: Int): Column =
    org.apache.spark.sql.graftext.VectorCodec.minhashSigs(hashes, hashParams(k))

  /** Per-doc sorted shingle sets — ONE grouped shuffle; signatures and
    * the exact-Jaccard verification both derive from it. */
  private[graft] def shingleSets(documents: DataFrame): DataFrame =
    shingles(documents).groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("shingle"))).as("sh_set"))

  /** (doc_id, band_id, band_hash) rows from a shingle-set frame — the
    * shared banding construction of [[minhashPairs]] and
    * [[incrementalMinhashDedup]]. Band key = the band's raw signature
    * tuple rendered as a string (not a hash of it): joins on it
    * identically, and the DuckDB oracles rebuild the same key with
    * string_agg — engine-portable where an xxhash64 of the sigs would
    * not be. */
  private[graft] def bandedSignatures(sets: DataFrame, k: Int = 16, bands: Int = 4): DataFrame = {
    // __sigs staged as its own column so the k sig projections read
    // element_at of ONE evaluated array (CollapseProject keeps the
    // split — re-inlining a non-cheap expression referenced k× would
    // duplicate it; the ZOrder staged-bucket precedent)
    val sig = sets.withColumn("__sigs", sigsArray(h60Folds(col("sh_set")), k))
      .select(col("doc_id") +: (0 until k).map(i =>
        element_at(col("__sigs"), i + 1).as(s"sig_$i")): _*)
    val rows = k / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band_id"),
        concat_ws(",", (b * rows until (b + 1) * rows).map(i => col(s"sig_$i")): _*).as("band_hash"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"), col("band.band_id"), col("band.band_hash"))
  }

  /** Per-doc MinHash signature columns (sig_0 … sig_{k-1}): one
    * grouped shuffle collects the shingle set, then all k mins are
    * higher-order array expressions over it (narrow, codegen'd) —
    * round 1 shuffled the exploded shingles a second time for the
    * min aggregates. */
  def minhashSignatures(documents: DataFrame, k: Int = 16): DataFrame =
    signaturesFromSets(shingleSets(documents), k)

  /** Signature columns over a pre-built (doc_id, sh_set) frame — the
    * sets-level entry the permutation-invariance property pins. */
  private[graft] def signaturesFromSets(sets: DataFrame, k: Int = 16): DataFrame =
    sets.withColumn("__sigs", sigsArray(h60Folds(col("sh_set")), k))
      .select(col("doc_id") +: (0 until k).map(i =>
        element_at(col("__sigs"), i + 1).as(s"sig_$i")): _*)

  /** MinHash-LSH candidate pairs, verified with exact Jaccard — but
    * ONLY on the candidates (this is the whole point of LSH: the
    * full shared-shingle self-join of [[jaccardPairs]] never runs).
    *
    * Banding: k=16 signature → `bands` bands of k/bands rows; docs
    * agreeing on any band collide. Pipeline: one explode-to-bands
    * shuffle (linear in corpus), per-bucket pair generation, then the
    * exact Jaccard of each candidate pair via array_intersect over
    * the two docs' (sorted, deterministic) shingle sets.
    *
    * Hot-bucket hardening: a corpus slice of near-identical docs makes
    * ONE band bucket quadratic (the residual risk at 100 TB). Buckets
    * larger than `bucketCap` members are salt-split into
    * ceil(n/bucketCap) sub-buckets by doc_id hash, bounding per-bucket
    * pair generation at ~bucketCap²; pairs split across salts are the
    * (deliberate, bounded) recall cost — near-identical groups remain
    * connected transitively inside each sub-bucket. */
  def minhashPairs(documents: DataFrame, k: Int = 16, bands: Int = 4,
                   threshold: Double = 0.8, bucketCap: Int = 1000): DataFrame = {
    // ONE shingle-set aggregation feeds everything: signatures derive
    // narrowly from the set arrays (sigFromSet), and the exact-Jaccard
    // verification reuses the same sets — round 1 shuffled the exploded
    // shingles twice (min-agg + collect_set); this halves the dedup
    // shuffle volume and lets Catalyst reuse the one exchange.
    locally {
      val sets = shingleSets(documents)
      val banded = bandedSignatures(sets, k, bands)

      // size each band bucket and salt-split the oversized ones; the
      // sizes join shuffles on the same keys as the pair join below,
      // so the exchanges co-locate
      val sizes = banded.groupBy(col("band_id"), col("band_hash"))
        .agg(count(lit(1)).as("bucket_n"))
      val salted = banded.join(sizes, Seq("band_id", "band_hash"))
        .withColumn("n_salts",
          ceil(col("bucket_n").cast("double") / bucketCap).cast("int"))
        .withColumn("salt", pmod(h60(col("doc_id").cast("string")), col("n_salts").cast("long")).cast("int"))
        .select(col("doc_id"), col("band_id"), col("band_hash"), col("salt"))

      val cand = salted.as("x").join(salted.as("y"),
          col("x.band_id") === col("y.band_id") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.salt") === col("y.salt") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()

      verifiedJaccard(cand, sets, threshold)
    }
  }

  def minhashPairsQuery(s: SparkSession, dir: String): DataFrame =
    minhashPairs(Tables.documents(s, dir))

  /** FULL-PARITY DuckDB oracle for [[minhashPairs]]: recomputes the
    * entire sketch pipeline independently — h60 shingle hashes, the
    * k=16 affine signature mins (same (a,b) params, emitted from the
    * same [[hashParams]] call), 4-row band keys, bucket sizing +
    * salt-split, candidate join, exact-Jaccard verification — so the
    * hash compare certifies the IMPLEMENTATION, not just invariants.
    * Every integer op is in h60's overflow-safe range in both engines. */
  val minhashPairsSql: String = {
    val params = hashParams(16).zipWithIndex.map { case ((a, b), i) =>
      s"  ($i, CAST($a AS BIGINT), CAST($b AS BIGINT))" }.mkString(",\n")
    val jacc = graft.ops.ConditionalAgg.roundPortableSql(
      """CAST(CAST(intersection AS DOUBLE)
        |        / CAST(size_a + size_b - intersection AS DOUBLE) AS DOUBLE)""".stripMargin, 4)
    s"""WITH $shinglesCte,
       |sets AS (SELECT doc_id, list(shingle) AS sh_set FROM sh GROUP BY doc_id),
       |params(pi, pa, pb) AS (VALUES
       |$params),
       |hs AS (SELECT doc_id, ${h60Sql("shingle")} % 2147483647 AS hm FROM sh),
       |sig AS (
       |  SELECT doc_id, pi, min((hm * pa + pb) % 2147483647) AS sigv
       |  FROM hs CROSS JOIN params GROUP BY doc_id, pi
       |),
       |band AS (
       |  SELECT doc_id, pi // 4 AS band_id,
       |    string_agg(CAST(sigv AS VARCHAR), ',' ORDER BY pi) AS band_hash
       |  FROM sig GROUP BY doc_id, band_id
       |),
       |sizes AS (SELECT band_id, band_hash, count(*) AS bucket_n
       |          FROM band GROUP BY band_id, band_hash),
       |salted AS (
       |  SELECT b.doc_id, b.band_id, b.band_hash,
       |    CAST(${h60Sql("CAST(b.doc_id AS VARCHAR)")}
       |      % CAST(ceil(s.bucket_n / 1000.0) AS BIGINT) AS INT) AS salt
       |  FROM band b JOIN sizes s
       |    ON b.band_id = s.band_id AND b.band_hash = s.band_hash
       |),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM salted x JOIN salted y
       |    ON x.band_id = y.band_id AND x.band_hash = y.band_hash
       |   AND x.salt = y.salt AND x.doc_id < y.doc_id
       |),
       |scored AS (
       |  SELECT doc_a, doc_b,
       |    CAST(len(list_intersect(sa.sh_set, sb.sh_set)) AS BIGINT) AS intersection,
       |    CAST(len(sa.sh_set) AS BIGINT) AS size_a,
       |    CAST(len(sb.sh_set) AS BIGINT) AS size_b
       |  FROM cand
       |  JOIN sets sa ON cand.doc_a = sa.doc_id
       |  JOIN sets sb ON cand.doc_b = sb.doc_id
       |)
       |SELECT doc_a, doc_b, intersection, size_a, size_b, $jacc AS jaccard
       |FROM scored
       |WHERE $jacc >= 0.8
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Incremental NEAR-dup dedup — flag arriving-batch docs that are
    * MinHash-near-duplicates of the already-ingested corpus, or of
    * other docs in the same batch, WITHOUT an all-corpus pair join.
    * The corpus contributes its banded signature INDEX (the state a
    * production pipeline persists between deliveries — |corpus|×bands
    * narrow rows) and set retrieval only for the few band-collision
    * candidates; corpus text is never re-shingled against itself.
    * This is the near-dup counterpart of [[incrementalDedup]] (whose
    * fingerprint index only catches EXACT duplicates — a crawler
    * delivering lightly-mutated boilerplate walks straight past it).
    *
    * Hot-bucket guard: index buckets with more than `maxBucket`
    * members are dropped from candidate generation (they are
    * boilerplate families whose members the BATCH-side full
    * [[minhashPairs]] pass already clusters; the documented recall
    * trade mirrors `bucketCap`). Candidate volume is then
    * ≤ |batch|·bands·maxBucket regardless of corpus skew — the bound
    * that keeps a delivery-sized join against a 100 TB index linear.
    *
    * Output, one row per verified duplication: `doc_id` (batch doc),
    * `dup_of` (the corpus doc, or the OTHER batch doc with the
    * smaller id), `src` ∈ {corpus, batch}, exact `jaccard`. Fully
    * DuckDB-oracle-checked end-to-end ([[incrementalMinhashSql]]) —
    * the h60 hash family makes the whole sketch pipeline portable. */
  def incrementalMinhashDedup(history: DataFrame, newBatch: DataFrame,
                              k: Int = 16, bands: Int = 4,
                              threshold: Double = 0.8,
                              maxBucket: Long = 1000): DataFrame = {
    // sets are the verification state; materialized once each (the
    // banding AND the candidate verification read them)
    val histSets = shingleSets(history).localCheckpoint()
    val batchSets = shingleSets(newBatch).localCheckpoint()
    incrementalMinhashCore(histSets, bandedSignatures(histSets, k, bands),
      batchSets, bandedSignatures(batchSets, k, bands), threshold, maxBucket)
  }

  /** [[incrementalMinhashDedup]] over PRE-BUILT index frames — the
    * entry point for callers that persist the signature index between
    * deliveries (the streaming writer), where history sets/bands load
    * from the state store instead of being recomputed from text. */
  private[graft] def incrementalMinhashCore(
      histSets: DataFrame, histBands: DataFrame,
      batchSets: DataFrame, batchBands: DataFrame,
      threshold: Double = 0.8, maxBucket: Long = 1000): DataFrame = {
    val histOk = histBands.join(
      histBands.groupBy(col("band_id"), col("band_hash"))
        .agg(count(lit(1)).as("__n")).filter(col("__n") <= maxBucket)
        .select("band_id", "band_hash"),
      Seq("band_id", "band_hash"))
    val corpusCand = batchBands.as("b").join(histOk.as("h"),
        col("b.band_id") === col("h.band_id") &&
        col("b.band_hash") === col("h.band_hash"))
      .select(col("b.doc_id").as("doc_id"), col("h.doc_id").as("dup_of"))
      .distinct()
    // within-batch: the arriving doc dups the EARLIER (smaller-id) one
    val batchCand = batchBands.as("x").join(batchBands.as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.band_hash") === col("y.band_hash") &&
        col("x.doc_id") > col("y.doc_id"))
      .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("dup_of"))
      .distinct()
    def verified(cand: DataFrame, partnerSets: DataFrame, src: String): DataFrame =
      cand
        .join(batchSets.select(col("doc_id"), col("sh_set").as("__sa")), "doc_id")
        .join(partnerSets.select(col("doc_id").as("dup_of"), col("sh_set").as("__sb")), "dup_of")
        .withColumn("__i", size(array_intersect(col("__sa"), col("__sb"))).cast("long"))
        .withColumn("jaccard", graft.ops.ConditionalAgg.roundPortable(
          col("__i").cast("double") /
            (size(col("__sa")).cast("long") + size(col("__sb")).cast("long") - col("__i")).cast("double"), 4))
        .filter(col("jaccard") >= threshold)
        .select(col("doc_id"), col("dup_of"), lit(src).as("src"), col("jaccard"))
    verified(corpusCand, histSets, "corpus")
      .unionByName(verified(batchCand, batchSets, "batch"))
      .orderBy(col("doc_id"), col("src"), col("dup_of"))
  }

  /** Driver query: same 80/20 split as [[incrementalDedupQuery]].
    * Shingles the corpus ONCE and filters the set frame per side —
    * sets derive per-doc, so `shingleSets(all).filter(side)` is
    * byte-identical to shingling each side separately at half the
    * aggregation cost (the production pipeline reads both sides from
    * a persisted set index anyway — see the streaming writer). */
  def incrementalMinhashQuery(s: SparkSession, dir: String): DataFrame = {
    val sets = shingleSets(Tables.documents(s, dir)).localCheckpoint()
    val hist = sets.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val batch = sets.filter(pmod(col("doc_id"), lit(5)) === 0)
    incrementalMinhashCore(hist, bandedSignatures(hist),
      batch, bandedSignatures(batch))
  }

  /** FULL-PARITY DuckDB oracle for [[incrementalMinhashQuery]]: the
    * h60 signature pipeline, the 80/20 split, the hot-bucket guard on
    * the index side, both candidate joins and the exact-Jaccard
    * verification, replayed end-to-end. */
  val incrementalMinhashSql: String = {
    val params = hashParams(16).zipWithIndex.map { case ((a, b), i) =>
      s"  ($i, CAST($a AS BIGINT), CAST($b AS BIGINT))" }.mkString(",\n")
    val jacc = graft.ops.ConditionalAgg.roundPortableSql(
      """CAST(CAST(i AS DOUBLE)
        |        / CAST(sa + sb - i AS DOUBLE) AS DOUBLE)""".stripMargin, 4)
    s"""WITH $shinglesCte,
       |sets AS (SELECT doc_id, list(shingle) AS sh_set FROM sh GROUP BY doc_id),
       |params(pi, pa, pb) AS (VALUES
       |$params),
       |hs AS (SELECT doc_id, ${h60Sql("shingle")} % 2147483647 AS hm FROM sh),
       |sig AS (
       |  SELECT doc_id, pi, min((hm * pa + pb) % 2147483647) AS sigv
       |  FROM hs CROSS JOIN params GROUP BY doc_id, pi
       |),
       |band AS (
       |  SELECT doc_id, pi // 4 AS band_id,
       |    string_agg(CAST(sigv AS VARCHAR), ',' ORDER BY pi) AS band_hash
       |  FROM sig GROUP BY doc_id, band_id
       |),
       |hist_band AS (SELECT * FROM band WHERE doc_id % 5 <> 0),
       |batch_band AS (SELECT * FROM band WHERE doc_id % 5 = 0),
       |hist_ok AS (
       |  SELECT h.* FROM hist_band h JOIN (
       |    SELECT band_id, band_hash FROM hist_band
       |    GROUP BY band_id, band_hash HAVING count(*) <= 1000
       |  ) ok ON h.band_id = ok.band_id AND h.band_hash = ok.band_hash
       |),
       |corpus_cand AS (
       |  SELECT DISTINCT b.doc_id, h.doc_id AS dup_of
       |  FROM batch_band b JOIN hist_ok h
       |    ON b.band_id = h.band_id AND b.band_hash = h.band_hash
       |),
       |batch_cand AS (
       |  SELECT DISTINCT x.doc_id, y.doc_id AS dup_of
       |  FROM batch_band x JOIN batch_band y
       |    ON x.band_id = y.band_id AND x.band_hash = y.band_hash
       |   AND x.doc_id > y.doc_id
       |),
       |scored AS (
       |  SELECT c.doc_id, c.dup_of, c.src,
       |    CAST(len(list_intersect(sa.sh_set, sb.sh_set)) AS BIGINT) AS i,
       |    CAST(len(sa.sh_set) AS BIGINT) AS sa,
       |    CAST(len(sb.sh_set) AS BIGINT) AS sb
       |  FROM (
       |    SELECT doc_id, dup_of, 'corpus' AS src FROM corpus_cand
       |    UNION ALL
       |    SELECT doc_id, dup_of, 'batch' AS src FROM batch_cand
       |  ) c
       |  JOIN sets sa ON c.doc_id = sa.doc_id
       |  JOIN sets sb ON c.dup_of = sb.doc_id
       |)
       |SELECT doc_id, dup_of, src, $jacc AS jaccard
       |FROM scored
       |WHERE $jacc >= 0.8
       |ORDER BY doc_id, src, dup_of""".stripMargin
  }

  // ------------------------------------------------------- SimHash

  /** 60-bit SimHash per doc: per-token [[h60]], each bit votes +1/-1
    * weighted by term frequency; sign → bit. Assembled as a single
    * grouped aggregate with 60 conditional sums (wide but map-side
    * combined; shuffle is |docs| rows). 60 bits rather than 64 so the
    * signature lives in h60's engine-portable range — which is what
    * lets [[simhashPairsSql]] recompute the whole pipeline in DuckDB
    * (hamming sensitivity at 60 vs 64 bits is equivalent for near-dup
    * thresholds of ≤3). */
  private val SimhashBits = 60
  def simhash(documents: DataFrame): DataFrame = {
    val tok = documents
      .select(col("doc_id"), explode(TextAnalysis.tokensCol(col("text"))).as("token"))
      .withColumn("th", h60(col("token")))
    val bitAggs = (0 until SimhashBits).map { b =>
      sum(when(shiftright(col("th"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v_$b")
    }
    val votes = tok.groupBy(col("doc_id")).agg(bitAggs.head, bitAggs.tail: _*)
    val sig = (0 until SimhashBits).map { b =>
      when(col(s"v_$b") > 0, shiftleft(lit(1L), b)).otherwise(0L)
    }.reduce(_ + _)  // bits are disjoint powers of two → sum == OR
    votes.select(col("doc_id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs: band the 60-bit signature into four
    * 15-bit chunks (pigeonhole: hamming ≤ 3 ⇒ some chunk equal),
    * join on chunk equality, verify hamming distance via bit_count. */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sig = simhash(documents)
    val chunks = (0 until 4).map { c =>
      struct(lit(c).as("chunk_id"),
        shiftright(col("simhash"), c * 15).bitwiseAND(0x7FFFL).as("chunk_val"))
    }
    val banded = sig.select(col("doc_id"), col("simhash"),
        explode(array(chunks: _*)).as("ch"))
      .select(col("doc_id"), col("simhash"), col("ch.chunk_id"), col("ch.chunk_val"))

    banded.as("x").join(banded.as("y"),
        col("x.chunk_id") === col("y.chunk_id") &&
        col("x.chunk_val") === col("y.chunk_val") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def simhashPairsQuery(s: SparkSession, dir: String): DataFrame =
    simhashPairs(Tables.documents(s, dir))

  /** FULL-PARITY DuckDB oracle for [[simhashPairs]]: recomputes token
    * h60 hashes, the 60 per-bit TF votes, signature assembly, 15-bit
    * chunk banding and the hamming verification — implementation-level
    * parity, same contract as [[minhashPairsSql]]. */
  val simhashPairsSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
       |  FROM documents
       |),
       |th AS (SELECT doc_id, ${h60Sql("token")} AS h FROM tok),
       |bits(b) AS (SELECT unnest(generate_series(0, ${SimhashBits - 1}))),
       |votes AS (
       |  SELECT doc_id, b,
       |    sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM th CROSS JOIN bits GROUP BY doc_id, b
       |),
       |sig AS (
       |  -- sum(BIGINT) widens to HUGEINT in DuckDB; fold back to BIGINT
       |  -- (value < 2^60 by construction) so the bit ops below match Spark
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b)
       |             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
       |  FROM votes GROUP BY doc_id
       |),
       |chunks(c) AS (SELECT unnest(generate_series(0, 3))),
       |banded AS (
       |  SELECT doc_id, simhash, c AS chunk_id, (simhash >> (c * 15)) & 32767 AS chunk_val
       |  FROM sig CROSS JOIN chunks
       |),
       |pairs AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |    CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
       |  FROM banded x JOIN banded y
       |    ON x.chunk_id = y.chunk_id AND x.chunk_val = y.chunk_val
       |   AND x.doc_id < y.doc_id
       |)
       |SELECT doc_a, doc_b, hamming FROM pairs
       |WHERE hamming <= 3
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Driver-gated contract report for the two sketch-based dedup paths
    * (whose pair sets are not DuckDB-portable — xxhash64 signatures):
    * boolean invariants the oracle CAN pin. `lsh_subset_of_exact`
    * holds by construction (LSH candidates are re-verified with exact
    * Jaccard); `lsh_recall_ge_0.90` is the banding guarantee on this
    * corpus (measured 1.0 at sf0.01, 0.992 at sf0.1); the simhash
    * rows pin the hamming bound and pair canonicalization. Any
    * banding/verification regression turns a row red in CORRECTNESS
    * instead of hiding in a rows-only entry. */
  def gateReport(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    gateReportWith(s, jaccardPairs(docs), minhashPairs(docs), simhashPairs(docs))
  }

  /** [[gateReport]] over pre-staged pair frames (the driver shares
    * one materialization of each pair set across its consumers). */
  def gateReportWith(s: SparkSession, exactPairs: DataFrame,
                     lshPairs: DataFrame, simPairs: DataFrame): DataFrame = {
    val exact = exactPairs.select("doc_a", "doc_b").localCheckpoint()
    val lsh = lshPairs.select("doc_a", "doc_b").localCheckpoint()
    val sim = simPairs.localCheckpoint()
    val nExact = exact.count()
    val recovered = lsh.join(exact, Seq("doc_a", "doc_b"), "left_semi").count()
    val checks = Seq(
      ("lsh_recall_ge_0.90", nExact == 0 || recovered.toDouble / nExact >= 0.90),
      ("lsh_subset_of_exact",
        lsh.join(exact, Seq("doc_a", "doc_b"), "left_anti").isEmpty),
      ("simhash_hamming_le_3",
        sim.filter(col("hamming") > 3 || col("hamming") < 0).isEmpty),
      ("simhash_pairs_canonical", sim.filter(col("doc_a") >= col("doc_b")).isEmpty))
    import s.implicits._
    checks.toDF("check_name", "passes").orderBy("check_name")
  }

  val gateReportSql: String =
    """SELECT * FROM (VALUES
      |  ('lsh_recall_ge_0.90', true),
      |  ('lsh_subset_of_exact', true),
      |  ('simhash_hamming_le_3', true),
      |  ('simhash_pairs_canonical', true)) AS t(check_name, passes)
      |ORDER BY check_name""".stripMargin
}
