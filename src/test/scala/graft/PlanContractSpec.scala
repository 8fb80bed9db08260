package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan contracts: the properties the 100 TB story depends on,
  * asserted against the actual planned string so a regression (lost
  * broadcast, lost WindowGroupLimit, a window sneaking onto a single
  * partition) fails the suite instead of surfacing as a slow cluster.
  * String-level matching on executedPlan is deliberate — it survives
  * operator reshuffles but catches strategy changes. */
class PlanContractSpec extends AnyFunSuite {
  import TestSession._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  private def analyzedPlan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("global top-k plans as TakeOrderedAndProject, never a full sort") {
    assert(plan("q_top_parts").contains("TakeOrderedAndProject"))
    assert(plan("q_shipping_priority").contains("TakeOrderedAndProject"))
  }

  test("per-group top-1 carries the WindowGroupLimit pushdown") {
    assert(plan("gold_category_performance").contains("WindowGroupLimit"))
  }

  test("dimension joins broadcast in the trade queries") {
    for (q <- Seq("q_volume_shipping", "q_market_share", "q_promo_revenue",
        "q_disjunctive_revenue", "q_revenue_by_nation"))
      assert(plan(q).contains("BroadcastHashJoin"), s"$q lost its broadcast")
  }

  test("scalable RFM never funnels rows through a single partition") {
    // (a bare "Window" match would false-positive on the cached silver
    // relation's partitioned dedup window printed inside
    // InMemoryRelation — the actual scale property is the exchange)
    // pin the BUILDERS directly — the driver entry for the scalable
    // path is now an equivalence report over checkpointed frames, so
    // its own plan would vacuously pass
    val silver = SparkEntry.queries("silver_events")(spark, sf)
    assert(!analyzedPlan(graft.marts.RfmSegments.buildAtScale(silver))
      .contains("SinglePartition"))
    assert(!plan("gold_user_rfm_segments").contains("SinglePartition"))
  }

  test("sketch rollups join partials broadcast, never cartesian or event-rescan") {
    for (q <- Seq("q_sketch_rolling_distinct", "q_sketch_rolling_topk",
        "q_sketch_rolling_quantiles", "q_sketch_audience_overlap",
        "text_length_drift")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q planned a cartesian")
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
        s"$q lost the broadcast spine join")
      // ONE scan of the base table: the rolling windows must come from
      // partial merges, not per-window rescans of the raw rows
      val scans = "Scan parquet".r.findAllIn(p).length
      assert(scans <= 1, s"$q scans the base table $scans times")
    }
  }

  test("text model queries tokenize the corpus a bounded number of times") {
    // build-model / score-corpus: the term/bigram tables are
    // materialized model state, so the expensive corpus tokenization
    // happens once to build and once to score — never once per
    // downstream aggregate (pre-round-9: dsir re-tokenized 5×)
    def scans(q: String): Int =
      "documents\\.parquet".r.findAllIn(plan(q)).length
    assert(scans("text_dsir_weights") <= 2, "dsir re-tokenizes the corpus")
    assert(scans("text_lm_scores") <= 2, "unigram LM re-tokenizes the corpus")
    assert(scans("text_tfidf_top_terms") <= 2, "tfidf re-tokenizes the corpus")
    assert(scans("text_lm_bigram_scores") <= 3, "bigram LM re-tokenizes the corpus")
  }

  test("no query plans an unpartitioned window") {
    // q_trailing_revenue: year-partitioned + boundary pad;
    // q_order_priority_share: broadcast-total instead of OVER ().
    // (A 1-row global .agg() still plans Exchange SinglePartition —
    // benign; the scale hazard is a WINDOW over one partition.)
    // q_gapfill_nation_revenue: LOCF window must stay per-entity
    import org.apache.spark.sql.execution.window.WindowExec
    for (q <- Seq("q_trailing_revenue", "q_order_priority_share",
        "q_gapfill_nation_revenue")) {
      val exec = SparkEntry.queries(q)(spark, sf).queryExecution.sparkPlan
      val bad = exec.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
      assert(bad.isEmpty, s"$q plans an unpartitioned window")
    }
  }

  test("big shuffle joins get a runtime bloom filter on the probe side") {
    import org.apache.spark.sql.functions._
    import graft.sources.Tables
    // emulate the at-scale shape: both sides too big to broadcast, the
    // build side selectively filtered — the optimizer must inject a
    // bloom-filter semi-join so the probe scan skips non-matching rows
    // before the shuffle
    val c = spark.conf
    val savedBroadcast = c.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      c.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      c.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      val orders = Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT")
      val li = Tables.lineitem(spark, sf)
      val joined = li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString.toLowerCase
      assert(plan.contains("bloomfilter") || plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
      assert(joined.collect().nonEmpty)
    } finally {
      c.set("spark.sql.autoBroadcastJoinThreshold", savedBroadcast)
      c.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      c.unset("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
    }
  }

  test("parquet scans prune columns: lineitem reads only what q1 needs") {
    val p = plan("q1_pricing_summary")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_partkey") && !readSchema.contains("l_suppkey"),
      s"q1 scan reads columns it never uses: $readSchema")
  }

  test("selective dim predicates reach the scans as pushed filters") {
    val p = plan("q_volume_shipping")
    assert(p.contains("PushedFilters: [In(n_name"),
      "nation pair filter did not push to the parquet scan")
  }

  test("native as-of join exec is actually planned for the native query") {
    assert(plan("q_asof_last_signup_native").contains("AsOfJoin"))
  }

  test("mixture sampling is shuffle-free (pure per-row hashing + explode)") {
    import graft.sources.Tables
    import graft.text.CurationOps
    // the sampled-corpus construction itself must not exchange — only
    // the presentation sort may (strip the top-level orderBy to check)
    val mix = CurationOps.sampleMixture(Tables.documents(spark, sf))
    val core = mix.queryExecution.sparkPlan.children.headOption
      .map(_.toString).getOrElse("")
    assert(!core.contains("Exchange hashpartitioning"),
      s"mixture sampling shuffles:\n$core")
  }

  test("curation windows stay partitioned: packing, passage dedup, shuffle shards") {
    import org.apache.spark.sql.execution.window.WindowExec
    for (q <- Seq("text_pack_sequences", "text_passage_dedup", "text_shuffle_shards")) {
      val exec = SparkEntry.queries(q)(spark, sf).queryExecution.sparkPlan
      val bad = exec.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
      assert(bad.isEmpty, s"$q plans an unpartitioned window")
    }
  }

  test("vocab coverage broadcasts the vocab; repetition profile stays window-free") {
    import org.apache.spark.sql.execution.window.WindowExec
    assert(plan("text_vocab_coverage").contains("BroadcastHashJoin"),
      "top-K vocab join lost its broadcast")
    for (q <- Seq("text_vocab_coverage", "text_repetition_profile")) {
      val exec = SparkEntry.queries(q)(spark, sf).queryExecution.sparkPlan
      val bad = exec.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
      assert(bad.isEmpty, s"$q plans an unpartitioned window")
    }
  }

  test("repetition profile is map-only: no aggregation or join exchange") {
    // every stat is per-document, so the only Exchange the plan may
    // contain is the range exchange of the final presentation ORDER BY
    // — a hash-partitioned exchange means a groupBy/join crept back in
    val p = plan("text_repetition_profile")
    assert(!p.contains("Exchange hashpartitioning"),
      s"repetition profile shuffles the gram stream again:\n$p")
    assert(!p.contains("HashAggregate"),
      s"repetition profile re-grew a grouped aggregation:\n$p")
  }

  test("bloom prune runs scan-side: membership probe below the join, no false-negative path") {
    // the might_contain pre-filter must sit in the lineitem scan's
    // Filter (pruning BEFORE the exchange/join), not above the join
    val p = plan("q_bloom_prune_revenue")
    assert(p.contains("might_contain"),
      s"bloom membership probe missing from the physical plan:\n$p")
    val joinIdx = p.indexOf("Join")
    val probeIdx = p.indexOf("might_contain")
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      "bloom probe did not plan below the join (formatted plans list children after parents)")
  }

  test("semdedup pair generation is an equi-join on (centroid, salt), never all-pairs") {
    import graft.sources.Tables
    val p = analyzedPlan(
      graft.sim.SemDedup.candidatePairs(Tables.embeddings(spark, sf)))
    // the deliberate nested-loop joins are the tiny broadcast centroid
    // scans inside assignment; the corpus-vs-corpus pair join must be
    // keyed, so no CartesianProduct may appear anywhere
    assert(!p.contains("CartesianProduct"), s"semdedup pair join went all-pairs:\n$p")
  }

  test("crossmodal agreement broadcasts both embedding endpoints") {
    import graft.sources.Tables
    val p = analyzedPlan(graft.sim.SemDedup.crossModalAgreement(
      graft.dedup.NearDup.jaccardPairs(Tables.documents(spark, sf)),
      Tables.embeddings(spark, sf)))
    assert(p.contains("BroadcastHashJoin"), "endpoint join lost its broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("cdc diff plans a keyed join between versions, never a cartesian") {
    import graft.sources.Snapshots
    import org.apache.spark.sql.functions._
    val daily = graft.marts.DailySales.build(
      SparkEntry.queries("silver_events")(spark, sf))
    val p = analyzedPlan(Snapshots.cdcDiffOver(spark, daily))
    assert(p.contains("FullOuter"), "cdc diff lost its full-outer key join")
    assert(!p.contains("CartesianProduct"))
  }
}
