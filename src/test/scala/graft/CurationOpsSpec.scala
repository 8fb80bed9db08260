package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.NearDup
import graft.sources.Tables
import graft.text.{Curation, CurationOps}

class CurationOpsSpec extends AnyFunSuite {
  import TestSession._

  // docs comes cached from TestSession (shared across suites)
  private lazy val verdicts =
    Curation.verdicts(docs, NearDup.jaccardPairs(docs)).cache()

  test("apply_curation keeps exactly the kept verdicts") {
    val clean = CurationOps.applyCuration(docs, verdicts)
    val kept = verdicts.filter(col("verdict") === "kept").count()
    assert(clean.count() === kept)
    // every cleaned doc must carry a kept verdict
    assert(clean.join(verdicts.filter(col("verdict") =!= "kept"), "doc_id").count() === 0)
  }

  test("dashboard verdict counts partition n_docs; token totals conserve") {
    val dash = CurationOps.sourceDashboard(docs, verdicts).cache()
    val bad = dash.filter(
      col("n_kept") + col("n_duplicate") + col("n_contaminated") +
        col("n_quality_reject") + col("n_eval_holdout") =!= col("n_docs"))
    assert(bad.count() === 0)
    assert(dash.filter(col("kept_tokens") > col("total_tokens")).count() === 0)
    assert(dash.agg(sum("n_docs")).first().getLong(0) === docs.count())
  }

  test("mixture: copies-per-doc equals n_copies and stays within weight bounds") {
    val mix = CurationOps.sampleMixture(docs).cache()
    val perDoc = mix.groupBy("doc_id", "weight", "n_copies")
      .agg(count(lit(1)).as("rows"), max("copy_idx").as("max_idx"))
    assert(perDoc.filter(col("rows") =!= col("n_copies")).count() === 0)
    assert(perDoc.filter(col("max_idx") =!= col("n_copies")).count() === 0)
    assert(mix.filter(col("n_copies") < floor(col("weight")) ||
      col("n_copies") > ceil(col("weight"))).count() === 0)
    // integral weights sample deterministically: weight 1.0 → exactly 1 copy
    assert(mix.filter(col("weight") === 1.0 && col("n_copies") =!= 1).count() === 0)
  }

  test("mixture downsample rate tracks the fractional weight (md5 bucket ~ uniform)") {
    val mix = CurationOps.sampleMixture(docs)
    val rates = mix.groupBy("source", "weight")
      .agg(count(lit(1)).cast("double").as("copies"))
      .join(docs.groupBy("source").agg(count(lit(1)).cast("double").as("n")), "source")
      .withColumn("rate", col("copies") / col("n"))
      .collect()
    // loose tolerance: sf0.001 sources are small (binomial noise)
    rates.foreach { r =>
      val (w, rate) = (r.getAs[Double]("weight"), r.getAs[Double]("rate"))
      assert(math.abs(rate - w) <= 0.45, s"source=${r.getAs[String]("source")} w=$w rate=$rate")
    }
  }

  test("passage dedup: copied boilerplate is dropped, originals keep") {
    import spark.implicits._
    val body = (1 to 40).map(i => s"tok$i").mkString(" ") // 4 clean passages
    val df = Seq(
      (1L, body),                                  // original: keeps all
      (2L, body),                                  // full copy: drops all
      (3L, body.split(" ").take(10).mkString(" ") + " unique tail of nine words here now"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val out = CurationOps.passageDedup(df).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_passages"), r.getAs[Long]("n_dropped"))))
      .toMap
    assert(out(1L) === ((4L, 0L)))
    assert(out(2L) === ((4L, 4L)))
    // doc 3: first passage duplicates doc 1's opening chunk, second is unique
    assert(out(3L) === ((2L, 1L)))
  }

  test("shuffle shards: a permutation — every doc once, dense positions per shard") {
    val sh = CurationOps.shuffleShards(docs).cache()
    assert(sh.count() === docs.count())
    assert(sh.select("doc_id").distinct().count() === docs.count())
    assert(sh.filter(col("shard") < 0 || col("shard") > 7).count() === 0)
    val dense = sh.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
    assert(dense.filter(col("lo") =!= 1 || col("hi") =!= col("n")).count() === 0)
  }

  test("packing conserves tokens, seq_ids contiguous, budget crossed before advancing") {
    val cap = 512
    val packed = CurationOps.packSequences(docs, cap).cache()
    val perDocTotal = graft.text.QualityFilters.tokenEstimates(docs)
      .agg(sum("bpe_estimate")).first().getLong(0)
    assert(packed.agg(sum("seq_tokens")).first().getLong(0) === perDocTotal)
    // seq ids are 0..n-1 per source
    val seqAgg = packed.groupBy("source")
      .agg(min("seq_id").as("lo"), max("seq_id").as("hi"), count(lit(1)).as("n"))
    assert(seqAgg.filter(col("lo") =!= 0 || col("hi") =!= col("n") - 1).count() === 0)
    // cumulative tokens through every non-final sequence cross its budget
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("seq_id")
    val cum = packed
      .withColumn("cum", sum(col("seq_tokens")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("is_last", col("seq_id") === max("seq_id").over(
        Window.partitionBy("source")))
    assert(cum.filter(!col("is_last") && col("cum") < (col("seq_id") + 1) * cap).count() === 0)
  }

  test("shard manifest: reproducible, and any corpus mutation flips its fingerprint") {
    import graft.text.CurationOps
    val docs = Tables.documents(spark, sf)
    val m1 = CurationOps.shardManifest(docs).cache()
    // reproducibility: a second build is byte-identical
    assert(m1.except(CurationOps.shardManifest(docs)).count() === 0)
    // partition-count invariance: XOR/sum/min/max are order-independent
    assert(m1.except(CurationOps.shardManifest(docs.repartition(3))).count() === 0)
    // a single mutated document flips exactly its (shard, source) row
    val mutated = docs.withColumn("text",
      when(col("doc_id") === 0L, concat(col("text"), lit("x")))
        .otherwise(col("text")))
    val m2 = CurationOps.shardManifest(mutated)
    val changed = m1.select("shard", "source", "content_xor")
      .except(m2.select("shard", "source", "content_xor"))
    assert(changed.count() === 1, "one doc changed => exactly one manifest row flips")
    // a dropped document changes the count AND the fingerprint
    val dropped = CurationOps.shardManifest(docs.filter(col("doc_id") =!= 0L))
    assert(m1.except(dropped).count() >= 1)
  }

  test("chunk windows: spans tile the doc with the configured overlap") {
    import spark.implicits._
    import graft.text.CurationOps
    // 50 tokens, window 32, stride 24 -> chunk 0 = [1,32], chunk 1 = [25,50]
    val text50 = (1 to 50).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text50), (2L, "only four tiny tokens")).toDF("doc_id", "text")
    val got = CurationOps.chunkWindows(docs, window = 32, stride = 24)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(got.toSeq === Seq((1L, 0, 1, 32), (1L, 1, 25, 26), (2L, 0, 1, 4)))
    // chunk text reconstructs the exact token slice
    val texts = CurationOps.chunkWindows(docs, window = 32, stride = 24)
      .filter(col("doc_id") === 1L).collect().map(_.getString(4))
    assert(texts(0) === (1 to 32).map(i => s"w$i").mkString(" "))
    assert(texts(1) === (25 to 50).map(i => s"w$i").mkString(" "))
  }
}
