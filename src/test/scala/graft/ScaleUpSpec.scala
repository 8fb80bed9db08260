package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.NearDup
import graft.sources.Tables

/** The 10× scale-curve generator must scale cardinalities, not just
  * row counts — and must NOT inflate duplicate groups across replicas
  * (that would make the dedup benchmarks quadratically heavier than a
  * genuine 10× corpus). */
class ScaleUpSpec extends AnyFunSuite {
  import TestSession._

  private lazy val dest: String = ScaleUp.ensure(spark, sf,
    Files.createTempDirectory("graft_sf10_").toString, factor = 10)

  test("events: 10x rows and 10x key cardinalities, same time range") {
    val base = Tables.events(spark, sf).cache()
    val big = Tables.events(spark, dest).cache()
    assert(big.count() === 10 * base.count())
    assert(big.select("event_id").distinct().count() ===
      10 * base.select("event_id").distinct().count())
    assert(big.select("user_id").distinct().count() ===
      10 * base.select("user_id").distinct().count())
    val Array(b, g) = Array(base, big).map(
      _.agg(min("ts"), max("ts")).head())
    assert(b === g, "time range must stay fixed (density scaling)")
  }

  test("documents: replica 0 verbatim, duplicate structure scales linearly") {
    val base = docs  // cached by TestSession
    val big = Tables.documents(spark, dest).cache()
    assert(big.count() === 10 * base.count())
    // replica 0 is the original corpus byte-for-byte
    assert(big.filter(col("doc_id") < 100000L).select("doc_id", "text")
      .exceptAll(base.select("doc_id", "text")).isEmpty)
    // exact-dup groups replicate per-replica, never merge across
    assert(NearDup.exactGroups(big).count() === 10 * NearDup.exactGroups(base).count())
    // near-dup pairs scale linearly too (cross-replica shingles disjoint)
    assert(NearDup.jaccardPairs(big).count() === 10 * NearDup.jaccardPairs(base).count())
  }

  test("lineitem: 10x rows, scaled key cardinalities, orderkey stride matches orders") {
    // UNPERSIST on exit: a lingering cached lineitem would be
    // substituted into every later suite's lineitem plans via the
    // CacheManager and break the PlanContractSpec column-pruning pins
    val base = Tables.lineitem(spark, sf).cache()
    val big = Tables.lineitem(spark, dest).cache()
    try {
      assert(big.count() === 10 * base.count())
      assert(big.select("l_partkey").distinct().count() ===
        10 * base.select("l_partkey").distinct().count())
      assert(big.select("l_suppkey").distinct().count() ===
        10 * base.select("l_suppkey").distinct().count())
      // the fact-to-fact join must still resolve: every scaled line's
      // order key exists in the scaled orders table (lockstep strides)
      val orphans = big.select("l_orderkey").distinct()
        .join(Tables.orders(spark, dest).select("o_orderkey").distinct(),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
      assert(orphans.isEmpty, "scaled lineitem orderkeys must join scaled orders")
    } finally { base.unpersist(); big.unpersist(); () }
  }

  test("factor 100: all replica transforms distinct, dup structure and norms hold") {
    // the 100× probe corpus (ScaleProbe): the two disjoint alphabet
    // rotations compose to 100 distinct text transforms, so exact-dup
    // groups must scale exactly 100× (any cross-replica collision
    // would merge groups and show up as a smaller count); embedding
    // rotation × sign-flip must stay norm-preserving past the dim-64
    // rotation period
    val d100 = ScaleUp.ensure(spark, sf,
      Files.createTempDirectory("graft_sf100_").toString, factor = 100)
    val base = docs
    val big = Tables.documents(spark, d100).cache()
    try {
      assert(big.count() === 100 * base.count())
      assert(big.filter(col("doc_id") < 100000L).select("doc_id", "text")
        .exceptAll(base.select("doc_id", "text")).isEmpty)
      assert(NearDup.exactGroups(big).count() === 100 * NearDup.exactGroups(base).count())
      val bigEmb = Tables.embeddings(spark, d100)
      assert(bigEmb.count() === 100 * embs.count())
      // norm preservation across ALL 100 replicas, incl. the flipped ones
      def norms(df: org.apache.spark.sql.DataFrame) = df.select(
        pmod(col("vec_id"), lit(1000000L)).as("base_id"),
        round(aggregate(col("embedding"), lit(0.0d),
          (a, x) => a + x.cast("double") * x.cast("double")), 3).as("n2"))
      assert(norms(bigEmb).distinct().count() === norms(embs).distinct().count())
      // replicas beyond the rotation period must NOT be verbatim copies
      // of their rotation-colliding partner (the sign flip separates
      // replica i from i+64)
      val dim = 64
      val collide = bigEmb
        .withColumn("__r", (col("vec_id") / lit(1000000L)).cast("int"))
        .withColumn("base_id", pmod(col("vec_id"), lit(1000000L)))
        .filter(col("__r") === 0 || col("__r") === dim)
        .groupBy("base_id")
        .agg(countDistinct(col("embedding").cast("string")).as("n"))
        .filter(col("n") < 2)
      assert(collide.isEmpty, "replica 64 must differ from replica 0")
    } finally { big.unpersist(); () }
  }

  test("factor 100: cross-replica shingle leakage stays far below the dedup threshold") {
    // Replicas sharing i%10 differ only on Alphabet2 letters, so a
    // word-3-shingle containing NONE of them is byte-identical across
    // those 10 replicas (a letter-map transform cannot avoid this —
    // a pure-digit span is invariant under EVERY letter map). The
    // honest-corpus claim is therefore quantitative: the worst
    // per-doc fraction f of second-alphabet-free shingles bounds the
    // cross-replica Jaccard at f/(2-f), which must sit far below the
    // 0.8 near-dup verification threshold — then no spurious
    // cross-replica pair survives verification and LSH band-collision
    // probability stays negligible, keeping the 100x probe's
    // candidate volume corpus-honest. (Measured on the full sf0.1
    // corpus: worst f = 0.31 -> J <= 0.19.)
    val sh = NearDup.shingles(docs)
      .withColumn("bfree", !col("shingle").rlike(s"[${ScaleUp.Alphabet2}]"))
    val per = sh.groupBy("doc_id")
      .agg((sum(when(col("bfree"), 1).otherwise(0)).cast("double") / count(lit(1)))
        .as("f"))
    val worst = per.agg(max(col("f"))).head().getDouble(0)
    val jBound = worst / (2.0 - worst)
    assert(jBound < 0.4,
      f"worst cross-replica Jaccard bound $jBound%.3f crept into near-dup range")
  }

  test("embeddings: 10x rows, norms preserved, replica 0 verbatim") {
    val base = embs  // cached by TestSession
    val big = Tables.embeddings(spark, dest).cache()
    assert(big.count() === 10 * base.count())
    assert(big.filter(col("vec_id") < 1000000L)
      .exceptAll(base).isEmpty, "replica 0 must be the original vectors")
    // rotation preserves the norm: per-vector sum of squares unchanged
    def norms(df: org.apache.spark.sql.DataFrame) = df.select(
      pmod(col("vec_id"), lit(1000000L)).as("base_id"),
      round(aggregate(col("embedding"), lit(0.0d),
        (a, x) => a + x.cast("double") * x.cast("double")), 3).as("n2"))
    assert(norms(big).distinct().count() === norms(base).distinct().count(),
      "rotated replicas must preserve each base vector's norm")
  }
}
