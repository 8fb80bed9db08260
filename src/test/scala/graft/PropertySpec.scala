package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5 test plan): bucket totality,
  * dedup idempotence, decimal-sum partitioning invariance — ScalaCheck
  * generators drive random fixtures through the real column
  * expressions (deterministic seeds, no scalatestplus bridge needed). */
class PropertySpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("price bucketing is total: every double lands in exactly one bucket") {
    val cases = samples(Gen.listOfN(50, Gen.chooseNum(-1000.0, 10000.0)), 10)
    val domain = Set("UNKNOWN", "0-50", "50-100", "100-200", "200-500", "500+")
    cases.foreach { xs =>
      val df = xs.toDF("price")
        .withColumn("b", graft.ops.Bucketize.priceBucket(col("price")))
      assert(df.filter(col("b").isNull).count() === 0)
      assert(df.select("b").distinct().collect().map(_.getString(0)).toSet.subsetOf(domain))
    }
  }

  test("h60 portable hash: range-bounded, deterministic, matches a pure-JVM md5 reference") {
    val strs = samples(Gen.listOfN(40,
      Gen.oneOf(Gen.alphaNumStr, Gen.asciiPrintableStr, Gen.const(""))), 5).flatten
    def jvmH60(s: String): Long = {
      // the reference construction: first 15 hex chars of md5, base-16
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val got = strs.toDF("s")
      .select(col("s"), graft.dedup.NearDup.h60(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    strs.foreach { s =>
      assert(got(s) >= 0L && got(s) < (1L << 60), s"out of range for '$s'")
      assert(got(s) === jvmH60(s), s"mismatch vs JVM md5 reference for '$s'")
    }
  }

  test("minhash signatures are invariant under shingle-set permutation") {
    // array_min over the hashed folds must not care about set order —
    // the guarantee that lets sorted/unsorted set sources agree
    val sets = samples(Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty)), 8)
      .map(_.distinct).filter(_.nonEmpty)
    val base = sets.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val perm = sets.zipWithIndex.map { case (s, i) => (i.toLong, s.reverse) }
    def sigs(rows: Seq[(Long, Seq[String])]) = {
      val df = rows.toDF("doc_id", "sh_set")
      graft.dedup.NearDup.signaturesFromSets(df)
        .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    }
    assert(sigs(base) === sigs(perm))
  }

  test("ngram_stats agrees with a naive Scala reference on random token arrays") {
    import org.apache.spark.sql.graftext.NgramStats.ngramStats
    // small alphabet forces heavy gram collisions — the interesting regime
    val tokGen = Gen.listOfN(40, Gen.oneOf("a", "b", "c", "ab"))
    val cases = samples(tokGen, 25) :+ List.empty[String] :+ List("solo")
    def ref(toks: Seq[String], n: Int): (Long, Long, Long) = {
      val counts = toks.sliding(n).filter(_.size == n)
        .map(_.mkString(" ")).toSeq.groupBy(identity).map(_._2.size.toLong)
      (counts.size.toLong,
        if (counts.isEmpty) 0L else counts.max,
        counts.filter(_ >= 2).sum)
    }
    val got = cases.toDF("toks")
      .select(ngramStats(col("toks"), 3).as("ns"))
      .collect().map(_.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
    cases.zip(got).foreach { case (toks, stats) =>
      (1 to 3).foreach { n =>
        assert(stats(n - 1) === ref(toks, n),
          s"n=$n mismatch for ${toks.take(10)}...")
      }
    }
  }

  test("time-of-day bucketing is total over all 24 hours") {
    val df = (0 to 23).toDF("h").withColumn("tod", graft.ops.Bucketize.timeOfDay(col("h")))
    assert(df.filter(col("tod").isNull).count() === 0)
    assert(df.select("tod").distinct().count() === 4)
  }

  test("dedup idempotence and survivor-determinism on random keyed data") {
    val cases = samples(
      Gen.listOfN(60, Gen.zip(Gen.chooseNum(0L, 9L), Gen.chooseNum(0L, 100L))), 5)
    cases.foreach { rows =>
      val df = rows.toDF("k", "v")
      val once = graft.ops.Dedup.latestPerKey(df, Seq("k"), Seq(col("v").desc))
      val twice = graft.ops.Dedup.latestPerKey(once, Seq("k"), Seq(col("v").desc))
      assert(once.count() === df.select("k").distinct().count())
      assert(once.except(twice).count() === 0 && twice.except(once).count() === 0)
      // survivor is the max v per key (deterministic rule)
      val expect = df.groupBy("k").agg(max("v").as("v"))
      assert(once.except(expect).count() === 0)
    }
  }

  test("moneySum is partitioning-invariant (decimal determinism)") {
    val xs = Seq.tabulate(500)(i => (i % 7, (i * 17 % 1000) / 100.0 + 0.01))
    def total(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(graft.ops.ConditionalAgg.moneySum(col("x")).as("s"))
    val a = total(xs.toDF("k", "x").repartition(1))
    val b = total(xs.toDF("k", "x").repartition(32))
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
  }

  test("ntileOf formula matches SQL NTILE bucket sizes for random (n, k)") {
    val cases = samples(Gen.zip(Gen.chooseNum(1, 500), Gen.chooseNum(1, 12)), 40)
    cases.foreach { case (n, k) =>
      val df = (1 to n).map(_.toLong).toDF("rn")
        .withColumn("b", graft.ops.GlobalRank.ntileOf(col("rn"), lit(n.toLong), k))
      val sizes = df.groupBy("b").count().orderBy("b")
        .collect().map(r => r.getInt(0) -> r.getLong(1))
      val q = n / k; val r = n % k
      val expected = (1 to math.min(k, n)).map(i =>
        i -> (if (i <= r) (q + 1).toLong else q.toLong)).filter(_._2 > 0)
      assert(sizes.toSeq === expected, s"n=$n k=$k")
    }
  }

  test("SpaceSaving invariants on random streams: never underestimates, error bounded, exact below capacity") {
    // SpaceSaving guarantees (Metwally et al.): for every reported
    // item, true_count <= count_est <= true_count + count_err, and in
    // exact mode (distincts <= capacity) count_err == 0 with counts
    // exact. Random zipf-ish streams through the REAL aggregate, split
    // across partitions (so partial merge is exercised too).
    val itemGen = Gen.frequency(
      (5, Gen.const("hot")), (3, Gen.oneOf("warm1", "warm2", "warm3")),
      (2, Gen.chooseNum(1, 200).map(i => s"cold_$i")))
    for (cap <- Seq(8, 64, 512)) {
      val stream = samples(itemGen, 2000)
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val rows = stream.toDF("v").repartition(7)
      val got = rows.agg(org.apache.spark.sql.graftext.ApproxTopK
          .approxTopK(col("v"), 5, cap).as("t"))
        .select(explode(col("t")).as("e"))
        .select(col("e.item"), col("e.count_est"), col("e.count_err"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      got.foreach { case (item, est, err) =>
        val t = truth.getOrElse(item, 0L)
        assert(est >= t, s"cap=$cap $item underestimated: $est < $t")
        assert(est - err <= t, s"cap=$cap $item error bound broken: $est-$err > $t")
      }
      if (truth.size <= cap) {
        // exact regime: top-5 must equal the true top-5 with zero error
        val exact = truth.toSeq.sortBy { case (i, c) => (-c, i) }.take(5)
        assert(got.map(g => (g._1, g._2)).toSeq === exact)
        assert(got.forall(_._3 == 0L))
      }
    }
  }

  test("foldBytes stays within [0, p) and is order-sensitive") {
    import graft.multimodal.Multimodal.MediaCodec
    val cases = samples(Gen.listOfN(64, Gen.chooseNum(-128, 127)), 30)
    cases.foreach { xs =>
      val bytes = xs.map(_.toByte).toArray
      val f = MediaCodec.foldBytes(bytes, 17L)
      assert(f >= 0 && f < MediaCodec.FoldMod)
      if (bytes.distinct.length > 1) {
        val rev = MediaCodec.foldBytes(bytes.reverse, 17L)
        // order sensitivity (rolling hash, not a bag hash) — reversal
        // collides only with probability ~1/p
        assert(f != rev || bytes.sameElements(bytes.reverse))
      }
    }
  }

  test("z-key interleave: adjacent cells differ, key bounded by 2*bits") {
    val df = (for (a <- 0 until 16; b <- 0 until 16) yield (a, b)).toDF("a", "b")
    val keyed = df.withColumn("z",
      graft.sink.ServingSink.zKey(col("a"), col("b"), 0, 15, 0, 15, 4)).cache()
    // bijective on the 16x16 grid, bounded by 2*4 bits
    assert(keyed.select("z").distinct().count() === 256)
    assert(keyed.filter(col("z") < 0 || col("z") > 255).count() === 0)
    // locality: the max z of the lower-left quadrant is below the min z
    // of the upper-right quadrant's top cell region only in curve order —
    // check the defining bit property instead: z(a,b) with a,b < 4 < 16
    assert(keyed.filter(col("a") < 4 && col("b") < 4 && col("z") >= 64).count() === 0)
  }

  test("rate guards: rates non-negative, denominators guarded (no inf/NaN)") {
    // NOTE: rates CAN exceed 100 here — event types are independent in
    // this dataset, so a segment can have more distinct purchasers than
    // viewers; the reference formula has the same property and only
    // guards the zero denominator (gold_conversion_funnel_daily.sql:91).
    val c = SparkEntry.queries("gold_conversion_funnel_daily")(spark, sf)
    assert(c.filter(col("overall_conversion_rate") < 0 ||
      isnan(col("overall_conversion_rate"))).count() === 0)
    val f = SparkEntry.queries("gold_user_journey_funnel")(spark, sf)
    assert(f.filter(col("total_purchases") > col("total_events")).count() === 0)
  }

  test("chunk windows cover every token exactly, for random (n, window, stride)") {
    val cases = samples(Gen.zip(
      Gen.chooseNum(1, 90), Gen.chooseNum(2, 40), Gen.chooseNum(1, 40)), 12)
    cases.foreach { case (n, window, stride0) =>
      val stride = math.min(stride0, window) // overlap needs stride <= window
      val text = (1 to n).map(i => s"t$i").mkString(" ")
      val chunks = graft.text.CurationOps.chunkWindows(
          Seq((1L, text)).toDF("doc_id", "text"), window, stride)
        .collect().map(r => (r.getInt(2), r.getInt(3)))
      // spans: inside the doc, first starts at 1, consecutive starts
      // advance by stride, the union covers 1..n with no gap
      assert(chunks.head._1 === 1)
      assert(chunks.forall { case (s0, len) => len >= 1 && s0 + len - 1 <= n })
      assert(chunks.sliding(2).forall {
        case Array((a, _), (b, _)) => b - a === stride
        case _ => true
      })
      val covered = chunks.flatMap { case (s0, len) => s0 until (s0 + len) }.toSet
      assert(covered === (1 to n).toSet,
        s"n=$n window=$window stride=$stride left gaps")
    }
  }
}
