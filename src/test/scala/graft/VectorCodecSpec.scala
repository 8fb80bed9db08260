package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.VectorCodec
import org.scalatest.funsuite.AnyFunSuite

/** Bit-identity pins for the r18 native vector-codec expressions
  * (optimization guide §4): each native Expression must reproduce the
  * higher-order-function composition it replaced EXACTLY — same
  * double widening, same fold order, same first-minimum tie-break —
  * over the real embeddings table, so swapping them cannot move any
  * oracle-checked result. Each test evaluates BOTH formulations and
  * asserts equality with === (no tolerance: the claim is bit-identity,
  * not approximation). */
class VectorCodecSpec extends AnyFunSuite {
  import TestSession._

  private val dir = sf
  private lazy val emb = embs

  private def fsum(v: org.apache.spark.sql.Column) =
    aggregate(v, lit(0.0), (acc, x) => acc + x)

  test("L2NormalizeDouble ≡ transform/aggregate HOF normalization") {
    val d = transform(col("embedding"), x => x.cast("double"))
    val n = sqrt(fsum(transform(d, x => x * x)))
    val hof = when(n === 0.0, d).otherwise(transform(d, x => x / n))
    val rows = emb.select(
      VectorCodec.l2normalize(col("embedding")).as("nat"), hof.as("ref")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Double](0) === r.getSeq[Double](1))
    }
    // zero-vector branch: returns the widened vector unscaled
    val z = spark.sql("SELECT array(CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT)) AS v")
      .select(VectorCodec.l2normalize(col("v"))).collect()(0).getSeq[Double](0)
    assert(z === Seq(0.0, 0.0))
  }

  test("PqReconstruct / PqArgminAt ≡ the argmin/element_at HOF trees") {
    import graft.sim.ProductQuantAnn.{M, SubDim}
    val books = graft.sim.ProductQuantAnn.trainCodebooks(emb, iters = 1)
    val vec = VectorCodec.l2normalize(col("embedding"))

    // reference: the original flatten-of-M HOF reconstruction
    def l2sq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      fsum(zip_with(a, b, (x, y) => (x - y) * (x - y)))
    def argminIn(bookLit: org.apache.spark.sql.Column, sub: org.apache.spark.sql.Column) = {
      val scores = transform(bookLit, c => l2sq(sub, c))
      (array_position(scores, array_min(scores)) - 1).cast("int")
    }
    val refRecon = flatten(array((0 until M).map { m =>
      val bookLit = typedLit(books(m))
      val sub = slice(vec, m * SubDim + 1, SubDim)
      element_at(bookLit, argminIn(bookLit, sub) + 1)
    }: _*))

    val rows = emb.select(
      VectorCodec.pqReconstruct(vec, books).as("nat"), refRecon.as("ref")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Double](0) === r.getSeq[Double](1)))

    // the exploded-training-row argmin agrees with the HOF form too
    val booksLit = typedLit(books)
    val subs = emb.select(col("vec_id"), vec.as("__v"))
      .select(col("vec_id"), posexplode(array((0 until M).map(m =>
        slice(col("__v"), m * SubDim + 1, SubDim)): _*)).as(Seq("m", "sub")))
    val codes = subs.select(
      VectorCodec.pqArgminAt(col("m"), col("sub"), books).as("nat"),
      argminIn(element_at(booksLit, col("m") + 1), col("sub")).as("ref")).collect()
    assert(codes.nonEmpty)
    codes.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("EwmaFold ≡ interpreted aggregate fold (zero seed and seeded slice)") {
    val hist = sort_array(collect_list(col("o_totalprice").cast("double")))
    val histDf = graft.sources.Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority")).agg(hist.as("h"))
    val alpha = 0.3
    val zeroRef = aggregate(col("h"), lit(0.0),
      (acc, x) => lit(alpha) * x + lit(1 - alpha) * acc)
    val seededRef = aggregate(
      slice(col("h"), lit(2), size(col("h"))), element_at(col("h"), 1),
      (acc, x) => lit(alpha) * x + lit(1 - alpha) * acc)
    val rows = histDf.select(
      VectorCodec.ewmaFold(col("h"), lit(0.0), alpha).as("nz"), zeroRef.as("rz"),
      VectorCodec.ewmaFold(slice(col("h"), lit(2), size(col("h"))),
        element_at(col("h"), 1), alpha).as("ns"), seededRef.as("rs")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1))
      assert(r.getDouble(2) === r.getDouble(3))
    }
  }

  test("H60FoldArray / MinhashSigs ≡ md5-hex conv fold and k array_min transforms") {
    val P = (1L << 31) - 1
    def h60(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    val sets = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("sh_set"))
    val refFolds = transform(col("sh_set"), s => pmod(h60(s), lit(P)))
    val foldRows = sets.select(
      VectorCodec.h60Fold(col("sh_set")).as("nat"), refFolds.as("ref")).collect()
    assert(foldRows.nonEmpty)
    foldRows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))

    // same deterministic affine family as NearDup.hashParams(16)
    val rnd = new scala.util.Random(42)
    val params = Seq.fill(16)((math.abs(rnd.nextLong()) % (P - 1)) + 1 ->
      math.abs(rnd.nextLong()) % P)
    val refSigs = array(params.map { case (a, b) =>
      array_min(transform(col("h"), h => pmod(h * lit(a) + lit(b), lit(P))))
    }: _*)
    val sigRows = sets.select(VectorCodec.h60Fold(col("sh_set")).as("h"))
      .select(VectorCodec.minhashSigs(col("h"), params).as("nat"), refSigs.as("ref"))
      .collect()
    assert(sigRows.nonEmpty)
    sigRows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
    // empty input: every signature is NULL (array_min of empty)
    val empty = spark.sql("SELECT array() AS h")
      .select(VectorCodec.minhashSigs(col("h").cast("array<bigint>"), params))
      .collect()(0).getSeq[Any](0)
    assert(empty.size === 16 && empty.forall(_ == null))
  }

  test("ShinglesOf ≡ when/array_distinct/transform/concat_ws composition") {
    val k = 3
    val toks = graft.text.TextAnalysis.tokensCol(col("text"))
    val ref = when(size(col("__toks")) >= k,
      array_distinct(transform(
        sequence(lit(1), size(col("__toks")) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(o => element_at(col("__toks"), i + o)): _*))))
      .otherwise(typedLit(Seq.empty[String]))
    val rows = graft.sources.Tables.documents(spark, dir)
      .withColumn("__toks", toks)
      .select(VectorCodec.shinglesOf(col("__toks"), k).as("nat"), ref.as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
    // short docs: empty shingle set, matching the when() branch
    val short = spark.sql("SELECT array('one', 'two') AS t")
      .select(VectorCodec.shinglesOf(col("t"), k)).collect()(0).getSeq[String](0)
    assert(short.isEmpty)
  }

  test("LshBandVals ≡ per-band when(dot>0)·2^bit HOF sums") {
    // same deterministic planes as EmbeddingSim.hyperplanes(16)
    val rnd = new scala.util.Random(7)
    val planes = Seq.fill(16)(Seq.fill(64)(rnd.nextGaussian()))
    def dotHof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      fsum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))
    val refVals = array((0 until 4).map { bnd =>
      (0 until 4).map { bit =>
        val h = planes(bnd * 4 + bit)
        when(dotHof(col("embedding"), typedLit(h)) > 0, 1 << bit).otherwise(0)
      }.reduce(_ + _)
    }: _*)
    val rows = emb.select(
      VectorCodec.lshBandVals(col("embedding"), planes, 4).as("nat"),
      refVals.as("ref")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Int](0) === r.getSeq[Int](1)))
  }

  test("BpeEstimate ≡ aggregate/transform ceil(len/4) fold over the corpus") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val toks = graft.text.TextAnalysis.tokensCol(col("text"))
    val hof = aggregate(transform(toks,
        t => ceil(length(t).cast("double") / 4.0).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val rows = docs.select(
      VectorCodec.bpeEstimate(toks).as("nat"), hof.as("ref")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // empty token array → 0 (the HOF's zero seed)
    val e = spark.sql("SELECT array() AS t")
      .select(VectorCodec.bpeEstimate(col("t").cast("array<string>"))).collect()(0)
    assert(e.getLong(0) === 0L)
    // a NULL element nulls the sum, like acc + NULL
    val n = spark.sql("SELECT array('ab', CAST(NULL AS STRING)) AS t")
      .select(VectorCodec.bpeEstimate(col("t"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("RollingFp ≡ per-window slice/aggregate mod-prime folds over the corpus") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val FpMod = 1000000007L; val FpWin = 64; val FpStride = 32
    def windowHash(codes: org.apache.spark.sql.Column,
                   start: org.apache.spark.sql.Column,
                   len: org.apache.spark.sql.Column) =
      aggregate(slice(codes, start, len), lit(0L),
        (acc, x) => pmod(acc * 31 + x, lit(FpMod)))
    val len = length(col("text"))
    val nWin = when(len <= FpWin, lit(1))
      .otherwise(floor((len - FpWin) / FpStride).cast("int") + 1)
    val starts = sequence(lit(1), (nWin - 1) * FpStride + 1, lit(FpStride))
    val rows = docs
      .withColumn("__codes", transform(split(col("text"), ""), c => ascii(c)))
      .select(
        VectorCodec.rollingFp(col("text")).as("nat"),
        nWin.as("ref_n"),
        array_min(transform(starts,
          s => windowHash(col("__codes"), s, least(lit(FpWin), len)))).as("ref_min"),
        windowHash(col("__codes"), lit(1), len).as("ref_full"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getStruct(0)
      assert(s.getInt(0) === r.getInt(1))
      assert(s.getLong(1) === r.getLong(2))
      assert(s.getLong(2) === r.getLong(3))
    }
    // short-doc branch: one window ⇒ min == full
    val one = spark.sql("SELECT 'short text' AS text")
      .select(VectorCodec.rollingFp(col("text"))).collect()(0).getStruct(0)
    assert(one.getInt(0) === 1)
    assert(one.getLong(1) === one.getLong(2))
  }

  test("BoundedCollectSet ≡ collect_set under the cap, NULL past it") {
    import spark.implicits._
    // mixed types through one partition-shuffled frame: the set must
    // be exact (as a set) while ≤ cap and NULL-definite past it
    val df = (1 to 100).map(i => (i % 7, s"v${i % 7}", i.toLong))
      .toDF("k", "s", "x").repartition(8)
    val r = df.agg(
      VectorCodec.boundedCollectSet(col("k"), 10),
      VectorCodec.boundedCollectSet(col("s"), 10),
      VectorCodec.boundedCollectSet(col("x"), 10),
      collect_set(col("k")), collect_set(col("s"))).collect()(0)
    assert(r.getSeq[Int](0).sorted === r.getSeq[Int](3).sorted)
    assert(r.getSeq[String](1).sorted === r.getSeq[String](4).sorted)
    assert(r.isNullAt(2)) // 100 distinct longs > cap 10 → NULL
    // boundary: exactly cap distinct values still returns the set
    val b = (1 to 10).map(i => Tuple1(i)).toDF("k").repartition(4)
      .agg(VectorCodec.boundedCollectSet(col("k"), 10)).collect()(0)
    assert(b.getSeq[Int](0).sorted === (1 to 10))
    // cap+1 distinct values overflows
    val o = (0 to 10).map(i => Tuple1(i)).toDF("k").repartition(4)
      .agg(VectorCodec.boundedCollectSet(col("k"), 10)).collect()(0)
    assert(o.isNullAt(0))
    // NULLs are ignored like collect_set; all-NULL input → empty set
    val n = Seq[Option[Int]](None, Some(1), None).toDF("k")
      .agg(VectorCodec.boundedCollectSet(col("k"), 10)).collect()(0)
    assert(n.getSeq[Int](0) === Seq(1))
  }
}
