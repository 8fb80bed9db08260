package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.{CosineSimilarity, GraftExtensions}
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.EmbeddingSim
import graft.sources.Tables

/** Native expression + SparkSessionExtensions coverage. */
class ExtensionsSpec extends AnyFunSuite {
  import TestSession._

  test("native cosine_sim matches the higher-order-function cosine bitwise") {
    val e = Tables.embeddings(spark, sf).limit(50)
    val pairs = e.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("b_id"), col("embedding").as("b")))
      .filter(col("a_id") < col("b_id")).limit(200)
    val cmp = pairs.select(
      CosineSimilarity.cosineSim(col("a"), col("b")).as("native"),
      EmbeddingSim.cosine(col("a"), col("b")).as("hof"))
    assert(cmp.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("native ngram_stats: hash-count pass matches hand-computed gram stats") {
    import spark.implicits._
    import org.apache.spark.sql.graftext.NgramStats.ngramStats
    // "a b a b a": unigrams a×3 b×2 → distinct 2, top 3, dup 5;
    // 2-grams "a b"×2 "b a"×2 → distinct 2, top 2, dup 4;
    // 3-grams "a b a"×2 "b a b"×1 → distinct 2, top 2, dup 2
    val rows = Seq(
      Seq("a", "b", "a", "b", "a"),
      Seq("x"),           // single token: no 2/3-grams → zeros
      Seq.empty[String])  // empty: all zeros
      .toDF("toks")
      .select(ngramStats(col("toks"), 3).as("ns"))
      .collect().map(_.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
    assert(rows(0) === Seq((2L, 3L, 5L), (2L, 2L, 4L), (2L, 2L, 2L)))
    assert(rows(1) === Seq((1L, 1L, 0L), (0L, 0L, 0L), (0L, 0L, 0L)))
    assert(rows(2) === Seq((0L, 0L, 0L), (0L, 0L, 0L), (0L, 0L, 0L)))
  }

  test("native ngram_stats matches the declarative explode+groupBy formulation on the corpus") {
    import org.apache.spark.sql.graftext.NgramStats.ngramStats
    // ≥ 2 tokens so the explode side emits a row for every doc (a
    // 1-token doc has zero 2-grams and would be absent from the
    // grouped side but present, zero-valued, on the native side)
    val docs = Tables.documents(spark, sf).limit(200)
      .withColumn("__toks", graft.text.TextAnalysis.tokensCol(col("text")))
      .filter(size(col("__toks")) > 1)
    val native = docs.select(col("doc_id"),
      element_at(ngramStats(col("__toks"), 2), 2).as("s2"))
      .select(col("doc_id"), col("s2.distinct").as("d"),
        col("s2.top").as("t"), col("s2.dup").as("u"))
    val grams = docs.select(col("doc_id"), explode(
        when(size(col("__toks")) >= 2,
          transform(sequence(lit(1), size(col("__toks")) - 1),
            i => concat_ws(" ", element_at(col("__toks"), i),
              element_at(col("__toks"), i + 1))))
          .otherwise(typedLit(Seq.empty[String]))).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("d"), max(col("c")).as("t"),
        sum(when(col("c") >= 2, col("c")).otherwise(lit(0L))).as("u"))
    assert(native.exceptAll(grams).count() === 0)
    assert(grams.exceptAll(native).count() === 0)
  }

  test("native jaro_winkler: published reference pairs, symmetry, identity") {
    import spark.implicits._
    import org.apache.spark.sql.graftext.JaroWinkler.jaroWinkler
    // Winkler's classic examples (published reference values)
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.9611), ("DWAYNE", "DUANE", 0.8400),
      ("DIXON", "DICKSONX", 0.8133), ("same", "same", 1.0),
      ("", "", 1.0), ("abc", "", 0.0), ("abc", "xyz", 0.0))
    val got = cases.toDF("a", "b", "want")
      .select(col("want"), round(jaroWinkler(col("a"), col("b")), 4).as("got"),
        round(jaroWinkler(col("b"), col("a")), 4).as("rev"))
      .collect()
    got.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(0)) < 1e-9, r.toString)
      assert(r.getDouble(1) === r.getDouble(2), s"asymmetric: $r")
    }
  }

  test("native jaro_winkler walks code points, not UTF-16 code units") {
    import spark.implicits._
    import org.apache.spark.sql.graftext.JaroWinkler.jaroWinkler
    // 😀 is a surrogate PAIR in UTF-16: a code-unit walk sees lengths
    // 6/6 with window 2 (jaro 0.7778); the code-point walk sees 4/4
    // with window 1 — one match, one half-transposition → exactly
    // (1/4 + 1/4 + 1/1) / 3 = 0.5. Pins the RapidFuzz/DuckDB-aligned
    // code-point semantics on non-BMP input.
    val got = Seq(("😀😀ab", "ab😀😀"))
      .toDF("a", "b")
      .select(jaroWinkler(col("a"), col("b")).as("jw"))
      .collect().head.getDouble(0)
    assert(got === 0.5, s"expected code-point JW 0.5, got $got")
    // non-BMP identity stays exact
    val self = Seq(("😀x😀", "😀x😀"))
      .toDF("a", "b").select(jaroWinkler(col("a"), col("b")).as("jw"))
      .collect().head.getDouble(0)
    assert(self === 1.0)
  }

  test("native ngram_stats drops null token elements before windowing") {
    import spark.implicits._
    import org.apache.spark.sql.graftext.NgramStats.ngramStats
    // (a, null, a, b): nulls compact out → tokens (a, a, b):
    // unigrams a×2 b×1 → (2, 2, 2); 2-grams "a a", "a b" → (2, 1, 0)
    val got = Seq(Seq[String]("a", null, "a", "b"))
      .toDF("toks")
      .select(ngramStats(col("toks"), 2).as("ns"))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got === Seq((2L, 2L, 2L), (2L, 1L, 0L)))
  }

  test("native cosine_sim: self-similarity 1.0, zero-vector guard") {
    import spark.implicits._
    val v = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
                (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 2.0f, 3.0f)))
      .toDF("a", "b")
      .select(round(CosineSimilarity.cosineSim(col("a"), col("b")), 9).as("c"))
      .collect().map(_.getDouble(0))
    assert(v(0) === 1.0)
    assert(v(1) === 0.0)
  }

  test("extensions: cosine_sim callable from SQL; approx-distinct rewrite fires") {
    // force the shared test session to exist, then step aside so
    // getOrCreate actually builds a NEW session with the extensions
    // (it silently reuses an active/default session otherwise)
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import s2.implicits._
      // SQL function registration
      val r = s2.sql("SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").first().getDouble(0)
      assert(math.abs(r - 1.0) < 1e-12)

      // rewrite off (default): exact distinct
      val df = Seq.tabulate(1000)(i => i % 37).toDF("x")
      assert(df.agg(count_distinct(col("x"))).first().getLong(0) === 37L)

      // rewrite on: plan rewrites COUNT(DISTINCT) → approx sketch
      s2.conf.set("spark.graft.approxDistinct", "true")
      val agg = df.agg(count_distinct(col("x")).as("d"))
      val optimized = agg.queryExecution.optimizedPlan.toString
      assert(optimized.contains("approx_count_distinct"), optimized)
      val approx = agg.first().getLong(0)
      assert(approx > 30 && approx < 45)  // 5% rsd around 37
      s2.conf.set("spark.graft.approxDistinct", "false")

      // the FULL native surface is SQL-callable (reference users are
      // SQL-first): string similarity, gram stats, container metadata,
      // and the mergeable sketch families in their agg+merge+query
      // composition — a two-level rollup exactly like the Column path
      assert(math.abs(s2.sql(
        "SELECT jaro_winkler('martha', 'marhta') AS j").first().getDouble(0)
        - 0.9611111111111111) < 1e-12)
      val ng = s2.sql(
        "SELECT ngram_stats(array('a','b','a','b','a'), 2) AS g").first()
        .getSeq[org.apache.spark.sql.Row](0)
      assert(ng.head.getLong(0) === 2L && ng.head.getLong(1) === 3L)
      // mp3_test_payload is Column-API-only (test construction) — use
      // the Column bridge for the payload, SQL for the probe
      val payload = org.apache.spark.sql.graftext.ContainerMeta
        .mp3Payload(org.apache.spark.unsafe.types.UTF8String.fromString("hello"))
      s2.createDataset(Seq(payload))(org.apache.spark.sql.Encoders.BINARY)
        .toDF("p").createOrReplaceTempView("mp3v")
      val meta = s2.sql(
        "SELECT mp3_meta(p).frames AS f, mp3_meta(p).sample_rate AS sr FROM mp3v").first()
      assert(meta.getInt(0) === 5 % 7 + 2)
      assert(meta.getInt(1) === graft.multimodal.ContainerProbe.Mp3SampleRates(5 % 3))
      // the r12 FLAC/Ogg legs are SQL-callable like the other three
      val flacP = org.apache.spark.sql.graftext.ContainerMeta
        .flacPayload(org.apache.spark.unsafe.types.UTF8String.fromString("hello"))
      val oggP = org.apache.spark.sql.graftext.ContainerMeta
        .oggPayload(org.apache.spark.unsafe.types.UTF8String.fromString("hello"))
      s2.createDataset(Seq((flacP, oggP)))(
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.BINARY, org.apache.spark.sql.Encoders.BINARY))
        .toDF("pf", "po").createOrReplaceTempView("audiov")
      val audio = s2.sql(
        """SELECT flac_meta(pf).sample_rate AS sr, flac_meta(pf).channels AS ch,
          |       ogg_meta(po).pages AS pg, ogg_meta(po).streams AS st
          |FROM audiov""".stripMargin).first()
      assert(audio.getInt(0) === Array(44100, 48000, 32000, 22050)(5 % 4))
      assert(audio.getInt(1) === 5 % 8 + 1)
      assert(audio.getInt(2) === (5 % 2 + 1) * (5 % 5 + 2))
      assert(audio.getInt(3) === 5 % 2 + 1)
      val kll = s2.sql(
        """WITH parts AS (
          |  SELECT id % 4 AS shard, kll_sketch_agg(CAST(id AS DOUBLE), 200) AS sk
          |  FROM range(0, 10000) GROUP BY id % 4
          |)
          |SELECT kll_quantile(kll_merge_agg(sk, 200), 0.5) AS med FROM parts""".stripMargin)
        .first().getDouble(0)
      assert(kll > 4000 && kll < 6000, s"median of 0..9999 ~ 5000, got $kll")
      val theta = s2.sql(
        """WITH a AS (SELECT theta_sketch_agg(CAST(id AS STRING), 12) AS sk
          |           FROM range(0, 1000)),
          |     b AS (SELECT theta_sketch_agg(CAST(id AS STRING), 12) AS sk
          |           FROM range(500, 1500))
          |SELECT theta_estimate(theta_intersect(a.sk, b.sk)) AS inter,
          |       theta_estimate(theta_union_pair(a.sk, b.sk, 12)) AS uni,
          |       theta_estimate(theta_a_not_b(a.sk, b.sk)) AS anb
          |FROM a, b""".stripMargin).first()
      assert(theta.getDouble(0) === 500.0, "exact below nominal capacity")
      assert(theta.getDouble(1) === 1500.0)
      assert(theta.getDouble(2) === 500.0)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
