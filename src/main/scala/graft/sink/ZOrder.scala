package graft.sink

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) file clustering — the `OPTIMIZE … ZORDER BY`
  * maintenance op of Delta/Iceberg, for multi-dimensional data
  * skipping on plain parquet (Morton 1966; the public Delta/Iceberg
  * docs describe exactly this construction: per-dimension rank
  * buckets, bit-interleave, sort by the interleaved key).
  *
  * Why it matters at 100 TB: a layout sorted by ONE column only skips
  * files for predicates on that column; a Z-ordered layout maps each
  * row to a point on a space-filling curve over ALL clustered columns,
  * so every file covers a compact hyper-rectangle and min/max stats
  * prune files (and parquet row groups — the pushed-filter machinery
  * Spark already has) for range predicates on ANY clustered column or
  * combination. The rewrite is one stats pass + one range shuffle —
  * same cost shape as the linear sort it replaces.
  *
  * Construction per clustered column: bucket = rank of the value among
  * `buckets` quantile cutoffs (one `approxQuantile` stats pass computes
  * all columns' cutoffs; rank via a broadcast-free CASE chain since
  * cutoff counts are small), then the z-value interleaves the bucket
  * bits round-robin (all built-in bit ops — codegen'd, no UDF).
  * `repartitionByRange(z)` + `sortWithinPartitions(z)` gives each
  * writer task a contiguous z-range ⇒ each file a compact rectangle.
  */
object ZOrder {

  /** Bits per dimension (64 rank buckets) — a 2-D grid of 4 096
    * cells; file counts are orders of magnitude smaller, so per-file
    * rectangles stay well-resolved while the CASE chain that assigns
    * buckets stays at 63 comparisons — small enough for whole-stage
    * codegen (a 255-branch variant measurably fell out of codegen). */
  val BitsPerDim = 6

  /** Bucket index (0..2^bits-1) of `c` among the given ascending
    * cutoffs: count of cutoffs strictly below the value. NULLs land in
    * bucket 0 (they sort first, like NULLS FIRST). r19: kept as the
    * REFERENCE formulation for ZOrderSpec's bit-identity pin — the
    * data path uses the native [[graftext.ZMorton]]. */
  private[graft] def bucketOf(c: Column, cuts: Array[Double]): Column =
    cuts.map(q => when(c > q, 1).otherwise(0))
      .reduceOption(_ + _).getOrElse(lit(0))

  /** Interleave the low [[BitsPerDim]] bits of the per-dimension
    * bucket columns, round-robin from the high bit down — dimension 0
    * owns the highest bit. Pure built-in bit arithmetic (codegen'd). */
  private[graft] def interleave(bucketCols: Seq[Column]): Column = {
    val dims = bucketCols.length
    val terms = for {
      bit <- (BitsPerDim - 1) to 0 by -1
      (bc, d) <- bucketCols.zipWithIndex
    } yield {
      val outPos = bit * dims + (dims - 1 - d)
      shiftleft(shiftright(bc, bit).bitwiseAND(lit(1)), outPos)
    }
    terms.reduce(_ bitwiseOR _).cast("long")
  }

  /** `df` plus a `_z` Morton-code column over numeric/date/timestamp
    * columns `zcols` (dates/timestamps cluster on their epoch value).
    * One `approxQuantile` pass computes every dimension's cutoffs.
    *
    * The bucket of each dimension is STAGED as its own column before
    * the interleave: `interleave` references every bucket 8 times, and
    * inlining the 255-branch CASE sum into each bit term would blow
    * the expression tree to ~4 000 branches per row (observed 40×
    * slowdown via codegen bailout). As staged columns each bucket is
    * evaluated once; CollapseProject keeps the projection split
    * because re-inlining a non-cheap expression referenced 8× would
    * duplicate it. */
  def withZValue(df: DataFrame, zcols: Seq[String],
                 quantileSource: Option[DataFrame] = None): DataFrame = {
    val nBuckets = 1 << BitsPerDim
    val asDouble = zcols.map(c => s"__zd_$c" -> col(c).cast("double"))
    val typed = asDouble.foldLeft(df) { case (d, (n, e)) => d.withColumn(n, e) }
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    // quantiles are order-independent — compute them on the UNSHUFFLED
    // source when the caller staged `df` behind a repartition (r19,
    // guide §2.4: the stats pass was re-executing the round-robin
    // exchange a second time just to read the same values)
    val qsrc = quantileSource.map(q =>
      asDouble.foldLeft(q) { case (d, (n, e)) => d.withColumn(n, e) })
      .getOrElse(typed)
    val cuts = qsrc.stat.approxQuantile(asDouble.map(_._1).toArray, probs, 0.001)
    // distinct cutoffs only: heavy skew repeats a cutoff value, which
    // would otherwise multi-count one boundary. r19 (guide §4): bucket
    // rank + interleave run as ONE native expression — the staged
    // 63-comparison CASE chain per dimension plus the 48-term
    // shift/or tree dominated the rewrite (the plan fell out of
    // whole-stage codegen); ZMorton binary-searches the cutoffs in
    // compiled code, bit-identical (VectorCodecSpec pin).
    val cutSeqs: Seq[Seq[Double]] =
      cuts.map(c => c.distinct.sorted.toSeq).toSeq
    typed
      .withColumn("_z", org.apache.spark.sql.graftext.VectorCodec.zMorton(
        array(asDouble.map(p => col(p._1)): _*), cutSeqs, BitsPerDim))
      .drop(asDouble.map(_._1): _*)
  }

  /** Rewrite `df` into a Z-ordered parquet layout at `path`:
    * range-partition on the z-value so each writer task (and so each
    * file) covers a contiguous z-range, sort inside files, drop the
    * helper column before writing. Row content is untouched — the
    * driver query's oracle pins that. */
  def writeZOrdered(df: DataFrame, path: String, zcols: Seq[String],
                    maxRecordsPerFile: Long = 5000000L): Unit = {
    // round-robin repartition BEFORE evaluating _z: the range
    // exchange's sampling and map passes run on the child's
    // partitioning, and a source arriving as a handful of parquet
    // files would run them near-serially (stable 2.7-2.9 s with the
    // rotation vs 3-18 s erratic without it at sf0.1, r19 re-measure
    // — even with the native ZMorton the narrow sort/sample/shuffle
    // stages dominate). One extra rotation of the (projected, narrow)
    // rows buys full-width parallelism; the z-range shuffle follows
    // regardless.
    val spark = df.sparkSession
    val width = spark.sessionState.conf.numShufflePartitions
    withZValue(df.repartition(width), zcols, quantileSource = Some(df))
      // EXPLICIT partition count (r19, guide §2): a bare
      // repartitionByRange is an AQE-coalescible exchange — at mart
      // scale AQE merges the tiny range partitions into one writer
      // task, serializing the sort AND the maxRecordsPerFile-split
      // file writes; the explicit width pins full-width parallel
      // writers at any scale (width follows shuffle.partitions)
      .repartitionByRange(width, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite")
      .option("compression", "snappy")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
  }

  /** Per-file [min,max] envelopes of the clustered columns — the stats
    * a reader's file-skipping consults (parquet keeps the same stats
    * per row group; this surfaces them queryably for the audit). */
  def fileEnvelopes(spark: SparkSession, path: String,
                    zcols: Seq[String]): DataFrame = {
    val aggs = zcols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** How many files a conjunctive range predicate must read under this
    * layout: files whose envelope intersects every [lo, hi]. The
    * data-skipping win is `filesTotal - filesOverlapping` — spec-
    * asserted against a linear-sort layout of the same rows. */
  def filesOverlapping(envelopes: DataFrame,
                       box: Seq[(String, Double, Double)]): Long =
    box.foldLeft(envelopes) { case (e, (c, lo, hi)) =>
      e.filter(col(s"max_$c") >= lo && col(s"min_$c") <= hi)
    }.count()

  /** Driver query (`maintenance_zorder`): Z-order-rewrite the lineitem
    * fact on (l_partkey, l_suppkey) — the two-sided lookup pattern a
    * part/supplier analysis hits — then emit the rewritten table's
    * key columns ordered, which the DuckDB oracle reproduces from the
    * ORIGINAL table: a hash match proves the rewrite moved every row
    * and invented none (same contract as maintenance_compaction). */
  def zorderQuery(s: SparkSession, dir: String): DataFrame = {
    val li = graft.sources.Tables.lineitem(s, dir)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val out = java.nio.file.Files.createTempDirectory("graft_zorder_").toString
    writeZOrdered(li, out, Seq("l_partkey", "l_suppkey"),
      maxRecordsPerFile = 10000L)
    s.read.parquet(out)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      .orderBy("l_orderkey", "l_linenumber")
  }

  val zorderSql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber""".stripMargin
}
