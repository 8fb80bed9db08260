package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sink.ZOrder

/** Z-order clustering: interleave arithmetic, and the data-skipping
  * claim itself — a Z-ordered layout must prune files for range
  * predicates on EITHER clustered dimension, where a linear sort only
  * prunes on its sort key. */
class ZOrderSpec extends AnyFunSuite {
  import TestSession.spark

  test("interleave: known bucket pairs produce the Morton code") {
    import spark.implicits._
    val z = spark.range(1).select(
      ZOrder.interleave(Seq(lit(32), lit(0))).as("hi_d0"),
      ZOrder.interleave(Seq(lit(1), lit(1))).as("both_low"),
      ZOrder.interleave(Seq(lit(0), lit(63))).as("d1_all"),
      ZOrder.interleave(Seq(lit(3), lit(1))).as("mixed"))
      .as[(Long, Long, Long, Long)].collect()(0)
    assert(z._1 === 2048L)             // bit5 of dim0 -> out bit 11
    assert(z._2 === 3L)                // bit0 of both dims -> bits 1,0
    assert(z._3 === 0x555L)            // dim1 owns the even bits
    assert(z._4 === 0xBL)              // 3=0b11 -> bits 3,1; 1 -> bit 0
  }

  test("ZMorton ≡ staged bucket CASE chains + interleave (r19 native pin)") {
    // real quantile cutoffs over real key distributions, so the
    // binary-search rank is pinned against the 63-comparison CASE
    // chain on the exact boundaries approxQuantile produced
    val li = graft.sources.Tables.lineitem(spark, TestSession.sf)
      .select(col("l_partkey").cast("double").as("d0"),
        col("l_suppkey").cast("double").as("d1"))
    val probs = (1 until 64).map(_.toDouble / 64).toArray
    val cuts = li.stat.approxQuantile(Array("d0", "d1"), probs, 0.001)
      .map(_.distinct.sorted)
    val rows = li.select(
      org.apache.spark.sql.graftext.VectorCodec.zMorton(
        array(col("d0"), col("d1")), cuts.map(_.toSeq).toSeq, ZOrder.BitsPerDim).as("nat"),
      ZOrder.interleave(Seq(
        ZOrder.bucketOf(col("d0"), cuts(0)),
        ZOrder.bucketOf(col("d1"), cuts(1)))).as("ref")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // NULL coordinate lands in bucket 0, like when(NULL > q)
    val n = spark.sql("SELECT array(CAST(NULL AS DOUBLE), CAST(5.0 AS DOUBLE)) AS p")
      .select(org.apache.spark.sql.graftext.VectorCodec.zMorton(
        col("p"), Seq(Seq(1.0, 2.0), Seq(1.0, 2.0)), 2)).collect()(0)
    // d1 value 5.0 > both cuts -> bucket 2 (0b10) on the even bits
    assert(n.getLong(0) === ((2L >> 1) << 2 | (2L & 1) << 0))
  }

  test("zorder layout skips files on both dimensions, linear only on its key") {
    import spark.implicits._
    // 200x200 uniform grid, one row per cell
    val grid = spark.range(40000).select(
      (col("id") % 200).cast("double").as("x"),
      (col("id") / 200).cast("double").as("y"))
    val zDir = java.nio.file.Files.createTempDirectory("graft_zorder_t_").toString
    val linDir = java.nio.file.Files.createTempDirectory("graft_linear_t_").toString
    // small grid: cap records/file so the layout yields many files even
    // after AQE coalesces the range shuffle (file splits follow the
    // sort, so each file still covers a contiguous z-range)
    ZOrder.writeZOrdered(grid, zDir, Seq("x", "y"), maxRecordsPerFile = 2000L)
    grid.repartitionByRange(col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").option("maxRecordsPerFile", 2000L)
      .parquet(linDir)

    val zEnv = ZOrder.fileEnvelopes(spark, zDir, Seq("x", "y")).cache()
    val linEnv = ZOrder.fileEnvelopes(spark, linDir, Seq("x", "y")).cache()
    val (zTotal, linTotal) = (zEnv.count(), linEnv.count())
    assert(zTotal > 4 && linTotal > 4, s"need multiple files, got $zTotal/$linTotal")

    val yBox = Seq(("y", 50.0, 60.0))
    val xBox = Seq(("x", 50.0, 60.0))
    // linear-by-x cannot skip anything for a y-only predicate …
    assert(ZOrder.filesOverlapping(linEnv, yBox) === linTotal)
    // … zorder skips at least half the files on BOTH single-dim boxes
    assert(ZOrder.filesOverlapping(zEnv, yBox) <= zTotal / 2,
      s"y-box read ${ZOrder.filesOverlapping(zEnv, yBox)} of $zTotal z-files")
    assert(ZOrder.filesOverlapping(zEnv, xBox) <= zTotal / 2,
      s"x-box read ${ZOrder.filesOverlapping(zEnv, xBox)} of $zTotal z-files")
    // 2-D box: prunes to a small corner
    val box2d = Seq(("x", 50.0, 60.0), ("y", 50.0, 60.0))
    assert(ZOrder.filesOverlapping(zEnv, box2d) <=
      ZOrder.filesOverlapping(zEnv, yBox))
  }

  test("zorder rewrite preserves row content exactly") {
    val out = ZOrder.zorderQuery(spark, TestSession.sf)
    val orig = graft.sources.Tables.lineitem(spark, TestSession.sf)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    assert(out.count() === orig.count())
    assert(out.exceptAll(orig).count() === 0)
    assert(orig.exceptAll(out).count() === 0)
  }
}
