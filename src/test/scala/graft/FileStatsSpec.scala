package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FileStats
import graft.sources.FileStats.{ColStat, FileStat}

/** The manifest-stats bounds algebra: a predicate may only skip a file
  * when NO row of the file can satisfy it — every direction of every
  * comparison is pinned here against hand-computed truth, and the
  * footer collection is checked against a Spark-written file. */
class FileStatsSpec extends AnyFunSuite {
  import TestSession.spark

  private def longFile(min: Long, max: Long): FileStat =
    FileStat("f", 1, Map("id" -> ColStat("i64", min, max, 0, 0, null, null)))
  private def strFile(min: String, max: String): FileStat =
    FileStat("f", 1, Map("s" -> ColStat("str", 0, 0, 0, 0, min, max)))

  private val idAttr = AttributeReference("id", LongType)()
  private val sAttr = AttributeReference("s", StringType)()
  private def L(v: Long) = Literal(v, LongType)
  private def S(v: String) = Literal(UTF8String.fromString(v), StringType)

  private def keeps(f: FileStat, e: Expression): Boolean = FileStats.mayMatch(f, Seq(e))

  test("long bounds: every comparison direction") {
    val f = longFile(10, 20)
    // EqualTo inside/at-edges/outside
    assert(!keeps(f, EqualTo(idAttr, L(5))))
    assert(keeps(f, EqualTo(idAttr, L(10))) && keeps(f, EqualTo(idAttr, L(20))))
    assert(keeps(f, EqualTo(idAttr, L(15))) && !keeps(f, EqualTo(idAttr, L(25))))
    assert(keeps(f, EqualTo(L(15), idAttr)) && !keeps(f, EqualTo(L(25), idAttr)))
    // a > v  ⇔ max > v
    assert(keeps(f, GreaterThan(idAttr, L(19))) && !keeps(f, GreaterThan(idAttr, L(20))))
    // a >= v ⇔ max >= v
    assert(keeps(f, GreaterThanOrEqual(idAttr, L(20))) &&
      !keeps(f, GreaterThanOrEqual(idAttr, L(21))))
    // a < v  ⇔ min < v
    assert(!keeps(f, LessThan(idAttr, L(10))) && keeps(f, LessThan(idAttr, L(11))))
    // a <= v ⇔ min <= v
    assert(keeps(f, LessThanOrEqual(idAttr, L(10))) &&
      !keeps(f, LessThanOrEqual(idAttr, L(9))))
    // literal-on-left mirrors: 25 > a ⇔ a < 25 ; 5 > a ⇔ a < 5
    assert(keeps(f, GreaterThan(L(25), idAttr)) && !keeps(f, GreaterThan(L(10), idAttr)))
    assert(!keeps(f, LessThan(L(20), idAttr)) && keeps(f, LessThan(L(19), idAttr)))
    // In / InSet: any member in range keeps
    assert(keeps(f, In(idAttr, Seq(L(1), L(15)))) && !keeps(f, In(idAttr, Seq(L(1), L(2)))))
    assert(keeps(f, InSet(idAttr, Set[Any](1L, 15L))) &&
      !keeps(f, InSet(idAttr, Set[Any](1L, 2L))))
    // boolean structure
    assert(!keeps(f, And(EqualTo(idAttr, L(15)), EqualTo(idAttr, L(25)))))
    assert(keeps(f, Or(EqualTo(idAttr, L(25)), EqualTo(idAttr, L(15)))))
    assert(!keeps(f, Or(EqualTo(idAttr, L(25)), EqualTo(idAttr, L(26)))))
    // unmodeled shapes always keep
    assert(keeps(f, IsNotNull(idAttr)) && keeps(f, IsNull(idAttr)))
    assert(keeps(f, Not(EqualTo(idAttr, L(15)))))
  }

  test("type confusion and missing columns keep the file") {
    val f = longFile(10, 20)
    val intAttr = AttributeReference("id", IntegerType)()
    assert(keeps(f, EqualTo(intAttr, Literal(5, IntegerType))),
      "attribute type not matching the stat tag must keep")
    val other = AttributeReference("nope", LongType)()
    assert(keeps(f, EqualTo(other, L(5))),
      "a column with no stats (e.g. added by evolution) must keep")
  }

  test("string bounds compare in UTF-8 byte order") {
    val f = strFile("bb", "dd")
    assert(!keeps(f, EqualTo(sAttr, S("aa"))) && keeps(f, EqualTo(sAttr, S("cc"))))
    assert(!keeps(f, EqualTo(sAttr, S("dda"))) && keeps(f, EqualTo(sAttr, S("dd"))))
    assert(keeps(f, GreaterThan(sAttr, S("dc"))) && !keeps(f, GreaterThan(sAttr, S("dd"))))
    // multi-byte: "é" (0xC3A9) sorts AFTER "z" (0x7A) in byte order
    val g = strFile("é", "é")
    assert(keeps(g, GreaterThan(sAttr, S("z"))),
      "UTF-8 byte order must place multi-byte chars after ASCII")
    assert(!keeps(g, LessThan(sAttr, S("z"))))
  }

  test("manifest json round-trips stats incl. hostile string bounds") {
    val fs = Seq(
      FileStat("part-0.parquet", 7, Map(
        "id" -> ColStat("i64", -5, 9, 0, 0, null, null),
        "d" -> ColStat("f64", 0, 0, -1.5, 2.5, null, null),
        "s" -> ColStat("str", 0, 0, 0, 0, "a\"b\\c\n", "zé"))),
      FileStat("part-1.parquet", 0, Map.empty))
    val json = s"""{"version":3,"operation":"append","files":${FileStats.toJson(fs)}}"""
    val back = FileStats.fromManifest(json)
    assert(back.contains(fs), s"round-trip mismatch: $back")
    assert(FileStats.fromManifest("""{"version":3,"operation":"append"}""").isEmpty,
      "manifests without a files key must answer None (whole-dir fallback)")
  }

  test("mustMatch proves all-rows-match only with known-zero nulls; every direction pinned") {
    // the metadata-delete prover: a true answer DROPS the file unread,
    // so every leg here is a data-loss gate
    def nn(min: Long, max: Long, nulls: Long): FileStat =
      FileStat("f", 10, Map("id" -> ColStat("i64", min, max, 0, 0, null, null, nulls)))
    def drops(f: FileStat, e: Expression): Boolean = FileStats.mustMatch(f, Seq(e))

    val f = nn(10, 20, 0)
    // directions, attribute on the left
    assert(drops(f, GreaterThan(idAttr, L(9))) && !drops(f, GreaterThan(idAttr, L(10))))
    assert(drops(f, GreaterThanOrEqual(idAttr, L(10))) && !drops(f, GreaterThanOrEqual(idAttr, L(11))))
    assert(drops(f, LessThan(idAttr, L(21))) && !drops(f, LessThan(idAttr, L(20))))
    assert(drops(f, LessThanOrEqual(idAttr, L(20))) && !drops(f, LessThanOrEqual(idAttr, L(19))))
    assert(!drops(f, EqualTo(idAttr, L(10))), "eq needs min == max")
    assert(drops(nn(7, 7, 0), EqualTo(idAttr, L(7))))
    // literal-on-left mirrors
    assert(drops(f, GreaterThan(L(21), idAttr)) && !drops(f, GreaterThan(L(20), idAttr)))
    assert(drops(f, LessThan(L(9), idAttr)) && !drops(f, LessThan(L(10), idAttr)))
    // NULL rows never satisfy a comparison: unknown or nonzero null
    // counts must refuse the proof
    assert(!drops(nn(10, 20, -1), GreaterThan(idAttr, L(0))), "unknown nulls must refuse")
    assert(!drops(nn(10, 20, 3), GreaterThan(idAttr, L(0))), "present nulls must refuse")
    // composition: And needs both, Or needs either
    assert(drops(f, And(GreaterThan(idAttr, L(5)), LessThan(idAttr, L(25)))))
    assert(!drops(f, And(GreaterThan(idAttr, L(5)), LessThan(idAttr, L(15)))))
    assert(drops(f, Or(LessThan(idAttr, L(0)), GreaterThan(idAttr, L(5)))))
    assert(!drops(f, Or(LessThan(idAttr, L(0)), GreaterThan(idAttr, L(15)))))
    // In: only the single-value bound proves membership for all rows
    assert(drops(nn(7, 7, 0), In(idAttr, Seq(L(5), L(7)))))
    assert(!drops(f, In(idAttr, (5L to 25L).map(L))))
    // IsNotNull: exactly the known-zero-nulls claim
    assert(drops(f, IsNotNull(idAttr)) && !drops(nn(10, 20, -1), IsNotNull(idAttr)))
    // unmodeled shapes refuse (rewrite, never drop)
    assert(!drops(f, IsNull(idAttr)))
    assert(!drops(f, Not(EqualTo(idAttr, L(99)))))
    // mustMatch implies mayMatch: a dropped file can never be one the
    // carry test would also exclude (the trichotomy stays disjoint)
    for (v <- Seq(9L, 10L, 15L, 20L, 21L); e <- Seq[Expression](
      GreaterThan(idAttr, L(v)), LessThan(idAttr, L(v)), EqualTo(idAttr, L(v))))
      assert(!FileStats.mustMatch(f, Seq(e)) || FileStats.mayMatch(f, Seq(e)),
        s"must⇒may violated for $e")
  }

  test("fromV1Filter translates the DELETE surface; unmodeled shapes answer None") {
    import org.apache.spark.sql.{sources => v1}
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField("d", DateType)))
    def tr(f: v1.Filter) = FileStats.fromV1Filter(f, schema)
    assert(tr(v1.GreaterThan("id", 5L)).exists(_.isInstanceOf[GreaterThan]))
    assert(tr(v1.In("id", Array(1L, 2L))).exists(_.isInstanceOf[In]))
    assert(tr(v1.IsNull("s")).exists(_.isInstanceOf[IsNull]))
    // external date literal converts to the internal days encoding the
    // bounds algebra compares against
    val d = tr(v1.EqualTo("d", java.sql.Date.valueOf("2024-01-05"))).get
    val Literal(days, DateType) = (d: @unchecked) match { case EqualTo(_, l: Literal) => l }
    assert(days == java.time.LocalDate.of(2024, 1, 5).toEpochDay.toInt)
    // conjunction translates only when both sides do
    assert(tr(v1.And(v1.GreaterThan("id", 1L), v1.LessThan("id", 9L))).isDefined)
    assert(tr(v1.And(v1.GreaterThan("id", 1L), v1.StringStartsWith("s", "x"))).isEmpty)
    // unmodeled: Not / unknown column
    assert(tr(v1.Not(v1.EqualTo("id", 1L))).isEmpty)
    assert(tr(v1.EqualTo("zzz", 1L)).isEmpty)
  }

  test("collect reads footer bounds from a Spark-written file") {
    val dir = Files.createTempDirectory("graft_fstats_").resolve("d")
    // micros, not INT96 — the encoding the snapshot writers pin
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    spark.range(0, 100)
      .selectExpr("id", "CAST(id AS DOUBLE) / 4 AS x",
        "CAST(id % 10 AS STRING) AS s",
        "DATE_ADD(DATE '2024-01-01', CAST(id AS INT)) AS dt",
        "TIMESTAMP '2024-03-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS ts")
      .coalesce(1)
      .write.parquet(dir.toString)
    val got = FileStats.collect(dir).get
    assert(got.size == 1 && got.head.rows == 100)
    val st = got.head.stats
    // parquet records per-column null counts; the writer's columns
    // here are all non-null, so the collected stat must carry a
    // KNOWN-zero count (what the metadata-delete prover requires)
    assert(st("id") == ColStat("i64", 0, 99, 0, 0, null, null, 0))
    assert(st("x").tag == "f64" && st("x").minD == 0.0 && st("x").maxD == 24.75)
    assert(st("s") == ColStat("str", 0, 0, 0, 0, "0", "9", 0))
    assert(st("dt").tag == "date" &&
      st("dt").minL == java.time.LocalDate.of(2024, 1, 1).toEpochDay &&
      st("dt").maxL == java.time.LocalDate.of(2024, 4, 9).toEpochDay)
    assert(st("ts").tag == "tsu" &&
      st("ts").maxL - st("ts").minL == 99L * 1000000L)
  }

  test("distributed collection is bit-identical to the serial walk and skips hidden sidecars") {
    val dir = Paths.get(Files.createTempDirectory("graft_fs_dist_").toString, "data")
    spark.range(0, 1000)
      .selectExpr("id", "CAST(id AS DOUBLE) / 3 AS x", "CAST(id % 7 AS STRING) AS s")
      .repartition(12)
      .write.parquet(dir.toString)
    // a metadata sidecar (merge-on-read delete shape) must be invisible
    // to BOTH collection paths
    spark.range(0, 3).selectExpr("'v=1/f.parquet' AS file", "id AS pos")
      .coalesce(1).write.parquet(s"$dir/_deletes")
    val serial = FileStats.collect(dir).get
    val distributed = FileStats.collectFor(spark, dir).get
    assert(serial.size == 12, s"expected 12 data files, got ${serial.size}")
    assert(distributed == serial,
      "distributed footer-read job must produce the exact manifest the driver walk does")
    assert(serial.forall(f => !f.name.contains("_deletes")))
  }

  test("large commits perform zero serial driver footer opens; small deltas stay driver-side") {
    val table = Files.createTempDirectory("graft_fs_commit_").toString + "/t"
    val wide = spark.range(0, 1200).selectExpr("id", "id % 10 AS k").repartition(12)
    // full-state commit of 12 files (> driverFooterMax 8): stats come
    // from the distributed job — the driver-serial counter must not move
    val before = FileStats.driverFooterOpens.get()
    graft.sources.Snapshots.writeSnapshot(wide, table)
    assert(FileStats.driverFooterOpens.get() - before == 0L,
      "a >threshold commit must not footer-walk the driver")
    // ... and the distributed-collected stats are real: manifest rows exact
    val listed = graft.sources.Snapshots.snapshots(spark, table)
      .select("row_count").collect().map(_.getLong(0)).toSeq
    assert(listed == Seq(1200L))
    // O(delta) fast append of 1 file: the driver walk is the cheap path
    val before2 = FileStats.driverFooterOpens.get()
    graft.sources.Snapshots.appendSnapshot(
      spark.range(1200, 1210).selectExpr("id", "id % 10 AS k").coalesce(1), table)
    assert(FileStats.driverFooterOpens.get() - before2 == 1L,
      "a small delta should footer-walk serially (no job round-trip)")
    assert(graft.sources.Snapshots.readLatest(spark, table).count() == 1210)
  }
}
