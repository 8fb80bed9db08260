package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sink.PartitionTransforms

/** K5 partition-transform contracts: static partition pruning on a
  * date-ranged read and dynamic partition pruning when the partition
  * column is a join key — the two plan shapes that make a 100 TB
  * date-partitioned fact readable. */
class PartitionTransformSpec extends AnyFunSuite {
  import TestSession._

  private lazy val layout: String = {
    val tmp = Files.createTempDirectory("graft_pt_").toString
    val silver = SparkEntry.queries("silver_events")(spark, sf)
    PartitionTransforms.writePartitioned(silver, tmp,
      transforms = Seq("day" -> PartitionTransforms.days(col("event_date"))),
      sortCols = Seq(col("event_id")))
    tmp
  }

  test("transform values: days/months/years/bucket/truncate") {
    import spark.implicits._
    val df = Seq(("2024-03-07 13:45:00", "widget-9000", 1234L))
      .toDF("ts_s", "name", "n")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val r = df.select(
      PartitionTransforms.days(col("ts")).cast("string").as("d"),
      PartitionTransforms.months(col("ts")).as("m"),
      PartitionTransforms.years(col("ts")).as("y"),
      PartitionTransforms.hours(col("ts")).as("h"),
      PartitionTransforms.bucket(16, col("name")).as("b"),
      PartitionTransforms.truncate(6, col("name")).as("t"),
      PartitionTransforms.truncateNum(100L, col("n")).as("tn")).head()
    assert(r.getString(0) === "2024-03-07")
    assert(r.getString(1) === "202403")
    assert(r.getInt(2) === 2024)
    assert(r.getString(3) === "2024-03-07-13")
    assert(r.getInt(4) >= 0 && r.getInt(4) < 16)
    assert(r.getString(5) === "widget")
    assert(r.getLong(6) === 1200L)
  }

  test("date-range read prunes partitions statically (PartitionFilters + fewer files)") {
    val all = spark.read.parquet(layout)
    val pruned = PartitionTransforms.readDayRange(
      spark, layout, "event_date", "2024-01-10", "2024-01-16")
    val plan = pruned.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("_pt_day"), s"no partition filter in scan: $pf")
    // pruning must actually reduce the files READ, not just the rows
    // (inputFiles reflects the unpruned relation — count at runtime)
    def filesRead(df: org.apache.spark.sql.DataFrame): Long =
      df.select(input_file_name()).distinct().count()
    assert(filesRead(pruned) < filesRead(all))
    // and the pruned read returns exactly the row-filtered result
    val expected = all.filter(col("event_date")
      .between(lit("2024-01-10").cast("date"), lit("2024-01-16").cast("date")))
    assert(pruned.drop(PartitionTransforms.Prefix + "day")
      .exceptAll(expected.drop(PartitionTransforms.Prefix + "day")).isEmpty)
    assert(expected.drop(PartitionTransforms.Prefix + "day")
      .exceptAll(pruned.drop(PartitionTransforms.Prefix + "day")).isEmpty)
  }

  test("joining on the partition column against a filtered dim plans DPP") {
    import spark.implicits._
    // dim: one row per day with a weekend flag; the filter makes only
    // ~2/7 of partitions relevant — the scan must receive a runtime
    // DynamicPruningExpression instead of reading all 30 days
    val days = (1 to 30).map(d => f"2024-01-$d%02d")
    // the dim must come from a real source with a Filter node on top —
    // a filtered in-memory Seq constant-folds into a LocalTableScan,
    // which DPP's selective-predicate check ignores
    // (and the predicate must be "likely selective" — IN/comparison on a
    // column; a bare boolean attribute doesn't count)
    val dimPath = Files.createTempDirectory("graft_pt_dim_").toString
    days.toDF("d_str")
      .withColumn("d", col("d_str").cast("date"))
      .withColumn("dow", dayofweek(col("d")))
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("dow").isin(1, 7))
    val fact = spark.read.parquet(layout)
    val joined = fact.join(dim, fact(PartitionTransforms.Prefix + "day") === dim("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning in plan:\n$plan")
    // correctness: only weekend days survive
    val got = joined.collect()
    assert(got.nonEmpty && got.forall(r =>
      Set(1, 7).contains(r.getDate(0).toLocalDate.getDayOfWeek.getValue % 7 + 1)))
  }
}
