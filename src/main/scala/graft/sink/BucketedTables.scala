package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins (SURVEY §4 / the
  * "partitioning & shuffle" scale mandate): persisting both sides of
  * a recurring fact⋈fact join bucketed by the join key lets Spark
  * plan a SortMergeJoin with NO Exchange on either side — at 100 TB
  * the shuffle is usually the whole cost of the join, and bucketing
  * amortizes it into the (one-time) write.
  *
  * Plain-parquet bucketing requires the session catalog
  * (`saveAsTable`); `spark.sql.sources.bucketing.enabled` is on by
  * default. BucketedJoinSpec asserts the no-shuffle plan.
  */
object BucketedTables {

  /** Persist `df` bucketed (and sorted) by `keys` into `buckets`
    * files per partition under the session warehouse. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("compression", "snappy")
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket keys — planner
    * elides both exchanges (and both sorts, since files are sorted). */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    keys: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)
}
