package graft.marts

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Higher-order array-function coverage (SURVEY §2.8 breadth): the
  * collect→sort→transform/filter/aggregate/zip_with pipeline, fully
  * codegen'd (no UDFs), with a DuckDB list-function oracle. The
  * `array_sort` after `collect_list` is what makes a shuffle-order-
  * dependent aggregate deterministic and therefore oracle-checkable —
  * the same rule the MinHash signature derivation uses. */
object ArrayFunQueries {

  /** Per-order quantity vector analytics: sorted collect, positional
    * access, fold (sum of squares), filtered length, and an
    * index-weighted fold via zip_with over a generated sequence. */
  def orderLineArrays(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_quantity").cast("int").as("qty"))
    li.groupBy(col("l_orderkey"))
      .agg(array_sort(collect_list(col("qty"))).as("qtys"))
      .select(
        col("l_orderkey"),
        size(col("qtys")).as("n_lines"),
        element_at(col("qtys"), 1).as("min_qty"),
        element_at(col("qtys"), -1).as("max_qty"),
        aggregate(col("qtys"), lit(0L),
          (acc, x) => acc + (x * x).cast("long")).as("sum_sq"),
        size(filter(col("qtys"), x => x > 30)).as("big_lines"),
        aggregate(
          zip_with(col("qtys"), sequence(lit(1), size(col("qtys"))),
            (q, i) => q.cast("long") * i),
          lit(0L), (acc, x) => acc + x).as("weighted_sum"))
      .orderBy(col("l_orderkey"))
  }

  val orderLineArraysSql: String =
    """WITH g AS (
      |  SELECT l_orderkey, list_sort(list(CAST(l_quantity AS INT))) AS qtys
      |  FROM lineitem GROUP BY l_orderkey
      |)
      |SELECT l_orderkey,
      |  CAST(len(qtys) AS INT) AS n_lines,
      |  qtys[1] AS min_qty,
      |  qtys[-1] AS max_qty,
      |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(qtys, x -> CAST(x * x AS BIGINT))),
      |    (a, b) -> a + b) AS BIGINT) AS sum_sq,
      |  CAST(len(list_filter(qtys, x -> x > 30)) AS INT) AS big_lines,
      |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(range(1, len(qtys) + 1), i -> CAST(qtys[i] * i AS BIGINT))),
      |    (a, b) -> a + b) AS BIGINT) AS weighted_sum
      |FROM g
      |ORDER BY l_orderkey""".stripMargin
}
