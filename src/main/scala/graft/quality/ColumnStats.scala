package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType, TimestampType}
import graft.sources.Tables

/** ANALYZE-style column statistics — the table-profiling / CBO-stats
  * pass a lakehouse runs after large writes (`ANALYZE TABLE … COMPUTE
  * STATISTICS FOR COLUMNS` analog, reference: the dbt source-freshness
  * + row-count checks generalized to per-column profiles): per column,
  * row count, null count, exact distinct count, and min/max rendered
  * engine-portably.
  *
  * Shape: one COLUMN-PRUNED single-column scan per profiled column,
  * unioned — a single-distinct aggregate plans Spark's two-phase hash
  * agg with NO expand, where packing all columns into one agg would
  * multiply every row ×|columns| through the multi-distinct Expand
  * before the map-side combine (measured 4× slower at sf0.1). The N
  * pruned scans read the same total bytes as one N-column scan, each
  * fully pipelined; at 100 TB swap `count_distinct` for
  * `approx_count_distinct` (or the RewriteExactDistinct rule) to
  * collapse the distinct shuffle too.
  *
  * Portability: doubles/floats surface min/max through DECIMAL(18,2)
  * (per-double shortest-string rendering diverges across engines);
  * timestamps through second-precision strings (SURVEY §7.6). */
object ColumnStats {

  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    def render(c: String) = df.schema(c).dataType match {
      case DoubleType | FloatType | _: DecimalType =>
        (x: org.apache.spark.sql.Column) => x.cast(DecimalType(18, 2)).cast("string")
      case TimestampType =>
        (x: org.apache.spark.sql.Column) => date_format(x, "yyyy-MM-dd HH:mm:ss")
      case _ =>
        (x: org.apache.spark.sql.Column) => x.cast("string")
    }
    cols.map { c =>
      val r = render(c)
      df.select(col(c))
        .agg(count(lit(1)).as("__rows"), count(col(c)).as("__nonnull"),
          count_distinct(col(c)).as("n_distinct"),
          r(min(col(c))).as("min_value"), r(max(col(c))).as("max_value"))
        .select(lit(c).as("column_name"), col("__rows").as("n_rows"),
          (col("__rows") - col("__nonnull")).as("n_nulls"),
          col("n_distinct"), col("min_value"), col("max_value"))
    }.reduce(_.unionByName(_))
      .orderBy(col("column_name"))
  }

  def lineitemStatsQuery(s: SparkSession, dir: String): DataFrame =
    columnStats(Tables.lineitem(s, dir),
      Seq("l_returnflag", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"))

  /** Join/aggregation-key skew diagnosis — the profiling pass behind
    * every salting / AQE-skew decision in SCALE.md: the k hottest
    * values of a key column with their share of the table. One grouped
    * count + a broadcast 1-row total + a TakeOrderedAndProject top-k —
    * no full sort, linear in the table. */
  def keySkew(df: DataFrame, tableName: String, keyCol: String,
              topK: Int = 10): DataFrame = {
    import graft.ops.ConditionalAgg
    val counts = df.groupBy(col(keyCol).cast("string").as("key_value"))
      .agg(count(lit(1)).as("n_rows"))
    val total = df.agg(count(lit(1)).as("__total"))
    graft.ops.TopK.global(
        counts.crossJoin(broadcast(total))
          .select(lit(tableName).as("table_name"), lit(keyCol).as("key_column"),
            col("key_value"), col("n_rows"),
            ConditionalAgg.pct(col("n_rows"), col("__total"), 4).as("pct_of_total")),
        order = Seq(col("n_rows").desc, col("key_value").asc), k = topK)
  }

  /** Driver query: skew profiles of the two fact-table keys every
    * heavy join/agg in the repo shuffles on. */
  def skewReportQuery(s: SparkSession, dir: String): DataFrame =
    keySkew(Tables.lineitem(s, dir), "lineitem", "l_orderkey")
      .unionByName(keySkew(Tables.events(s, dir), "events", "user_id"))
      .orderBy(col("table_name"), col("n_rows").desc, col("key_value"))

  val skewReportSql: String = {
    import graft.ops.ConditionalAgg.roundPortableSql
    def one(table: String, key: String) =
      s"""SELECT 'REPLACE_TABLE' AS table_name, 'REPLACE_KEY' AS key_column,
         |  CAST($key AS VARCHAR) AS key_value, count(*) AS n_rows,
         |  ${roundPortableSql(
              s"100.0 * CAST(count(*) AS DOUBLE) / nullif(CAST((SELECT count(*) FROM $table) AS DOUBLE), 0)", 4)} AS pct_of_total
         |FROM $table GROUP BY $key
         |ORDER BY n_rows DESC, key_value ASC LIMIT 10"""
        .stripMargin
        .replace("REPLACE_TABLE", table).replace("REPLACE_KEY", key)
    s"""SELECT * FROM (
       |(${one("lineitem", "l_orderkey")})
       |UNION ALL
       |(${one("events", "user_id")})
       |)
       |ORDER BY table_name, n_rows DESC, key_value""".stripMargin
  }

  val lineitemStatsSql: String = {
    def row(c: String, minmax: String => String) =
      s"""SELECT '$c' AS column_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  ${minmax(s"min($c)")} AS min_value, ${minmax(s"max($c)")} AS max_value
         |FROM lineitem""".stripMargin
    def dec2(x: String) = s"CAST(CAST($x AS DECIMAL(18,2)) AS VARCHAR)"
    def ts(x: String) = s"strftime($x, '%Y-%m-%d %H:%M:%S')"
    def raw(x: String) = s"CAST($x AS VARCHAR)"
    Seq(row("l_returnflag", raw), row("l_quantity", dec2),
        row("l_extendedprice", dec2), row("l_discount", dec2),
        row("l_shipdate", ts))
      .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }
}
