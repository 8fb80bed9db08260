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
  * Shape: ONE aggregation pass computes every column's stats together
  * (Spark's distinct-expand multiplies rows ×|columns| before the
  * map-side combine — the standard multi-distinct cost; at 100 TB swap
  * `count_distinct` for `approx_count_distinct`, or enable the
  * session's RewriteExactDistinct rule, and the pass is one narrow
  * scan). The 1-row aggregate then explodes to one row per column —
  * no second scan, no shuffle beyond the global agg.
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
    val aggs = cols.flatMap { c =>
      val r = render(c)
      Seq(count(col(c)).as(s"__cnt_$c"),
        count_distinct(col(c)).as(s"__ndv_$c"),
        r(min(col(c))).as(s"__min_$c"),
        r(max(col(c))).as(s"__max_$c"))
    }
    df.agg(count(lit(1)).as("__rows"), aggs: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("column_name"),
        col("__rows").as("n_rows"),
        (col("__rows") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__ndv_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))): _*)).as("s"))
      .select("s.*")
      .orderBy(col("column_name"))
  }

  def lineitemStatsQuery(s: SparkSession, dir: String): DataFrame =
    columnStats(Tables.lineitem(s, dir),
      Seq("l_returnflag", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"))

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
