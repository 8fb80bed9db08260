package graft.sources

import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.types._

/** Manifest-complete aggregate pushdown: an unfiltered, ungrouped
  * `COUNT(*) / COUNT(col) / MIN(col) / MAX(col)` over a catalog table
  * is answered ENTIRELY from the snapshot manifests — exact per-file
  * row counts, null counts and min/max bounds collected at commit
  * time — so the scan plans ZERO files: at 100 TB, `SELECT count(*)`
  * is a KB metadata read instead of a table scan (parquet's own
  * footer-based pushdown still launches a task per file; this removes
  * the tasks AND the footer reads).
  *
  * Sound by refusal — any of these bails to the normal scan:
  *  - pushed filters or GROUP BY (the bounds can't split rows);
  *  - any state component without per-file stats (pre-stats
  *    manifests);
  *  - COUNT(col): any file missing the column's stat or its null
  *    count (an all-null file records no stat, and a dropped stat is
  *    indistinguishable from it);
  *  - MIN/MAX: floats (parquet bounds exclude NaN, Spark's MIN/MAX
  *    order it largest — bounds would silently lie), strings (writer
  *    truncation paranoia), or any file missing the stat / mismatched
  *    tag.
  */
private[sources] object ManifestAgg {

  /** (result schema, final row values — internal representations) or
    * None when the aggregation is not provably answerable. */
  def answer(table: String, v: Long, agg: Aggregation, schema: StructType)
      : Option[(StructType, Array[Any])] = {
    if (agg.groupByExpressions().nonEmpty) return None
    val comps = Snapshots.stateComponents(table, v)
    val stats: Seq[FileStats.FileStat] = comps.map {
      case Right((_, st)) => st
      case Left(_)        => return None // statless dir: unknowable
    }

    def colOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[StructField] =
      e match {
        case r: NamedReference if r.fieldNames().length == 1 =>
          schema.fields.find(_.name == r.fieldNames()(0))
        case _ => None
      }

    // MIN/MAX-safe comparison classes: exact integer-like bounds only
    val minMaxTags = Set("i64", "i32", "i16", "i8", "date", "tsu")

    def internalOf(tag: String, v: Long): Any = tag match {
      case "i64" | "tsu" => java.lang.Long.valueOf(v)
      case "i32" | "date" => java.lang.Integer.valueOf(v.toInt)
      case "i16" => java.lang.Short.valueOf(v.toShort)
      case "i8"  => java.lang.Byte.valueOf(v.toByte)
      case _ => throw new IllegalStateException(s"unexpected min/max tag $tag")
    }

    def bound(f: StructField, pickMax: Boolean): Option[(StructField, Any)] = {
      val tag = FileStats.expectedTagOf(f.dataType).getOrElse(return None)
      if (!minMaxTags.contains(tag)) return None
      val perFile = stats.map { st =>
        st.stats.get(f.name) match {
          case Some(cs) if cs.tag == tag && st.rows > 0 => cs
          case _ if st.rows == 0 => null // empty file contributes nothing
          case _ => return None // missing/mismatched stat: unknowable
        }
      }.filter(_ != null)
      val field = StructField(
        s"${if (pickMax) "max" else "min"}(${f.name})", f.dataType, nullable = true)
      if (perFile.isEmpty) Some((field, null)) // empty table: SQL NULL
      else {
        val v = if (pickMax) perFile.map(_.maxL).max else perFile.map(_.minL).min
        Some((field, internalOf(tag, v)))
      }
    }

    val answered = agg.aggregateExpressions().map {
      case _: CountStar =>
        (StructField("count(*)", LongType, nullable = false),
          java.lang.Long.valueOf(stats.map(_.rows).sum))
      case c: Count if !c.isDistinct =>
        val f = colOf(c.column()).getOrElse(return None)
        val nonNull = stats.map { st =>
          if (st.rows == 0) 0L
          else st.stats.get(f.name) match {
            case Some(cs) if cs.nulls >= 0 => st.rows - cs.nulls
            case _ => return None // null count unknowable
          }
        }.sum
        (StructField(s"count(${f.name})", LongType, nullable = false),
          java.lang.Long.valueOf(nonNull))
      case m: Min =>
        val f = colOf(m.column()).getOrElse(return None)
        bound(f, pickMax = false).getOrElse(return None)
      case m: Max =>
        val f = colOf(m.column()).getOrElse(return None)
        bound(f, pickMax = true).getOrElse(return None)
      case _ => return None // SUM/AVG/distinct/UDAF: not bounds-answerable
    }
    Some((StructType(answered.map(_._1)), answered.map(_._2)))
  }
}
