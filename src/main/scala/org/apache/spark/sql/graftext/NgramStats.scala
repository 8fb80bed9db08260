package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row n-gram frequency statistics over a token array — the
  * Gopher-repetition kernel (`graft.text.QualityFilters
  * .repetitionProfile`) as ONE native expression: a single hash-count
  * pass per document computing, for each n ∈ {1..maxN},
  * `(distinct, top, dup)` of the document's word n-grams —
  * distinct n-grams, the top n-gram's occurrence count, and the total
  * occurrences of duplicated (count ≥ 2) n-grams.
  *
  * Why native: the declarative formulation (array_sort + `aggregate`
  * run-length fold, or explode + two grouped aggs) either sorts every
  * gram array per row in interpreted HOF code or shuffles the whole
  * gram stream twice. This expression is O(total grams) per row with
  * NO sort, NO shuffle and NO per-element allocation beyond the gram
  * keys themselves — and `doGenCode` emits a static call, so it
  * inlines into whole-stage codegen without breaking the stage.
  *
  * Output: `array<struct<distinct:long, top:long, dup:long>>` indexed
  * by n−1 (totals are derivable: total_n = max(L − n + 1, 0)). The
  * hash-map iteration order never surfaces — only max/sum/size do —
  * so the result is deterministic and engine-portable. */
case class NgramStats(child: Expression, maxN: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(NgramStats.entryType, containsNull = false)
  override def prettyName: String = "ngram_stats"

  override def nullSafeEval(input: Any): Any =
    NgramStats.compute(input.asInstanceOf[ArrayData], maxN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graftext.NgramStats.compute($a, $maxN);")

  override protected def withNewChildInternal(newChild: Expression): NgramStats =
    copy(child = newChild)
}

object NgramStats {

  val entryType: StructType = StructType(Seq(
    StructField("distinct", LongType, nullable = false),
    StructField("top", LongType, nullable = false),
    StructField("dup", LongType, nullable = false)))

  /** One hash-count pass per n. Gram keys for n > 1 are the
    * space-joined token strings — identical keys to the declarative
    * `concat_ws(" ", tokens...)` formulation, so results match the
    * existing DuckDB oracles bit-for-bit.
    *
    * Null elements (the input type admits them even though tokensCol
    * never produces one) are DROPPED before windowing — without this,
    * n=1 would count a null hash key and n>1 gram keys would collapse
    * to null via UTF8String.concat, silently diverging from any
    * declarative formulation. Windowing over the compacted array is
    * the documented contract (pinned in NativeExprSpec). */
  def compute(tokens: ArrayData, maxN: Int): GenericArrayData = {
    val raw = tokens.numElements()
    val toks = new Array[UTF8String](raw)
    var len = 0
    var i = 0
    while (i < raw) {
      if (!tokens.isNullAt(i)) { toks(len) = tokens.getUTF8String(i); len += 1 }
      i += 1
    }
    val out = new Array[Any](maxN)
    val space = UTF8String.fromString(" ")
    var n = 1
    while (n <= maxN) {
      val counts = new java.util.HashMap[UTF8String, Long]()
      var j = 0
      val last = len - n
      while (j <= last) {
        val key =
          if (n == 1) toks(j)
          else {
            val parts = new Array[UTF8String](2 * n - 1)
            var k = 0
            while (k < n) {
              parts(2 * k) = toks(j + k)
              if (k < n - 1) parts(2 * k + 1) = space
              k += 1
            }
            UTF8String.concat(parts: _*)
          }
        counts.merge(key, 1L, (a, b) => a + b)
        j += 1
      }
      var top = 0L
      var dup = 0L
      val it = counts.values().iterator()
      while (it.hasNext) {
        val c = it.next()
        if (c > top) top = c
        if (c >= 2) dup += c
      }
      out(n - 1) = InternalRow(counts.size().toLong, top, dup)
      n += 1
    }
    new GenericArrayData(out)
  }

  def ngramStats(tokens: Column, maxN: Int): Column =
    ExpressionUtils.column(NgramStats(ExpressionUtils.expression(tokens), maxN))
}
