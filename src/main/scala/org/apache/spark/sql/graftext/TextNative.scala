/** Native text-metric expressions for the curation hot paths.
  *
  * r19 optimization (guide §4, continuing the r18 vector-codec sweep):
  * the BPE-unit estimate and the winnowing rolling-hash fingerprint
  * were built from higher-order array functions (`aggregate` /
  * `transform` / `slice`) — HOFs carry no `doGenCode` in Spark 4, so
  * every document paid per-element interpreted lambda dispatches plus
  * an intermediate ArrayData per step (the fingerprint allocates a
  * 64-element slice per window). Each expression here replicates its
  * HOF composition bit-for-bit over the corpus' ASCII text (same
  * Long/Double arithmetic, same fold order), pinned by
  * VectorCodecSpec's exact-equality tests against the original HOF
  * formulations.
  *
  * Input contract (documented, matching the corpora these paths
  * serve): text is ASCII — the char-code sequence is taken as Unicode
  * code points, which coincides with `split(text, '')` + `ascii(...)`
  * for ASCII and keeps the DuckDB oracle's `string_split` + `ord`
  * twin exact. */
package org.apache.spark.sql.graftext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Σ ceil(numChars(token)/4) over a token array — the fused form of
  * `aggregate(transform(tokens, t => ceil(length(t)/4.0).cast(long)),
  * 0L, _+_)` (the ~4-chars-per-BPE-token budgeting heuristic).
  * ceil(n/4.0) == (n+3)/4 exactly for every non-negative int, so the
  * integer fold is bit-identical to the double ceil; a NULL element
  * nulls the whole sum exactly like the HOF's `acc + NULL`. */
case class BpeEstimate(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  // NULL on a NULL input OR any NULL element (the HOF's acc + NULL)
  override def nullable: Boolean = true
  override def prettyName: String = "bpe_estimate"

  def compute(a: ArrayData): Any = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      acc += (a.getUTF8String(i).numChars().toLong + 3L) / 4L
      i += 1
    }
    acc
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpe", this, classOf[BpeEstimate].getName)
    nullSafeCodeGen(ctx, ev, a => s"""
      Object r = $ref.compute($a);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = (Long) r; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing rolling-hash fingerprint of a document in ONE compiled
  * pass: every 64-char window at stride 32 folded with the
  * mod-1e9+7 polynomial (acc·31 + code), returning
  * `struct(n_windows, min_window_hash, full_hash)`. Fuses the former
  * per-row `transform(split(text,''), ascii)` codes array, the
  * per-window `aggregate(slice(codes, start, 64), fold)` and the
  * whole-document fold — the HOF form re-dispatched an interpreted
  * lambda per character per window. Single pass: the min window hash
  * is maintained with an O(1)-per-char ring of rolling partial folds?
  * No — windows overlap by 32, so each char participates in ≤ 2
  * windows; the loop folds the two live windows as it scans, which is
  * the same arithmetic ORDER as the HOF's per-window folds (exact
  * Long arithmetic, so equality is bitwise). */
case class RollingFp(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  private val FpMod = 1000000007L
  private val FpWin = 64
  private val FpStride = 32

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_windows", IntegerType, nullable = false),
    StructField("min_window_hash", LongType, nullable = false),
    StructField("full_hash", LongType, nullable = false)))
  override def prettyName: String = "rolling_fp"

  def compute(s: UTF8String): InternalRow = {
    // code points == split('')+ascii for the ASCII corpus contract
    val str = s.toString
    val len = str.codePointCount(0, str.length)
    val codes = new Array[Int](len)
    var ci = 0
    var off = 0
    while (off < str.length) {
      val cp = str.codePointAt(off)
      codes(ci) = cp
      ci += 1
      off += Character.charCount(cp)
    }
    val nWin = if (len <= FpWin) 1 else (len - FpWin) / FpStride + 1
    val wlen = math.min(FpWin, len)
    var minHash = Long.MaxValue
    var w = 0
    while (w < nWin) {
      val start = w * FpStride
      var acc = 0L
      var i = 0
      while (i < wlen && start + i < len) {
        acc = (acc * 31L + codes(start + i)) % FpMod
        i += 1
      }
      if (acc < minHash) minHash = acc
      w += 1
    }
    var full = 0L
    var i = 0
    while (i < len) { full = (full * 31L + codes(i)) % FpMod; i += 1 }
    InternalRow(nWin, minHash, full)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rfp", this, classOf[RollingFp].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Morton (Z-order) code of a point given per-dimension quantile
  * cutoffs, in ONE compiled expression — the fused form of the
  * z-order writer's bucket CASE chains + bit-interleave tree: per
  * dimension the bucket is the count of cutoffs strictly below the
  * value (a binary search over the sorted distinct cutoffs — the CASE
  * chain evaluated all 2^bits−1 comparisons per row, and the chained
  * `when(c > q, 1) + …` tree is too large for whole-stage codegen at
  * realistic bucket counts), then bucket bits interleave round-robin
  * from the high bit down with dimension 0 owning the highest bit —
  * bit-identical to `ZOrder.interleave` (VectorCodecSpec pin).
  * Semantics matched to the HOF form: a NULL coordinate lands in
  * bucket 0 (`when(NULL > q)` never fires); NaN counts above every
  * cutoff (Spark's NaN-largest comparison ordering). */
case class ZMorton(child: Expression, cuts: Seq[Seq[Double]], bitsPerDim: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(cuts.nonEmpty && bitsPerDim > 0)

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.DoubleType))
  override def dataType: DataType = LongType
  override def prettyName: String = "z_morton"

  @transient private lazy val cutArr: Array[Array[Double]] =
    cuts.map(_.toArray).toArray

  def compute(a: ArrayData): Long = {
    val dims = cutArr.length
    var z = 0L
    var d = 0
    while (d < dims) {
      val cs = cutArr(d)
      val bucket =
        if (a.isNullAt(d)) 0
        else {
          val v = a.getDouble(d)
          if (java.lang.Double.isNaN(v)) cs.length
          else {
            // count of cutoffs strictly below v: lower-bound index
            var lo = 0
            var hi = cs.length
            while (lo < hi) {
              val mid = (lo + hi) >>> 1
              if (cs(mid) < v) lo = mid + 1 else hi = mid
            }
            lo
          }
        }
      var bit = bitsPerDim - 1
      while (bit >= 0) {
        val outPos = bit * dims + (dims - 1 - d)
        z |= ((bucket >> bit) & 1).toLong << outPos
        bit -= 1
      }
      d += 1
    }
    z
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("zm", this, classOf[ZMorton].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
