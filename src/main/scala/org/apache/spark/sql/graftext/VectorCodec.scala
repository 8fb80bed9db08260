/** Native vector-codec expressions for the ANN hot paths.
  *
  * r18 optimization (guide §4 "eliminate non-codegen Expressions in
  * the hot path"): the PQ/IVF-PQ encode and the L2-normalize steps
  * were built from higher-order array functions (`transform` /
  * `zip_with` / `aggregate`) — HOFs carry no `doGenCode`, so Spark
  * evaluates them INTERPRETED, allocating an intermediate ArrayData
  * per step and boxing every lambda variable. The PQ argmin alone is
  * M×K l2sq folds = 256 interpreted HOF evaluations per row, and it
  * sits inside the corpus-wide ADC scan. Profiled at sf0.1 (guide
  * §1): the single ADC-scan job ran 2.8 s over 2 000 rows (~1.4 ms/row
  * of pure interpretation overhead) and the typedLit-spliced books
  * inflated the plan enough to cost whole seconds of driver planning.
  *
  * Each expression here replicates its HOF composition's double
  * arithmetic BIT-FOR-BIT (same widening, same fold order, same
  * first-minimum tie-break), so trained codebooks and result rows are
  * unchanged — pinned by VectorCodecSpec, which asserts exact equality
  * against the original HOF formulations. Codegen calls a compiled
  * Scala method via `addReferenceObj` — a JIT'd tight loop, no janino
  * string loops, and the plan carries ONE reference per expression
  * instead of an M×K×SubDim literal forest.
  */
package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Unit-L2 normalization of a FLOAT vector into DOUBLE — the fused
  * form of `transform(cast double) → sqrt(aggregate(x*x)) → divide`:
  * widen each element, accumulate Σx² in array order, divide unless
  * the norm is exactly 0.0 (then return the widened vector as-is,
  * matching the HOF `when(n === 0.0, d)` branch).
  *
  * INPUT CONTRACT (r19, per review): elements must be NON-NULL — the
  * embeddings table's vectors are dense fixed-width floats, and every
  * call site feeds that column. A null slot would read as 0.0 here
  * where the replaced HOF null-propagated the whole norm; there is no
  * such slot in any feed, and the corpus-wide VectorCodecSpec
  * equality pin would catch a feed that grew one. */
case class L2NormalizeDouble(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "l2_normalize"

  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val d = new Array[Double](n)
    var ss = 0.0
    var i = 0
    while (i < n) {
      val v = a.getFloat(i).toDouble
      d(i) = v
      ss += v * v
      i += 1
    }
    val norm = math.sqrt(ss)
    if (norm != 0.0) {
      i = 0
      while (i < n) { d(i) = d(i) / norm; i += 1 }
    }
    new GenericArrayData(d)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("l2n", this, classOf[L2NormalizeDouble].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared PQ codebook math — one implementation of the argmin/
  * reconstruct loops so the training path and the ADC scan cannot
  * disagree on a borderline code (the `argminCodeIn` single-source
  * contract, kept). Books are M × K × SubDim. */
private[graftext] final class PqBooks(val books: Array[Array[Array[Double]]])
    extends Serializable {
  val m: Int = books.length
  val k: Int = if (m == 0) 0 else books(0).length
  val subDim: Int = if (k == 0) 0 else books(0)(0).length

  /** First-minimum argmin of Σ(x−c)² over book `mi`, reading the
    * subvector at offset mi*subDim of `vec`. Fold order and the
    * array_min/array_position first-minimum tie-break replicate the
    * HOF form exactly. */
  def argmin(vec: ArrayData, mi: Int): Int = {
    val base = mi * subDim
    val book = books(mi)
    var best = 0
    var bestScore = Double.NaN
    var kk = 0
    while (kk < k) {
      val c = book(kk)
      var s = 0.0
      var i = 0
      while (i < subDim) {
        val d = vec.getDouble(base + i) - c(i)
        s += d * d
        i += 1
      }
      // strict < keeps the FIRST minimum (array_position semantics)
      if (kk == 0 || s < bestScore) { best = kk; bestScore = s }
      kk += 1
    }
    best
  }
}

/** Fused PQ encode+decode: per subspace the argmin code's centroid,
  * concatenated — the native form of `reconstructionOf` (flatten of
  * M element_at/argmin HOF trees). Input ARRAY<DOUBLE> (a normalized
  * vector or an IVF residual), output ARRAY<DOUBLE> of length
  * M×SubDim. */
case class PqReconstruct(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_reconstruct"

  @transient private lazy val pq =
    new PqBooks(books.map(_.map(_.toArray).toArray).toArray)

  def compute(vec: ArrayData): ArrayData = {
    val out = new Array[Double](pq.m * pq.subDim)
    var mi = 0
    while (mi < pq.m) {
      val c = pq.books(mi)(pq.argmin(vec, mi))
      System.arraycopy(c, 0, out, mi * pq.subDim, pq.subDim)
      mi += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqr", this, classOf[PqReconstruct].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native argmin code for ONE exploded training row (m, sub): the
  * codegen form of `argminCode(booksLit, m, sub)` — sub is the
  * SubDim-length subvector, m selects the codebook at runtime. */
case class PqArgminAt(left: Expression, right: Expression,
                      books: Seq[Seq[Seq[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(IntegerType, ArrayType(DoubleType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "pq_argmin_at"

  @transient private lazy val pq =
    new PqBooks(books.map(_.map(_.toArray).toArray).toArray)

  /** Exploded rows carry the subvector alone — index from offset 0 of
    * a standalone SubDim array by reusing the shared loop with a
    * zero-based view.
    *
    * NaN note (r19, per review): distances here are Σ(x−c)² over
    * finite trained centroids and finite inputs — never NaN in any
    * feed. Under a hypothetical NaN input this first-minimum loop
    * (NaN comparisons false ⇒ code 0) and the replaced
    * `array_min`/`array_position` HOF (NaN-greatest ordering) could
    * disagree; the finite-input contract is what the corpus-wide
    * VectorCodecSpec equality pin guards. */
  def compute(mi: Int, sub: ArrayData): Int = {
    val book = pq.books(mi)
    var best = 0
    var bestScore = Double.NaN
    var kk = 0
    while (kk < pq.k) {
      val c = book(kk)
      var s = 0.0
      var i = 0
      while (i < pq.subDim) {
        val d = sub.getDouble(i) - c(i)
        s += d * d
        i += 1
      }
      if (kk == 0 || s < bestScore) { best = kk; bestScore = s }
      kk += 1
    }
    best
  }

  override def nullSafeEval(m: Any, sub: Any): Any =
    compute(m.asInstanceOf[Int], sub.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqa", this, classOf[PqArgminAt].getName)
    nullSafeCodeGen(ctx, ev, (m, sub) => s"${ev.value} = $ref.compute($m, $sub);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Sequential EWMA fold over a collected history array — the native
  * form of `aggregate(hist, seed, (acc, x) => α·x + (1−α)·acc)`: same
  * doubles, same order, one JIT'd loop instead of an interpreted
  * lambda per element (the fold runs once PER ROW over that row's
  * whole history window, so the HOF cost was O(len²) interpreted
  * steps per series). */
case class EwmaFold(left: Expression, right: Expression, alpha: Double)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "ewma_fold"

  private val beta = 1 - alpha

  def compute(hist: ArrayData, seed: Double): Double = {
    var acc = seed
    val n = hist.numElements()
    var i = 0
    while (i < n) {
      acc = alpha * hist.getDouble(i) + beta * acc
      i += 1
    }
    acc
  }

  override def nullSafeEval(hist: Any, seed: Any): Any =
    compute(hist.asInstanceOf[ArrayData], seed.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ewf", this, classOf[EwmaFold].getName)
    nullSafeCodeGen(ctx, ev, (h, s) => s"${ev.value} = $ref.compute($h, $s);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** LSH band values: the sign bits of `planes` dot products, packed
  * per `bitsPerBand`-bit band — the native form of the per-band
  * `when(dot(emb, planeLit) > 0, 1<<bit)` HOF sum (16 interpreted
  * zip_with+aggregate dots per row). Input ARRAY<FLOAT>, output
  * ARRAY<INT> of length planes/bitsPerBand; dot folds in array order
  * with float→double widening, bit set iff dot > 0 — bit-identical
  * band values.
  *
  * INPUT CONTRACT (r19, per review): vectors are NON-NULL,
  * plane-width (64-dim) dense floats — the embeddings column every
  * call site feeds. A NULL embedding here nulls the whole band array
  * (posexplode then drops the row) where the HOF emitted band 0
  * rows, and a length-mismatched vector truncates the dot at
  * min(len, 64); neither shape exists in any feed, and the
  * corpus-wide VectorCodecSpec pin would catch one growing. */
case class LshBandVals(child: Expression, planes: Seq[Seq[Double]],
                       bitsPerBand: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lsh_band_vals"

  @transient private lazy val p: Array[Array[Double]] = planes.map(_.toArray).toArray

  def compute(a: ArrayData): ArrayData = {
    val bands = p.length / bitsPerBand
    val out = new Array[Int](bands)
    var bnd = 0
    while (bnd < bands) {
      var v = 0
      var bit = 0
      while (bit < bitsPerBand) {
        val h = p(bnd * bitsPerBand + bit)
        val n = math.min(a.numElements(), h.length)
        var dot = 0.0
        var i = 0
        while (i < n) { dot += a.getFloat(i).toDouble * h(i); i += 1 }
        if (dot > 0) v |= (1 << bit)
        bit += 1
      }
      out(bnd) = v
      bnd += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshb", this, classOf[LshBandVals].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-shingle 60-bit md5 fold modulo the Mersenne prime 2³¹−1 — the
  * native form of `transform(set, s → pmod(conv(substr(md5(s),1,15),
  * 16,10) AS LONG, P))`: the first 15 hex chars of the md5 digest ARE
  * its top 60 bits, so the digest's first 8 bytes yield the value
  * directly without materializing a 32-char hex string per element.
  * Input ARRAY<STRING>, output ARRAY<LONG> (null elements preserved —
  * transform maps NULL to NULL). */
case class H60FoldArray(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  private val P = (1L << 31) - 1

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "h60_fold"

  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) out(i) = null
      else {
        md.reset()
        val d = md.digest(a.getUTF8String(i).getBytes)
        // top 60 bits of the digest == BIGINT of its first 15 hex chars
        var v = 0L
        var b = 0
        while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
        v = (v << 4) | ((d(7) >> 4) & 0xfL)
        out(i) = v % P
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("h60f", this, classOf[H60FoldArray].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All k MinHash signature minima in ONE pass — the native form of k
  * independent `array_min(transform(hashes, h → (h·aᵢ + bᵢ) mod P))`
  * columns: one loop over the fold array updates every signature's
  * running minimum (exact integer arithmetic — bit-identical by
  * construction). Output ARRAY<LONG> of length k; an empty or
  * all-null input yields NULL elements (array_min of an empty/null
  * projection is NULL). */
case class MinhashSigs(child: Expression, params: Seq[(Long, Long)])
    extends UnaryExpression with ImplicitCastInputTypes {

  private val P = (1L << 31) - 1

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sigs"

  @transient private lazy val as: Array[Long] = params.map(_._1).toArray
  @transient private lazy val bs: Array[Long] = params.map(_._2).toArray

  def compute(h: ArrayData): ArrayData = {
    val k = as.length
    val mins = new Array[Long](k)
    val seen = new Array[Boolean](k)
    val n = h.numElements()
    var i = 0
    while (i < n) {
      if (!h.isNullAt(i)) {
        val hv = h.getLong(i)
        var j = 0
        while (j < k) {
          val s = (hv * as(j) + bs(j)) % P
          if (!seen(j) || s < mins(j)) { mins(j) = s; seen(j) = true }
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](k)
    var j = 0
    while (j < k) { out(j) = if (seen(j)) java.lang.Long.valueOf(mins(j)) else null; j += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mhs", this, classOf[MinhashSigs].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct k-token shingles of a token array — the native form of
  * `when(size(toks) >= k, array_distinct(transform(sequence(1,
  * n−k+1), i → concat_ws(" ", toks[i…i+k−1])))).otherwise(empty)`:
  * one pass building each window's space-joined string and keeping
  * first occurrences (array_distinct order). Short token lists yield
  * the empty array (the `when` branch, folded in). Null elements
  * cannot occur in regexp_extract_all output; concat_ws semantics for
  * the non-null case are plain space-joining. */
case class ShinglesOf(child: Expression, k: Int, distinct: Boolean = true)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "shingles_of"

  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    // LinkedHashSet when distinct (array_distinct first-occurrence
    // order); ArrayList when duplicates are the signal (the
    // repetition/bigram family keeps every window)
    val out: java.util.Collection[org.apache.spark.unsafe.types.UTF8String] =
      if (distinct) new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
      else new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String](n - k + 1)
    var i = 0
    while (i <= n - k) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      out.add(org.apache.spark.unsafe.types.UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    new GenericArrayData(out.toArray(Array.empty[AnyRef]).asInstanceOf[Array[Any]])
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shg", this, classOf[ShinglesOf].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorCodec {
  def l2normalize(v: Column): Column =
    ExpressionUtils.column(L2NormalizeDouble(ExpressionUtils.expression(v)))
  def pqReconstruct(v: Column, books: Seq[Seq[Seq[Double]]]): Column =
    ExpressionUtils.column(PqReconstruct(ExpressionUtils.expression(v), books))
  def pqArgminAt(m: Column, sub: Column, books: Seq[Seq[Seq[Double]]]): Column =
    ExpressionUtils.column(PqArgminAt(
      ExpressionUtils.expression(m), ExpressionUtils.expression(sub), books))
  def ewmaFold(hist: Column, seed: Column, alpha: Double): Column =
    ExpressionUtils.column(EwmaFold(
      ExpressionUtils.expression(hist), ExpressionUtils.expression(seed), alpha))
  def lshBandVals(emb: Column, planes: Seq[Seq[Double]], bitsPerBand: Int): Column =
    ExpressionUtils.column(LshBandVals(
      ExpressionUtils.expression(emb), planes, bitsPerBand))
  def h60Fold(set: Column): Column =
    ExpressionUtils.column(H60FoldArray(ExpressionUtils.expression(set)))
  def minhashSigs(h60s: Column, params: Seq[(Long, Long)]): Column =
    ExpressionUtils.column(MinhashSigs(ExpressionUtils.expression(h60s), params))
  def shinglesOf(tokens: Column, k: Int, distinct: Boolean = true): Column =
    ExpressionUtils.column(ShinglesOf(ExpressionUtils.expression(tokens), k, distinct))
  def boundedCollectSet(c: Column, cap: Int): Column =
    ExpressionUtils.column(
      BoundedCollectSet(ExpressionUtils.expression(c), cap).toAggregateExpression())
  def bpeEstimate(tokens: Column): Column =
    ExpressionUtils.column(BpeEstimate(ExpressionUtils.expression(tokens)))
  def rollingFp(text: Column): Column =
    ExpressionUtils.column(RollingFp(ExpressionUtils.expression(text)))
  def zMorton(point: Column, cuts: Seq[Seq[Double]], bitsPerDim: Int): Column =
    ExpressionUtils.column(ZMorton(ExpressionUtils.expression(point), cuts, bitsPerDim))
}
