package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType

/** Column bridges for Spark's built-in Bloom-filter expressions —
  * the machinery behind AQE's injected runtime filters
  * (`InjectRuntimeFilter`), exposed here as a first-class operator:
  * build a Bloom filter over a join's small side with one distributed
  * aggregate, then prune the big side with a codegen'd membership
  * probe BEFORE the shuffle/join. Both sides key on `xxhash64(key)`
  * (the same convention the injected runtime filter uses), so any
  * key type Spark can hash works.
  *
  * The filter itself is sketch-sized (numBits/8 bytes — KBs to a few
  * MB), which is why shipping it through the driver into a literal is
  * the production shape: it is broadcast state, same class as trained
  * ANN codebooks. */
object BloomPrune {

  /** `-n ln(p) / (ln 2)²` — the standard optimal bit count for an
    * expected `n` keys at false-positive rate `fpp`. */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long =
    math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong

  /** Aggregate column producing the serialized Bloom filter (BINARY)
    * of `xxhash64(key)` over the input rows. */
  def bloomFilterAgg(key: Column, expectedItems: Long, fpp: Double): Column =
    ExpressionUtils.column(new BloomFilterAggregate(
      new XxHash64(Seq(ExpressionUtils.expression(key))),
      Literal(expectedItems),
      Literal(optimalNumBits(expectedItems, fpp))).toAggregateExpression())

  /** Membership probe against a built filter: true iff `key` MIGHT be
    * in the set (false positives at ~fpp, never false negatives) —
    * pair with an exact join downstream for exact results. */
  def mightContain(filter: Array[Byte], key: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      Literal(filter, BinaryType),
      new XxHash64(Seq(ExpressionUtils.expression(key)))))
}
