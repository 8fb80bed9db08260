package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, DataTypes, IntegerType, StructType}

/** The catalog's `bucket(n, col)` partition-transform function — the
  * piece that makes storage-partitioned joins plan (the Iceberg SPJ
  * design, SPARK-37375): both sides of a join over same-bucketed
  * [[GraftCatalog]] tables report `KeyGroupedPartitioning(bucket(n,
  * k))`, Spark resolves THIS function through the catalog's
  * `FunctionCatalog` surface, sees the two `TransformExpression`s are
  * the same function over the join keys, and elides BOTH exchanges —
  * at 100 TB the shuffle is usually the entire cost of a fact⋈fact
  * join, and bucketing amortizes it into the write.
  *
  * Semantics: `pmod(xxhash64(value), n)` — the hash is Spark's own
  * `XxHash64Function` (seed 42, identical to the `xxhash64()` SQL
  * function the write path uses to lay files out), so the function
  * the optimizer reasons with and the layout on disk can never
  * disagree. NULL keys hash to the seed, exactly like the catalyst
  * expression. */
private[sources] object GraftBucketFunction extends UnboundFunction {

  override def name(): String = "bucket"

  override def description(): String =
    "bucket(n, col): pmod(xxhash64(col), n) — graft storage-partitioning transform"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
      inputType.fields(0).dataType == IntegerType,
      s"bucket expects (int numBuckets, key), got ${inputType.catalogString}")
    val keyType = inputType.fields(1).dataType
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
      override def resultType(): DataType = DataTypes.IntegerType
      override def name(): String = "bucket"
      // canonical identity is what KeyGroupedShuffleSpec compares —
      // two scans report compatible partitioning iff this matches
      override def canonicalName(): String = s"graft.bucket(${keyType.catalogString})"
      override def isResultNullable: Boolean = false
      override def isDeterministic: Boolean = true
      override def produceResult(input: InternalRow): Integer = {
        val n = input.getInt(0)
        Integer.valueOf(GraftBucketFunction.bucketOf(
          if (input.isNullAt(1)) null else input.get(1, keyType), keyType, n))
      }
    }
  }

  /** pmod(xxhash64(value), n) on an INTERNAL value — the single
    * definition both the write layout and the planner function use. */
  def bucketOf(value: Any, dataType: DataType, n: Int): Int = {
    // createTable validates its layout's numBuckets, but this function
    // is also SQL-callable (SELECT graft.system.bucket(0, x)) — fail
    // with a message instead of a raw division ArithmeticException
    require(n > 0, s"bucket(n, col) requires n > 0, got $n")
    val h =
      if (value == null) 42L // xxhash64 of a NULL child leaves the seed
      else org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        value, dataType, 42L)
    (((h % n) + n) % n).toInt
  }
}

/** The catalog's `days(col)` partition-transform function — the date
  * half of the storage-partitioned-join surface (the reference's
  * bronze layout, `bronze_ingestion.py:113`). Semantics: days since
  * epoch of the column's date — which is exactly DATE's internal
  * representation, so on date inputs the planner function is the
  * identity; timestamps floor-divide their micros by a day. NULL
  * inputs return NULL (a null layout value lands in the null
  * partition directory, same as Iceberg). */
private[sources] object GraftDaysFunction extends UnboundFunction {

  override def name(): String = "days"

  override def description(): String =
    "days(col): days since epoch of the column's date — graft storage-partitioning transform"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1 &&
      (inputType.fields(0).dataType == DataTypes.DateType ||
        inputType.fields(0).dataType == DataTypes.TimestampType),
      s"days expects (date|timestamp), got ${inputType.catalogString}")
    val keyType = inputType.fields(0).dataType
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] = Array(keyType)
      override def resultType(): DataType = DataTypes.IntegerType
      override def name(): String = "days"
      override def canonicalName(): String = s"graft.days(${keyType.catalogString})"
      override def isResultNullable: Boolean = true
      override def isDeterministic: Boolean = true
      override def produceResult(input: InternalRow): Integer =
        if (input.isNullAt(0)) null
        else if (keyType == DataTypes.DateType) Integer.valueOf(input.getInt(0))
        else Integer.valueOf(
          java.lang.Math.floorDiv(input.getLong(0), 86400000000L).toInt)
    }
  }
}
