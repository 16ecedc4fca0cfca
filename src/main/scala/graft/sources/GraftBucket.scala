package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** The snapshot format's BUCKET transform — `PARTITIONED BY
  * (bucket(n, k))` at CREATE TABLE (the Iceberg hash-bucket layout,
  * re-expressed on Spark's public V2 function machinery):
  *
  *   - ONE deterministic hash ([[GraftBucket.of]]: Murmur3 of the
  *     widened long / the raw UTF-8 bytes, seed 42) is shared by every
  *     consumer — the write-side shuffle (Spark evaluates the V2
  *     function to route rows), the rolling writer's file cuts (each
  *     data file holds exactly one bucket, recorded as a `__bucket`
  *     min==max manifest stat), the scan's reported
  *     `KeyGroupedPartitioning(bucket(n, k))` (storage-partitioned
  *     joins: two tables bucketed with the same (n, key-equi) join
  *     with ZERO exchange), and equality-filter file pruning
  *     (`k = v` plans only bucket(v)'s files).
  *   - The function reaches Spark through [[SnapshotCatalog]]'s
  *     FunctionCatalog arm: `DistributionAndOrderingUtils` resolves a
  *     write's required distribution and `V2ScanPartitioningAndOrdering`
  *     a scan's reported keys by loading `bucket` from the table's own
  *     catalog and binding it to the column type — exactly how
  *     catalog-managed bucket transforms are meant to compose
  *     (SPJ compatibility = same canonical name + same bucket count).
  *
  * Unlike identity clustering (partition-grade key cardinalities,
  * exact partitioner), bucketing serves HIGH-cardinality keys at a
  * FIXED file-count budget: at 100 TB, `bucket(1024, order_id)` keeps
  * one manifest stat per file, prunes point lookups 1024x, and
  * co-partitions every self-/fact-fact join on the key with zero
  * shuffle — the layout a table this size actually wants.
  *
  * Reference semantics: weso/wd2duckdb keeps per-table hash indexes
  * for id-equality lookups (src/database/mod.rs:61); the distributed
  * re-expression is a hash-bucketed file layout whose "index probe" is
  * manifest-stat pruning.
  */
object GraftBucket {

  private val Seed = 42

  /** Bucket of a widened integral key (Byte/Short/Int widen to Long —
    * the same widening the rolling writer's keyOf applies, so a value
    * hashes identically whatever physical width it rode in on). */
  def of(v: Long, n: Int): Int =
    (Murmur3_x86_32.hashLong(v, Seed) & Int.MaxValue) % n

  /** Bucket of a string key — Murmur3 over the raw UTF-8 bytes. */
  def of(v: UTF8String, n: Int): Int =
    (Murmur3_x86_32.hashUnsafeBytes(v.getBaseObject, v.getBaseOffset,
      v.numBytes, Seed) & Int.MaxValue) % n

  /** Bucket of a plain JVM value (prune-time filter literals). */
  def ofAny(v: Any, n: Int): Option[Int] = v match {
    case b: Byte        => Some(of(b.toLong, n))
    case s: Short       => Some(of(s.toLong, n))
    case i: Int         => Some(of(i.toLong, n))
    case l: Long        => Some(of(l, n))
    case s: String      => Some(of(UTF8String.fromString(s), n))
    case u: UTF8String  => Some(of(u, n))
    case _              => None
  }

  /** Column types the bucket transform accepts. */
  def supports(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType => true
    case _ => false
  }
}

/** The `bucket` function [[SnapshotCatalog]] serves as a V2
  * FunctionCatalog: Spark binds it against `(int numBuckets, key)` when
  * resolving a bucketed write's required distribution or a bucketed
  * scan's reported partitioning. Both bound variants share
  * [[GraftBucket]]'s hash, and their `canonicalName` carries the key
  * type — SPJ's same-function check must never equate a long-hash
  * bucket with a string-hash one. */
object GraftBucketUnbound extends UnboundFunction {

  override def name(): String = "bucket"

  override def description(): String =
    "bucket(numBuckets, col): deterministic hash bucket of an integral or string key"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets, col), got ${inputType.simpleString}")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket's first argument is the int bucket count, got " +
        inputType.fields(0).dataType.simpleString)
    inputType.fields(1).dataType match {
      case dt @ (ByteType | ShortType | IntegerType | LongType) =>
        new GraftBucketLong(dt)
      case StringType => GraftBucketString
      case other => throw new UnsupportedOperationException(
        s"bucket key type ${other.simpleString} is not supported — " +
          "integral and string keys only")
    }
  }
}

private[sources] class GraftBucketLong(keyType: DataType)
    extends ScalarFunction[Integer] {
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket(long)"
  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def isResultNullable(): Boolean = false

  /** Magic-method fast path (codegen'd StaticInvoke-style dispatch). */
  def invoke(n: Int, v: Long): Int = GraftBucket.of(v, n)

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    val v = keyType match {
      case ByteType    => input.getByte(1).toLong
      case ShortType   => input.getShort(1).toLong
      case IntegerType => input.getInt(1).toLong
      case _           => input.getLong(1)
    }
    GraftBucket.of(v, n)
  }
}

private[sources] object GraftBucketString extends ScalarFunction[Integer] {
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket(string)"
  override def inputTypes(): Array[DataType] = Array(IntegerType, StringType)
  override def resultType(): DataType = IntegerType
  override def isResultNullable(): Boolean = false

  def invoke(n: Int, v: UTF8String): Int = GraftBucket.of(v, n)

  override def produceResult(input: InternalRow): Integer =
    GraftBucket.of(input.getUTF8String(1), input.getInt(0))
}

/** The TRUNCATE transform — `PARTITIONED BY (truncate(w, k))`: width-w
  * value truncation (floored, so negatives group correctly), the
  * ORDER-PRESERVING sibling of bucket. Each data file holds one
  * truncate group (stamped `__trunc` min==max), so co-truncated tables
  * equi-join with zero exchange (SPJ over the transform group) AND
  * range reads prune from the raw column's per-file stats, which the
  * grouped layout makes disjoint by construction — the layout for keys
  * that are both joined on and range-scanned. Integral keys only
  * (string prefixes don't compose with the integer stat channel). */
object GraftTruncate {
  /** Floored width-w truncation: -3 at width 10 lands in group -10. */
  def of(v: Long, w: Int): Long = Math.floorDiv(v, w.toLong) * w
}

/** Width-PARAMETERIZED single-argument variant (`truncate_<w>(col)`)
  * — what the write distribution and the scan's KeyGroupedPartitioning
  * actually report: Spark's clustering-satisfaction check flatMaps
  * `collectLeaves()` over the partition transforms, so a transform
  * carrying a LITERAL child (the width) can never satisfy a join's
  * ClusteredDistribution (bucket only escapes because Spark factors
  * its literal into numBucketsOpt). Folding the width into the
  * function name keeps the children reference-only; the canonical
  * name carries the width, so SPJ never equates different widths. */
final case class GraftTruncateWUnbound(w: Int) extends UnboundFunction {
  override def name(): String = s"truncate_$w"
  override def description(): String =
    s"truncate_$w(col): floored width-$w truncation of an integral key"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1,
      s"truncate_$w takes (col), got ${inputType.simpleString}")
    inputType.fields(0).dataType match {
      case dt @ (ByteType | ShortType | IntegerType | LongType) =>
        new GraftTruncateWLong(dt, w)
      case other => throw new UnsupportedOperationException(
        s"truncate key type ${other.simpleString} is not supported — integral keys only")
    }
  }
}

private[sources] class GraftTruncateWLong(keyType: DataType, w: Int)
    extends ScalarFunction[java.lang.Long] {
  override def name(): String = s"truncate_$w"
  override def canonicalName(): String = s"graft.truncate(long,$w)"
  override def inputTypes(): Array[DataType] = Array(keyType)
  override def resultType(): DataType = LongType
  override def isResultNullable(): Boolean = false

  def invoke(v: Long): Long = GraftTruncate.of(v, w)

  override def produceResult(input: InternalRow): java.lang.Long = {
    val v = keyType match {
      case ByteType    => input.getByte(0).toLong
      case ShortType   => input.getShort(0).toLong
      case IntegerType => input.getInt(0).toLong
      case _           => input.getLong(0)
    }
    GraftTruncate.of(v, w)
  }
}

object GraftTruncateUnbound extends UnboundFunction {
  override def name(): String = "truncate"
  override def description(): String =
    "truncate(width, col): floored width-w truncation of an integral key"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"truncate takes (width, col), got ${inputType.simpleString}")
    require(inputType.fields(0).dataType == IntegerType,
      s"truncate's first argument is the int width, got " +
        inputType.fields(0).dataType.simpleString)
    inputType.fields(1).dataType match {
      case dt @ (ByteType | ShortType | IntegerType | LongType) =>
        new GraftTruncateLong(dt)
      case other => throw new UnsupportedOperationException(
        s"truncate key type ${other.simpleString} is not supported — integral keys only")
    }
  }
}

private[sources] class GraftTruncateLong(keyType: DataType)
    extends ScalarFunction[java.lang.Long] {
  override def name(): String = "truncate"
  override def canonicalName(): String = "graft.truncate(long)"
  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = LongType
  override def isResultNullable(): Boolean = false

  def invoke(w: Int, v: Long): Long = GraftTruncate.of(v, w)

  override def produceResult(input: InternalRow): java.lang.Long = {
    val w = input.getInt(0)
    val v = keyType match {
      case ByteType    => input.getByte(1).toLong
      case ShortType   => input.getShort(1).toLong
      case IntegerType => input.getInt(1).toLong
      case _           => input.getLong(1)
    }
    GraftTruncate.of(v, w)
  }
}
