package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/**
 * Bloom-filter aggregate over Spark's `util.sketch.BloomFilter`:
 * collects the set-membership sketch of `child` per group, returned as
 * the filter's serialized bytes. Values are canonicalized through
 * XxHash64 (seed [[BloomFilterAgg.HashSeed]]) so ANY input type folds
 * to a long both at build time and at probe time — probes must hash
 * the same way (see [[BloomFilterAgg.hashValue]] /
 * [[BloomFilterAgg.mightContain]]).
 *
 * This is the build side of the table's per-file Bloom index
 * (`TxTable.buildBloomIndex` groups by input file): partial filters
 * build executor-side and OR together through the shuffle — the table
 * is scanned exactly once no matter how many files it has.
 */
case class BloomFilterAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double = 0.001,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(math.max(expectedItems, 1L), fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null)
      buf.putLong(XxHash64Function.hash(v, child.dataType, BloomFilterAgg.HashSeed))
    buf
  }

  override def merge(buf: BloomFilter, other: BloomFilter): BloomFilter = {
    buf.mergeInPlace(other)
    buf
  }

  override def eval(buf: BloomFilter): Any = {
    val out = new ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def serialize(buf: BloomFilter): Array[Byte] = eval(buf).asInstanceOf[Array[Byte]]

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object BloomFilterAgg {
  val HashSeed = 7L

  /** Canonical probe-side hash: MUST match update()'s. `value` is a
    * plain Scala/Java value; it is converted to its Catalyst form
    * before hashing. */
  def hashValue(value: Any, dt: DataType): Long = {
    val catalyst = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .convertToCatalyst(value)
    XxHash64Function.hash(catalyst, dt, HashSeed)
  }

  def mightContain(serialized: Array[Byte], value: Any, dt: DataType): Boolean =
    BloomFilter.readFrom(new ByteArrayInputStream(serialized))
      .mightContainLong(hashValue(value, dt))
}
