package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/**
 * Space-Saving heavy hitters (Metwally et al., "Efficient computation
 * of frequent and top-k elements in data streams", ICDT'05) as a
 * `TypedImperativeAggregate`: at most `capacity` counters; an unseen
 * item evicts the minimum counter and inherits its count as error
 * bound, so every reported `count_est` satisfies
 * `true ≤ count_est ≤ true + err`. Summaries MERGE by summing
 * counters keyed by item and re-truncating to the largest `capacity`
 * (Agarwal et al., "Mergeable summaries", PODS'12) — that is what
 * makes this a real distributed aggregate: partial summaries build
 * map-side, only `capacity` counters per partition cross the shuffle,
 * never the stream itself. With `capacity` ≥ distinct items no
 * eviction ever fires anywhere and the counts are EXACT (err 0) — the
 * regime the DuckDB oracle checks; accuracy under eviction is pinned
 * in OperatorsSpec.
 *
 * Returns the `k` largest counters as
 * `array<struct<item, count_est, err>>`, ordered (count desc, item
 * asc) so output is deterministic.
 */
case class SpaceSavingTopK(
    child: Expression,
    k: Int = 10,
    capacity: Int = 1024,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingTopK.Buf] {

  require(k <= capacity, "k must be <= capacity")

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("count_est", LongType),
    StructField("err", LongType))))
  override def nullable: Boolean = false
  override def prettyName: String = "topk_sketch"

  type Buf = SpaceSavingTopK.Buf

  override def createAggregationBuffer(): Buf = new SpaceSavingTopK.Buf()

  private def add(buf: Buf, item: String, count: Long, err: Long): Unit = {
    if (!buf.increment(item, count, err)) {
      if (buf.size < capacity) buf.put(item, count, err)
      else {
        // deterministic eviction victim: min count, then LARGEST key —
        // which counter dies never depends on hash-map iteration order
        val (vk, base) = buf.victim()
        buf.remove(vk)
        buf.evicted = true
        // the evicted count becomes this item's error bound
        buf.put(item, base + count, base + err)
      }
    }
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) add(buf, v.toString, 1L, 0L)
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    // Upper-bound-preserving merge (Agarwal et al., PODS'12): a key
    // absent from a summary that has EVICTED may have had up to that
    // summary's min count absorbed into other counters, so the absent
    // side contributes its min to both the estimate and the error
    // bound. A summary that never evicted (tracked explicitly — being
    // exactly at capacity is not evidence of loss) contributes 0 for
    // absent keys. This keeps `true ≤ count_est ≤ true + err` through
    // any merge tree, and keeps the capacity ≥ distinct regime EXACT.
    // minCount is read BEFORE any mutation (both are pre-merge bounds).
    val mThis = if (buf.evicted) buf.minCount else 0L
    val mOther = if (other.evicted) other.minCount else 0L
    val it = buf.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val o = other.m.get(e.getKey)
      if (o != null) buf.increment(e.getKey, o(0), o(1))
      else if (mOther != 0L) buf.increment(e.getKey, mOther, mOther)
    }
    val it2 = other.m.entrySet().iterator()
    while (it2.hasNext) {
      val e = it2.next()
      if (!buf.m.containsKey(e.getKey))
        buf.put(e.getKey, e.getValue()(0) + mThis, e.getValue()(1) + mThis)
    }
    buf.evicted ||= other.evicted
    // re-truncate to the capacity largest counters; evict smallest
    // counts first, largest keys first on ties
    while (buf.size > capacity) {
      val (vk, _) = buf.victim()
      buf.remove(vk)
      buf.evicted = true
    }
    buf
  }

  override def eval(buf: Buf): Any = {
    val entries = new Array[(String, Long, Long)](buf.m.size)
    var i = 0
    val it = buf.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue()(0), e.getValue()(1)); i += 1
    }
    val top = entries.sortBy { case (item, c, _) => (-c, item) }.take(k)
    new GenericArrayData(top.map { case (item, c, err) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(item), c, err))
    })
  }

  override def serialize(buf: Buf): Array[Byte] = {
    var bytes = 5
    val items = new java.util.ArrayList[(Array[Byte], Array[Long])](buf.m.size)
    val it = buf.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      items.add((b, e.getValue))
      bytes += 4 + b.length + 16
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.put(if (buf.evicted) 1.toByte else 0.toByte)
    bb.putInt(items.size)
    var i = 0
    while (i < items.size) {
      val (b, v) = items.get(i)
      bb.putInt(b.length); bb.put(b); bb.putLong(v(0)); bb.putLong(v(1))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    buf.evicted = bb.get() == 1.toByte
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.put(new String(b, StandardCharsets.UTF_8), bb.getLong, bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object SpaceSavingTopK {
  /**
   * Counters plus a count-ordered index (the Stream-Summary idea with a
   * tree in place of the bucket list): `idx` maps each live count to
   * the ordered set of keys holding it, so the eviction victim —
   * (min count, largest key) — is `idx.firstEntry().getValue.last()`,
   * O(log capacity), where a linear scan made every post-saturation
   * unseen item cost O(capacity) (the exact regime the sketch exists
   * for). Every counter mutation goes through [[put]]/[[increment]]/
   * [[remove]] to keep the two structures in lockstep.
   *
   * `evicted` records whether ANY eviction/truncation has happened in
   * this summary's history — sitting exactly at capacity is NOT
   * evidence of loss, and treating it as such would break the
   * documented "capacity ≥ distinct ⇒ exact, err 0" regime at
   * equality.
   */
  final class Buf extends Serializable {
    val m = new java.util.HashMap[String, Array[Long]]()
    private val idx = new java.util.TreeMap[Long, java.util.TreeSet[String]]()
    var evicted: Boolean = false

    private def idxAdd(key: String, c: Long): Unit = {
      var s = idx.get(c)
      if (s == null) { s = new java.util.TreeSet[String](); idx.put(c, s) }
      s.add(key); ()
    }

    private def idxRemove(key: String, c: Long): Unit = {
      val s = idx.get(c)
      s.remove(key)
      if (s.isEmpty) { idx.remove(c); () }
    }

    def size: Int = m.size

    /** Insert a key known to be absent (or rebuild via deserialize). */
    def put(key: String, count: Long, err: Long): Unit = {
      val prev = m.put(key, Array(count, err))
      if (prev != null) idxRemove(key, prev(0))
      idxAdd(key, count)
    }

    /** Add to an existing counter; false if the key is untracked. */
    def increment(key: String, dCount: Long, dErr: Long): Boolean = {
      val cur = m.get(key)
      if (cur == null) false
      else {
        idxRemove(key, cur(0))
        cur(0) += dCount; cur(1) += dErr
        idxAdd(key, cur(0))
        true
      }
    }

    def remove(key: String): Unit = {
      val cur = m.remove(key)
      if (cur != null) idxRemove(key, cur(0))
    }

    /** (largest key at the minimum count, that count). */
    def victim(): (String, Long) = {
      val e = idx.firstEntry()
      (e.getValue.last(), e.getKey)
    }

    /** min counter value; only meaningful when the buffer has actually
      * evicted (otherwise an absent key truly has count 0 there). */
    def minCount: Long = if (idx.isEmpty) 0L else idx.firstKey()
  }
}
