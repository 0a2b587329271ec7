package graft.table

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hadoop `Configuration` is not `Serializable`; this minimal wrapper
  * ships one inside task closures / reader factories (write/readFields
  * round-trip), so executor-side readers can open delete sidecars with
  * the driver's filesystem settings. */
class SerializableConf(@transient var value: Configuration)
  extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/**
 * Deletion-vector sidecar access (sorted little-endian longs — see
 * `TxTable.writeDvFile`), usable on DRIVER and EXECUTORS alike: MOR
 * readers open each data file's sidecar where the task runs instead of
 * shipping positions through the plan, so scan and task payload stay
 * O(1) in DV cardinality however many deletes accumulate (the Iceberg
 * delete-file read path). Sidecars are immutable once written
 * (UUID-named, merged vectors land in NEW files), so the JVM-local
 * cache needs no freshness probe; it is LRU-bounded by total cached
 * positions so a long-lived executor never hoards retired vectors.
 */
object DvStore {
  private val MaxCachedPositions = 4L * 1024 * 1024    // ~32 MB of longs
  private val cache =
    new java.util.LinkedHashMap[String, Array[Long]](64, 0.75f, true)
  private var cachedPositions = 0L

  def positions(absPath: String, conf: Configuration): Array[Long] =
    cache.synchronized {
      val hit = cache.get(absPath)
      if (hit != null) return hit
      val arr = read(absPath, conf)
      cache.put(absPath, arr)
      cachedPositions += arr.length
      val it = cache.entrySet().iterator()
      while (cachedPositions > MaxCachedPositions && it.hasNext) {
        val e = it.next()
        if (e.getKey != absPath) {
          cachedPositions -= e.getValue.length
          it.remove()
        }
      }
      arr
    }

  /** Membership probe over the (sorted — see `TxTable.writeDvFile`)
    * cached positions: the per-row form the lazy MOR filter
    * ([[graft.functions.expressions.DvDeleted]]) uses, so a scan's DV
    * cost is one sidecar load per file the task actually READS plus a
    * binary search per row — never an expansion of every sidecar in
    * the snapshot. */
  def contains(absPath: String, conf: Configuration, pos: Long): Boolean =
    java.util.Arrays.binarySearch(positions(absPath, conf), pos) >= 0

  /** Sidecar FILE loads (cache misses only) — specs pin the lazy MOR
    * filter's touched-files-only property by asserting this counter's
    * delta across a pruned scan. */
  private val loads = new java.util.concurrent.atomic.AtomicLong
  def loadCount: Long = loads.get

  private def read(absPath: String, conf: Configuration): Array[Long] = {
    loads.incrementAndGet()
    val p = new Path(absPath)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen.toInt
    val bytes = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0L, bytes) finally in.close()
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.fill(len / 8)(buf.getLong)
  }
}

/**
 * Executor-side equality-delete key loading: a delete file whose key
 * set is too large to inline into the scan (>
 * `spark.graft.morMaxInlineDeleteKeys`) ships as a PATH, and each
 * reader loads the keys where the task runs — one single-column
 * parquet read through parquet-hadoop's record API, no Spark job.
 * Values convert to the catalyst-internal representations the MOR
 * reader compares against (`InternalRow.get`). Delete files are
 * immutable (UUID-named), so the cache needs no freshness probe.
 * Only types with value-equal catalyst forms are eligible — the
 * planner keeps the rest inline.
 */
object EqKeyStore {

  /** key types eligible for executor-side (deferred) loading */
  def deferrable(dt: DataType): Boolean = dt match {
    case StringType | LongType | IntegerType | ShortType | ByteType |
         BooleanType | DateType | DoubleType | FloatType => true
    case _ => false
  }

  private val MaxCachedSets = 8
  private val cache =
    new java.util.LinkedHashMap[(String, String), Set[Any]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String), Set[Any]]): Boolean =
        size() > MaxCachedSets
    }

  def keys(absPath: String, column: String, dt: DataType,
      conf: Configuration): Set[Any] = cache.synchronized {
    val k = (absPath, column)
    val hit = cache.get(k)
    if (hit != null) return hit
    val loaded = read(absPath, column, dt, conf)
    cache.put(k, loaded)
    loaded
  }

  private def read(absPath: String, column: String, dt: DataType,
      conf: Configuration): Set[Any] = {
    import org.apache.parquet.hadoop.ParquetReader
    import org.apache.parquet.hadoop.example.GroupReadSupport
    val out = Set.newBuilder[Any]
    val dir = new Path(absPath)
    val fs = dir.getFileSystem(conf)
    // deleteMor writes a directory of parquet part files (normally one)
    val parts: Seq[Path] =
      if (fs.getFileStatus(dir).isDirectory)
        fs.listStatus(dir).toSeq.map(_.getPath)
          .filter(_.getName.endsWith(".parquet"))
      else Seq(dir)
    parts.foreach { part =>
      val reader = ParquetReader
        .builder(new GroupReadSupport(), part)
        .withConf(conf)
        .build()
      try {
        var g = reader.read()
        while (g != null) {
          val idx = g.getType.getFieldIndex(column)
          if (g.getFieldRepetitionCount(idx) > 0) out += (dt match {
            case StringType => UTF8String.fromString(g.getString(idx, 0))
            case LongType => g.getLong(idx, 0)
            case IntegerType | DateType => g.getInteger(idx, 0)
            case ShortType => g.getInteger(idx, 0).toShort
            case ByteType => g.getInteger(idx, 0).toByte
            case BooleanType => g.getBoolean(idx, 0)
            case DoubleType => g.getDouble(idx, 0)
            case FloatType => g.getFloat(idx, 0)
            case other => throw new IllegalStateException(
              s"non-deferrable key type $other reached EqKeyStore")
          })
          g = reader.read()
        }
      } finally reader.close()
    }
    out.result()
  }
}
