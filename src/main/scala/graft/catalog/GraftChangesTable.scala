package graft.catalog

import graft.table.{CommitChanges, PartitionTransform, TxTable}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util
import scala.jdk.CollectionConverters._

/**
 * `graft.ns.t.changes` — the stored Change Data Feed as a V2 table
 * (the Delta `table_changes` / Iceberg changelog-scan addressing),
 * batch AND streaming:
 *
 *  - `spark.read.option("startingVersion", 2).table("graft.ns.t.changes")`
 *    reads a committed version range of changes;
 *  - `spark.readStream.table("graft.ns.t.changes")` streams every
 *    subsequent commit's changes exactly once, offset = committed
 *    version (the commit log IS the WAL), with `maxFilesPerTrigger`
 *    admission control and `startingVersion` (`N` | `latest`).
 *
 * Schema = table columns + `_change_type`, `_commit_version`,
 * `_commit_timestamp`. Planning is [[TxTable.commitChanges]] per
 * version — stored `_change_data` parquet for DML commits, the
 * commit's own added files (as `insert`) for appends, file moves for
 * overwrites — so each batch plans and reads O(that commit's changes),
 * never the table. Rows are read through Spark's vectorized parquet
 * machinery, then suffixed with the per-commit constants in a
 * row-level reader (CDF reads are change-sized, so losing columnar
 * hand-off on the final append is noise; the parquet decode itself
 * stays vectorized).
 *
 * A commit whose changes are unrecorded (row-level DML without the
 * table property) fails the scan with the same contract as
 * [[TxTable.changeFeed]].
 */
class GraftChangesTable(tx: TxTable) extends Table with SupportsRead {

  private val snap = tx.snapshot
  private val baseSchema: StructType =
    DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
  private val partCols = snap.partitionColumns
  private val partSpec = PartitionTransform.resolve(snap)
  /** stored change files carry every table column (partition columns
    * as ordinary columns) plus the change type */
  private val ctSchema = StructType(
    baseSchema.fields :+ StructField("_change_type", StringType))
  private val outSchema = StructType(baseSchema.fields ++ Seq(
    StructField("_change_type", StringType),
    StructField("_commit_version", LongType),
    StructField("_commit_timestamp", TimestampType)))

  override def name(): String = s"${tx.name}.changes"
  override def schema(): StructType = outSchema
  override def properties(): util.Map[String, String] =
    Map("provider" -> "graft-changes").asJava
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = outSchema
        override def description(): String = s"GraftChanges(${tx.name})"
        override def toBatch: Batch = new Batch {
          private def ms(s: String): Long =
            java.sql.Timestamp.valueOf(s.trim).getTime
          private val from = Option(options.get("startingVersion"))
            .map(_.trim.toLong)
            .orElse(Option(options.get("startingTimestamp"))
              .map(s => tx.firstVersionAtOrAfter(ms(s))))
            .getOrElse(0L)
          private val to = Option(options.get("endingVersion"))
            .map(_.trim.toLong)
            .orElse(Option(options.get("endingTimestamp"))
              .map(s => tx.versionAtOrBefore(ms(s))))
            .getOrElse(tx.currentVersion)
          override def planInputPartitions(): Array[InputPartition] =
            ChangesScan.plan(tx, baseSchema, ctSchema, partCols, partSpec,
              from, to)
          override def createReaderFactory(): PartitionReaderFactory =
            ChangesScan.factory(tx, baseSchema, ctSchema, partCols, partSpec,
              outSchema)
        }
        override def toMicroBatchStream(loc: String): MicroBatchStream =
          new GraftChangesMicroBatchStream(tx, baseSchema, ctSchema,
            partCols, partSpec, outSchema, options)
      }
    }
}

/** One planned slice of a commit's changes: the wrapped parquet
  * partition plus the constants its rows are suffixed with. `stored`
  * picks the reader schema (change parquet carries `_change_type`;
  * synthesized data files don't — `changeType` supplies it). */
private[graft] case class ChangesInputPartition(
    inner: InputPartition,
    stored: Boolean,
    changeType: String,
    version: Long,
    tsMicros: Long) extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

private[catalog] object ChangesScan {

  /** Plan versions `[from, to]` — one `parquetBatch` planning per
    * commit group so no file partition ever spans two commits (the
    * constants differ). Driver cost O(changed files in range). */
  def plan(tx: TxTable, baseSchema: StructType, ctSchema: StructType,
      partCols: Seq[String], partSpec: Seq[graft.table.PartField],
      from: Long, to: Long): Array[InputPartition] = {
    val dataDir = new Path(tx.root, "data")
    val cdDir = tx.changeDataDir
    val conf = tx.spark.sessionState.newHadoopConf()
    (from to to).flatMap { v =>
      tx.commitChanges(v) match {
        case CommitChanges.Stored(files, ts) =>
          val fs = cdDir.getFileSystem(conf)
          val listed = files.map { r =>
            (r, Map.empty[String, String],
              fs.getFileStatus(new Path(cdDir, r)).getLen)
          }
          org.apache.spark.sql.graft.ScanBridge
            .parquetBatch(tx.spark, cdDir, ctSchema, Nil, listed)._1
            .map(p => ChangesInputPartition(p, stored = true, null, v, ts * 1000L))
        case CommitChanges.Inserts(files, ts) =>
          org.apache.spark.sql.graft.ScanBridge
            .parquetBatch(tx.spark, dataDir, baseSchema, partCols,
              files.map(f => (f.path, f.partitionValues, f.sizeBytes)),
              partSpec)._1
            .map(p => ChangesInputPartition(p, stored = false, "insert", v,
              ts * 1000L))
        case CommitChanges.Overwrite(removed, added, ts) =>
          def group(fls: Seq[graft.table.DataFile], ct: String) =
            if (fls.isEmpty) Array.empty[ChangesInputPartition]
            else org.apache.spark.sql.graft.ScanBridge
              .parquetBatch(tx.spark, dataDir, baseSchema, partCols,
                fls.map(f => (f.path, f.partitionValues, f.sizeBytes)),
                partSpec)._1
              .map(p => ChangesInputPartition(p, stored = false, ct, v,
                ts * 1000L))
          // removed files must be read under the PREVIOUS snapshot's
          // MOR state (changeFeed's rule): rows already equality- or
          // position-deleted before this commit are not re-deleted by
          // it. File-level planning can't apply the anti-joins, so
          // when the prior delete state touches the removed files the
          // MOR-filtered pre-images are materialized once and planned
          // as stored change files; the common no-MOR overwrite keeps
          // the zero-copy raw path.
          val removedParts =
            if (removed.isEmpty) Array.empty[ChangesInputPartition]
            else {
              val prev = tx.snapshotAt(v - 1)
              val removedSet = removed.map(_.path).toSet
              val morTouches =
                prev.deletionVectors.exists(d => removedSet.contains(d.dataFile)) ||
                  prev.equalityDeletes.exists(d => removed.exists(_.seq < d.seq))
              if (!morTouches) group(removed, "delete")
              else {
                val listed = tx.synthOverwriteDeletes(v, removed, prev)
                  .map { case (r, len) => (r, Map.empty[String, String], len) }
                org.apache.spark.sql.graft.ScanBridge
                  .parquetBatch(tx.spark, cdDir, ctSchema, Nil, listed)._1
                  .map(p => ChangesInputPartition(p, stored = true, null, v,
                    ts * 1000L))
              }
            }
          removedParts ++ group(added, "insert")
        case CommitChanges.NoChanges => Array.empty[ChangesInputPartition]
      }
    }.toArray
  }

  /** Readers are schema-determined and file-agnostic (built over empty
    * file lists); one pair serves every partition of every batch. */
  def factory(tx: TxTable, baseSchema: StructType, ctSchema: StructType,
      partCols: Seq[String], partSpec: Seq[graft.table.PartField],
      outSchema: StructType): PartitionReaderFactory = {
    val dataDir = new Path(tx.root, "data")
    val storedF = org.apache.spark.sql.graft.ScanBridge
      .parquetBatch(tx.spark, tx.changeDataDir, ctSchema, Nil, Nil)._2
    val synthF = org.apache.spark.sql.graft.ScanBridge
      .parquetBatch(tx.spark, dataDir, baseSchema, partCols, Nil, partSpec)._2
    new ChangesReaderFactory(storedF, synthF, outSchema)
  }
}

private[catalog] class ChangesReaderFactory(
    storedInner: PartitionReaderFactory,
    synthInner: PartitionReaderFactory,
    outSchema: StructType) extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val cp = p.asInstanceOf[ChangesInputPartition]
    val r = (if (cp.stored) storedInner else synthInner).createReader(cp.inner)
    val consts: Array[Any] =
      if (cp.stored) Array(cp.version, cp.tsMicros)
      else Array(UTF8String.fromString(cp.changeType), cp.version, cp.tsMicros)
    val constRow = new GenericInternalRow(consts)
    val joined = new JoinedRow
    val proj = UnsafeProjection.create(outSchema.zipWithIndex.map {
      case (f, i) => BoundReference(i, f.dataType, f.nullable)
    })
    new PartitionReader[InternalRow] {
      override def next(): Boolean = r.next()
      override def get(): InternalRow = proj(joined(r.get(), constRow))
      override def close(): Unit = r.close()
    }
  }
}

/**
 * Micro-batch stream over the change feed: offset = committed version,
 * each batch plans the changes of commits `(start, end]` via the same
 * per-commit resolution as the batch scan. `startingVersion` picks the
 * first commit (`N` replays from version N; `latest` streams only
 * commits after the query starts; default 0 replays the full recorded
 * history). `maxFilesPerTrigger` bounds a catch-up batch by the
 * cumulative change-file count — at least one commit always advances.
 */
private[catalog] class GraftChangesMicroBatchStream(tx: TxTable,
    baseSchema: StructType, ctSchema: StructType,
    partCols: Seq[String], partSpec: Seq[graft.table.PartField],
    outSchema: StructType, options: CaseInsensitiveStringMap)
  extends MicroBatchStream with SupportsAdmissionControl
  with SupportsTriggerAvailableNow {

  private val maxFilesOpt: Option[Int] =
    Option(options.get("maxFilesPerTrigger")).map(_.trim.toInt)

  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(tx.currentVersion)

  override def getDefaultReadLimit: ReadLimit =
    maxFilesOpt.map(ReadLimit.maxFiles(_)).getOrElse(ReadLimit.allAvailable())

  override def initialOffset(): Offset =
    Option(options.get("startingVersion")).map(_.trim) match {
      case None =>
        Option(options.get("startingTimestamp")).map(_.trim) match {
          case Some(t) => GraftOffset(tx.firstVersionAtOrAfter(
            java.sql.Timestamp.valueOf(t).getTime) - 1)
          case None => GraftOffset(-1L)   // replay the full recorded feed
        }
      case Some(s) if s.equalsIgnoreCase("latest") =>
        GraftOffset(tx.currentVersion)    // only commits after start
      case Some(s) =>
        val v = s.toLong
        require(v >= 0, s"startingVersion $v must be >= 0 or 'latest'")
        GraftOffset(v - 1)
    }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def reportLatestOffset(): Offset = GraftOffset(tx.currentVersion)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startV = start.asInstanceOf[GraftOffset].version
    val head = availableNowCap.getOrElse(tx.currentVersion)
    if (head <= startV) return GraftOffset(startV.max(head))
    val maxFiles = limit match {
      case f: ReadMaxFiles => Some(f.maxFiles())
      case _               => None
    }
    if (maxFiles.isEmpty) return GraftOffset(head)
    // cumulative change-file count per admitted commit; O(admitted)
    var v = startV
    var files = 0L
    var done = false
    while (!done && v < head) {
      val cnt = tx.commitChanges(v + 1) match {
        case CommitChanges.Stored(fls, _)       => fls.size
        case CommitChanges.Inserts(fls, _)      => fls.size
        case CommitChanges.Overwrite(rm, ad, _) => rm.size + ad.size
        case CommitChanges.NoChanges            => 0
      }
      val over = maxFiles.exists(files + cnt > _)
      if (over && v > startV) done = true        // ≥1 commit always admitted
      else { v += 1; files += cnt; if (over) done = true }
    }
    GraftOffset(v)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftOffset].version
    val e = end.asInstanceOf[GraftOffset].version
    if (e <= s) return Array.empty
    ChangesScan.plan(tx, baseSchema, ctSchema, partCols, partSpec, s + 1, e)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ChangesScan.factory(tx, baseSchema, ctSchema, partCols, partSpec, outSchema)

  override def deserializeOffset(json: String): Offset =
    GraftOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
