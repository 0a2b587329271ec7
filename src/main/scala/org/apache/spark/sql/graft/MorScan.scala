package org.apache.spark.sql.graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsReportStatistics}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** An outstanding deletion vector as the scan plans it: the sidecar's
  * ABSOLUTE path plus its cardinality (from commit metadata). The
  * positions themselves never enter the plan — readers open the
  * sidecar executor-side ([[_root_.graft.table.DvStore]]), so task
  * payload is O(1) in accumulated delete state. */
case class DvRef(sidecar: String, count: Long)

/** An equality-delete file too large to inline as a key set: readers
  * load the keys executor-side ([[_root_.graft.table.EqKeyStore]]). */
case class DeferredEqDelete(path: String, column: String)

/**
 * One seq-group of a merge-on-read scan: the files that share the same
 * set of applicable equality deletes, plus the (already-loaded) deleted
 * key values per key column — catalyst-INTERNAL values, so the reader
 * compares row values directly.
 */
case class MorGroup(
    files: Seq[(String, Map[String, String], Long)],
    statsByPath: Map[String, Map[String, _root_.graft.table.ColStats]],
    deletedKeys: Map[String, Set[Any]],
    /** outstanding DELETION VECTORS by file path — sidecar REFERENCES,
      * resolved executor-side. DV'd files plan one-file sub-scans with
      * only partition filters pushed (no data pushdown → no row-group
      * skipping → the reader's running count IS the file row index,
      * reconstructed per split from footer metadata). */
    dvByPath: Map[String, DvRef] = Map.empty,
    /** equality deletes whose key sets exceeded the inline threshold
      * (`spark.graft.morMaxInlineDeleteKeys`) */
    deferredKeys: Seq[DeferredEqDelete] = Nil)

/**
 * Scan builder for a graft table with OUTSTANDING merge-on-read
 * equality deletes (the Iceberg v2 read path): files are grouped by
 * which deletes apply to them (`file.seq < delete.seq`), each group
 * plans through Spark's own parquet scan over a snapshot-pinned
 * sub-index, and the reader drops rows whose key is in the group's
 * deleted-key set before projecting to the requested columns. The key
 * columns are force-included in each group's read schema even when the
 * query prunes them (a `SELECT count(*)` still has to see which rows
 * are deleted), and aggregate pushdown is deliberately NOT offered —
 * a footer-level count would count deleted rows.
 *
 * The whole scan reads row-wise (Spark rejects mixed row/columnar
 * partitions) — the merge-on-read tax Iceberg's readers pay too, until
 * compaction applies the deletes
 * ([[_root_.graft.table.TxTable.compact]] clears them).
 */
class MorScanBuilder(
    spark: SparkSession,
    dataDir: Path,
    fullSchema: StructType,
    partitionColumns: Seq[String],
    groups: Seq[MorGroup],
    /** forward only partition-column conjuncts to the group scans
      * (group-based row-level operations must read whole file groups) */
    partitionFiltersOnly: Boolean,
    /** hidden-partitioning spec (fullSchema then includes the derived
      * string fields); requested columns never include them */
    partSpec: Seq[_root_.graft.table.PartField] = Nil)
  extends SupportsPushDownCatalystFilters
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {

  private val keyColumns: Seq[String] =
    (groups.flatMap(_.deletedKeys.keys) ++
      groups.flatMap(_.deferredKeys.map(_.column))).distinct

  // default to the TABLE schema (derived hidden-partition fields are
  // scan-internal — never part of a result)
  private var requested: StructType = StructType(fullSchema.filterNot(f =>
    partSpec.exists(p => !p.isIdentity && p.name == f.name)))
  private var pushed: Seq[org.apache.spark.sql.catalyst.expressions.Expression] = Nil
  private var pushedReport
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    Array.empty

  // capture indexes so group-based row-level operations can recover the
  // exact file groups their scan listed
  val indexes = scala.collection.mutable.ArrayBuffer.empty[SnapshotFileIndex]

  override def pushFilters(
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = {
    pushed =
      if (!partitionFiltersOnly) filters
      else filters.filter(f => f.references.nonEmpty && f.deterministic &&
        f.references.forall(a => partitionColumns.contains(a.name)))
    if (partitionFiltersOnly) filters        // everything stays residual
    else {
      // residuals mirror a plain parquet builder: partition-only
      // conjuncts are fully handled by pruning; data conjuncts must be
      // re-checked above the scan (parquet pushdown is row-group level,
      // and the MOR reader only filters DELETED rows)
      val (partOnly, rest) = filters.partition(f => f.references.nonEmpty &&
        f.deterministic &&
        f.references.forall(a => partitionColumns.contains(a.name)))
      // report data filters as pushed for plan visibility via a probe
      // builder (best-effort)
      val probe = newGroupBuilder(groups.headOption.getOrElse(
        MorGroup(Nil, Map.empty, Map.empty)))
      probe.pushFilters(filters)
      pushedReport = probe.pushedFilters
      rest
    }
  }

  override def pushedFilters()
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    pushedReport

  override def pruneColumns(requiredSchema: StructType): Unit =
    requested = requiredSchema

  private def newGroupBuilder(g: MorGroup): ParquetScanBuilder = {
    val index = new SnapshotFileIndex(spark, dataDir, fullSchema,
      partitionColumns, g.files, g.statsByPath, partSpec)
    indexes += index
    val dataSchema =
      StructType(fullSchema.filterNot(f => partitionColumns.contains(f.name)))
    ParquetScanBuilder(spark, index, fullSchema, dataSchema,
      CaseInsensitiveStringMap.empty())
  }

  override def build(): Scan = {
    // each group reads the requested columns PLUS its key columns
    val readCols: Seq[String] = {
      val req = requested.fieldNames.toSeq
      req ++ keyColumns.filterNot(req.contains)
    }
    val readSchemaForGroups = StructType(
      fullSchema.filter(f => readCols.contains(f.name)))
    indexes.clear()
    // partition-only conjuncts are safe to push into positional
    // sub-scans: they prune whole files at the index, never row groups,
    // so the reader still sees every row of an included file in order
    val partOnlyPushed = pushed.filter(f => f.references.nonEmpty &&
      f.deterministic &&
      f.references.forall(a => partitionColumns.contains(a.name)))
    // one sub-scan per (group, plain-files) + one per DV'd file
    val subScans: Seq[(Scan, MorGroup, Option[(String, DvRef)])] =
      groups.flatMap { g =>
        val (dvFiles, plain) = g.files.partition(f => g.dvByPath.contains(f._1))
        val plainScan =
          if (plain.isEmpty) Nil
          else {
            val b = newGroupBuilder(g.copy(files = plain))
            b.pushFilters(pushed)
            b.pruneColumns(readSchemaForGroups)
            Seq((b.build(), g, Option.empty[(String, DvRef)]))
          }
        val dvScans = dvFiles.map { f =>
          val b = newGroupBuilder(g.copy(files = Seq(f)))
          b.pushFilters(partOnlyPushed)
          b.pruneColumns(readSchemaForGroups)
          (b.build(), g, Some((f._1, g.dvByPath(f._1))))
        }
        plainScan ++ dvScans
      }
    val requestedOut = requested
    val sparkLocal = spark
    val dataDirLocal = dataDir
    new Scan with SupportsReportStatistics {
      override def readSchema(): StructType = requestedOut
      override def description(): String =
        s"graft-mor-scan(${subScans.size} sub-scans, " +
          s"${groups.map(_.deletedKeys.values.map(_.size).sum).sum} deleted keys, " +
          s"${groups.map(_.deferredKeys.size).sum} deferred delete files, " +
          s"${groups.map(_.dvByPath.values.map(_.count).sum).sum} deleted positions)"
      override def estimateStatistics()
          : org.apache.spark.sql.connector.read.Statistics =
        new org.apache.spark.sql.connector.read.Statistics {
          override def sizeInBytes(): java.util.OptionalLong =
            java.util.OptionalLong.of(
              math.max(1L, groups.flatMap(_.files).map(_._3).sum))
          override def numRows(): java.util.OptionalLong =
            java.util.OptionalLong.empty()
        }
      override def toBatch: Batch = new Batch {
        private val planned: Seq[(Batch, MorGroup, Option[(String, DvRef)])] =
          subScans.map { case (s, g, dv) => (s.toBatch, g, dv) }
        override def planInputPartitions(): Array[InputPartition] =
          planned.zipWithIndex.flatMap { case ((b, _, dv), si) =>
            val parts = b.planInputPartitions()
            dv match {
              case None => parts.map(p => MorInputPartition(p, si))
              case Some((path, _)) =>
                // reconstruct each split's starting row offset from the
                // file footer (one driver read per DV'd file): a block
                // belongs to the split containing its midpoint — the
                // parquet range-filter rule the task-side reader applies
                val abs = new Path(dataDirLocal, path)
                val conf = sparkLocal.sessionState.newHadoopConf()
                val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
                  org.apache.parquet.hadoop.util.HadoopInputFile
                    .fromPath(abs, conf))
                val blocks =
                  try {
                    import scala.jdk.CollectionConverters._
                    rd.getFooter.getBlocks.asScala.toSeq.map(blk =>
                      (blk.getStartingPos + blk.getCompressedSize / 2,
                        blk.getRowCount))
                  } finally rd.close()
                parts.map { p =>
                  val fp = p.asInstanceOf[
                    org.apache.spark.sql.execution.datasources.FilePartition]
                  val segs = fp.files.map { pf =>
                    val lo = pf.start
                    val hi = pf.start + pf.length
                    val startRow = blocks.filter(_._1 < lo).map(_._2).sum
                    val rows = blocks
                      .filter(b => b._1 >= lo && b._1 < hi).map(_._2).sum
                    (startRow, rows)
                  }
                  MorInputPartition(p, si, segs)
                }
            }
          }.toArray
        override def createReaderFactory(): PartitionReaderFactory = {
          val specs = planned.zipWithIndex.map { case ((b, g, dv), si) =>
            val scanSchema = subScans(si)._1.readSchema()
            MorGroupSpec(
              b.createReaderFactory(),
              scanSchema,
              requestedOut.fieldNames.map(scanSchema.fieldIndex),
              g.deletedKeys.toSeq.map { case (c, ks) =>
                (scanSchema.fieldIndex(c), scanSchema(c).dataType, ks)
              },
              g.deferredKeys.map(d =>
                (scanSchema.fieldIndex(d.column),
                  scanSchema(d.column).dataType, d.path)),
              dv.map(_._2.sidecar))
          }
          new MorReaderFactory(specs.toArray,
            new _root_.graft.table.SerializableConf(
              sparkLocal.sessionState.newHadoopConf()))
        }
      }
    }
  }
}

/** An input partition tagged with its sub-scan ordinal; positional
  * partitions additionally carry each split's (start row offset, row
  * count) so the reader can reconstruct exact file row indexes. */
case class MorInputPartition(inner: InputPartition, group: Int,
    segs: Seq[(Long, Long)] = Nil)
  extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** Per-sub-scan reading spec: the inner factory, its scan schema, the
  * projection to the requested order, (ordinal, type, deleted values)
  * equality checks, oversized delete files loaded executor-side as
  * (ordinal, type, path), and (positional sub-scans) the file's DV
  * sidecar path — positions are resolved where the task runs, so the
  * serialized spec is O(1) in accumulated delete state. */
case class MorGroupSpec(
    factory: PartitionReaderFactory,
    scanSchema: StructType,
    perm: Array[Int],
    keyChecks: Seq[(Int, DataType, Set[Any])],
    deferredChecks: Seq[(Int, DataType, String)] = Nil,
    dvSidecar: Option[String] = None)

class MorReaderFactory(specs: Array[MorGroupSpec],
    conf: _root_.graft.table.SerializableConf)
  extends PartitionReaderFactory {

  // Spark requires every partition of a scan to agree on columnar
  // support ("Cannot mix row-based and columnar input partitions"), so
  // a MOR scan reads row-wise throughout — the merge-on-read tax until
  // compact() applies the deletes
  override def supportColumnarReads(partition: InputPartition): Boolean =
    false

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val mp = partition.asInstanceOf[MorInputPartition]
    val s = specs(mp.group)
    val r = s.factory.createReader(mp.inner)
    val proj = UnsafeProjection.create(s.perm.toIndexedSeq.map(i =>
      BoundReference(i, s.scanSchema(i).dataType, s.scanSchema(i).nullable)))
    // delete state resolves HERE — on the executor, per task, served
    // from the JVM-local immutable-sidecar caches
    val checks = s.keyChecks ++ s.deferredChecks.map { case (ord, dt, path) =>
      (ord, dt, _root_.graft.table.EqKeyStore.keys(path,
        s.scanSchema(ord).name, dt, conf.value))
    }
    val positions = s.dvSidecar
      .map(p => _root_.graft.table.DvStore.positions(p, conf.value))
      .getOrElse(Array.empty[Long])
    val segs = mp.segs.toArray
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      // positional bookkeeping: the n-th row this reader emits sits at
      // file row index segs(i)._1 + offset-within-segment — exact
      // because positional sub-scans push no data filters (no row-group
      // or page skipping) and splits cover disjoint block ranges
      private var segIdx = 0
      private var segConsumed = 0L
      private def nextRowIndex(): Long = {
        while (segConsumed >= segs(segIdx)._2) { segIdx += 1; segConsumed = 0L }
        val idx = segs(segIdx)._1 + segConsumed
        segConsumed += 1
        idx
      }
      override def next(): Boolean = {
        while (r.next()) {
          val row = r.get()
          val posDeleted = positions.nonEmpty && {
            val idx = nextRowIndex()
            java.util.Arrays.binarySearch(positions, idx) >= 0
          }
          val deleted = posDeleted || checks.exists { case (ord, dt, ks) =>
            !row.isNullAt(ord) && ks.contains(row.get(ord, dt))
          }
          if (!deleted) { current = proj(row); return true }
        }
        false
      }
      override def get(): InternalRow = current
      override def close(): Unit = r.close()
    }
  }
}

object MorScan {
  /** Load a delete file's key values as catalyst-internal values (what
    * the reader's `InternalRow.get` returns), driver-side. Delete sets
    * are small by contract (large deletes take the copy-on-write
    * path). */
  def loadDeletedKeys(spark: SparkSession, deleteDir: Path,
      relPath: String, keyColumn: String, dt: DataType): Set[Any] = {
    val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToCatalystConverter(dt)
    spark.read.parquet(new Path(deleteDir, relPath).toString)
      .select(keyColumn).collect()
      .map(_.get(0)).filter(_ != null).map(conv).toSet
  }
}
