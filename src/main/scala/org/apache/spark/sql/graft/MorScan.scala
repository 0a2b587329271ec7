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

/**
 * One seq-group of a merge-on-read scan: the files that share the same
 * set of applicable equality deletes, plus the (already-loaded) deleted
 * key values per key column — catalyst-INTERNAL values, so the reader
 * compares row values directly.
 */
case class MorGroup(
    files: Seq[(String, Map[String, String], Long)],
    statsByPath: Map[String, Map[String, _root_.graft.table.ColStats]],
    deletedKeys: Map[String, Set[Any]])

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
    groups.flatMap(_.deletedKeys.keys).distinct

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
    val groupScans: Seq[(Scan, MorGroup)] = groups.map { g =>
      val b = newGroupBuilder(g)
      b.pushFilters(pushed)
      b.pruneColumns(readSchemaForGroups)
      (b.build(), g)
    }
    val requestedOut = requested
    new Scan with SupportsReportStatistics {
      override def readSchema(): StructType = requestedOut
      override def description(): String =
        s"graft-mor-scan(${groups.size} groups, " +
          s"${groups.map(_.deletedKeys.values.map(_.size).sum).sum} deleted keys)"
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
        private val planned: Seq[(Batch, MorGroup)] =
          groupScans.map { case (s, g) => (s.toBatch, g) }
        override def planInputPartitions(): Array[InputPartition] =
          planned.zipWithIndex.flatMap { case ((b, _), gi) =>
            b.planInputPartitions().map(p => MorInputPartition(p, gi))
          }.toArray
        override def createReaderFactory(): PartitionReaderFactory = {
          val specs = planned.zipWithIndex.map { case ((b, g), gi) =>
            val scanSchema = groupScans(gi)._1.readSchema()
            MorGroupSpec(
              b.createReaderFactory(),
              scanSchema,
              requestedOut.fieldNames.map(scanSchema.fieldIndex),
              g.deletedKeys.toSeq.map { case (c, ks) =>
                (scanSchema.fieldIndex(c), scanSchema(c).dataType, ks)
              })
          }
          new MorReaderFactory(specs.toArray)
        }
      }
    }
  }
}

/** An input partition tagged with its seq-group ordinal. */
case class MorInputPartition(inner: InputPartition, group: Int)
  extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** Per-group reading spec: the group's inner factory, its scan schema,
  * the projection to the requested order, and (ordinal, type, deleted
  * values) checks. */
case class MorGroupSpec(
    factory: PartitionReaderFactory,
    scanSchema: StructType,
    perm: Array[Int],
    keyChecks: Seq[(Int, DataType, Set[Any])])

class MorReaderFactory(specs: Array[MorGroupSpec])
  extends PartitionReaderFactory {

  private def spec(p: InputPartition): (MorGroupSpec, InputPartition) = {
    val mp = p.asInstanceOf[MorInputPartition]
    (specs(mp.group), mp.inner)
  }

  // Spark requires every partition of a scan to agree on columnar
  // support ("Cannot mix row-based and columnar input partitions"), so
  // a MOR scan reads row-wise throughout — the merge-on-read tax until
  // compact() applies the deletes
  override def supportColumnarReads(partition: InputPartition): Boolean =
    false

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val (s, inner) = spec(partition)
    val r = s.factory.createReader(inner)
    val proj = UnsafeProjection.create(s.perm.toIndexedSeq.map(i =>
      BoundReference(i, s.scanSchema(i).dataType, s.scanSchema(i).nullable)))
    val checks = s.keyChecks
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = {
        while (r.next()) {
          val row = r.get()
          val deleted = checks.exists { case (ord, dt, ks) =>
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
