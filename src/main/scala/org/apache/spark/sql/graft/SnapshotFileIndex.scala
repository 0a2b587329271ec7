package org.apache.spark.sql.graft

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.{NoopCache, PartitioningAwareFileIndex, PartitionPath, PartitionSpec}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable.LinkedHashMap

/**
 * A [[PartitioningAwareFileIndex]] pinned to an exact snapshot file list —
 * the bridge that lets the graft transaction log drive Spark's own
 * vectorized parquet DataSource-V2 scan (filter pushdown, column pruning,
 * partition pruning all included) without ever listing the filesystem.
 *
 * The reference's tables are Iceberg-in-S3-Tables resolved through a
 * first-class catalog (kinesis-firehose-stream/README.md:147); the
 * equivalent Spark-native shape is a V2 `TableCatalog` whose scans plan
 * from snapshot metadata, exactly as Iceberg's own Spark integration
 * plans from its manifests. Each file's partition values come from the
 * snapshot descriptor (not directory inference), so a scan reads exactly
 * the files the committed version references — stale files from older
 * versions or aborted writes are invisible even though they share the
 * same data directory.
 *
 * Lives in `org.apache.spark.sql` because the file-index machinery is
 * `private[sql]` (same pattern as [[ColumnBridge]]).
 */
class SnapshotFileIndex(
    spark: SparkSession,
    rawDataDir: Path,
    fullSchema: StructType,
    partitionColumns: Seq[String],
    files: Seq[(String, Map[String, String], Long)]) // (relPath, partitionValues, sizeBytes)
  extends PartitioningAwareFileIndex(spark, Map.empty, Some(fullSchema), NoopCache) {

  // Fully qualify against the filesystem: `allFiles()` looks leaf dirs up
  // by the fs-QUALIFIED root path (file:/…), so unqualified keys would
  // silently resolve to zero files on unpartitioned tables.
  private val dataDir: Path =
    rawDataDir.getFileSystem(spark.sessionState.newHadoopConf())
      .makeQualified(rawDataDir)

  private val partSchema =
    StructType(partitionColumns.map(c => fullSchema(fullSchema.fieldIndex(c))))

  private val zoneId = spark.sessionState.conf.sessionLocalTimeZone

  /** Partition directory values are stored as strings (Hive-style path
    * rendering); cast them back through the declared column type so the
    * scan exposes typed partition columns (DATE stays DateType, etc.). */
  private def castValue(v: String, dt: DataType): Any =
    Cast(Literal(UTF8String.fromString(v), StringType), dt, Option(zoneId))
      .eval(InternalRow.empty)

  private val statuses: Seq[(Path, FileStatus, Map[String, String])] =
    files.map { case (rel, parts, size) =>
      val p = new Path(dataDir, rel)
      (p, new FileStatus(size, false, 1, 128L * 1024 * 1024, 0L, p), parts)
    }

  override def rootPaths: Seq[Path] = Seq(dataDir)

  override def leafFiles: LinkedHashMap[Path, FileStatus] =
    LinkedHashMap(statuses.map(t => t._1 -> t._2): _*)

  override def leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
    statuses.groupBy(_._1.getParent).map { case (d, fs) => d -> fs.map(_._2).toArray }

  override def partitionSpec(): PartitionSpec =
    if (partitionColumns.isEmpty) PartitionSpec(StructType(Nil), Nil)
    else {
      val paths = statuses.map { case (p, _, vals) =>
        val row = InternalRow.fromSeq(partitionColumns.map(c =>
          castValue(vals.getOrElse(c, null), partSchema(partSchema.fieldIndex(c)).dataType)))
        (p.getParent, row)
      }.distinctBy(_._1).map { case (dir, row) => PartitionPath(row, dir) }
      PartitionSpec(partSchema, paths)
    }

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = files.map(_._3).sum
}

/** Constructors for `private[sql]` scan machinery used by the public
  * `graft.catalog` connector classes. */
object ScanBridge {

  /** Spark's own parquet V2 ScanBuilder (vectorized read, filter/aggregate
    * pushdown, nested-schema pruning) over a snapshot-pinned file index. */
  def parquetScanBuilder(
      spark: SparkSession,
      index: PartitioningAwareFileIndex,
      fullSchema: StructType,
      dataSchema: StructType,
      options: CaseInsensitiveStringMap): ScanBuilder =
    ParquetScanBuilder(spark, index, fullSchema, dataSchema, options)

  def snapshotIndex(
      spark: SparkSession,
      dataDir: Path,
      fullSchema: StructType,
      partitionColumns: Seq[String],
      files: Seq[(String, Map[String, String], Long)]): PartitioningAwareFileIndex =
    new SnapshotFileIndex(spark, dataDir, fullSchema, partitionColumns, files)
}
