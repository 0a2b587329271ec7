package graft.catalog

import graft.table.TxTable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsOverwriteV2, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.graft.ScanBridge
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util
import scala.jdk.CollectionConverters._

/**
 * V2 `Table` over one graft [[TxTable]], pinned to the snapshot current
 * at load time (each `spark.sql` statement re-resolves `loadTable`, so
 * statements see a consistent version — the Iceberg/Delta read contract).
 *
 * Reads plan through Spark's own vectorized parquet scan over a
 * snapshot-pinned file index ([[org.apache.spark.sql.graft
 * .SnapshotFileIndex]]): pushed filters reach the parquet footers, the
 * scan touches exactly the snapshot's files, and partition pruning runs
 * against snapshot metadata — never a filesystem listing.
 *
 * Writes go through the `V1Write` bridge to [[TxTable.append]] /
 * [[TxTable.overwrite]], so INSERT INTO / INSERT OVERWRITE / CTAS /
 * `df.writeTo(...)` all land as ACID log commits with footer stats.
 */
class GraftV2Table(val tx: TxTable) extends Table
    with SupportsRead with SupportsWrite {

  private val snap = tx.snapshot
  private val fullSchema: StructType =
    org.apache.spark.sql.types.DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]

  override def name(): String = tx.name

  override def schema(): StructType = fullSchema

  override def partitioning(): Array[Transform] =
    snap.partitionColumns.map(Expressions.identity).toArray

  override def properties(): util.Map[String, String] =
    Map("provider" -> "graft", "version" -> snap.version.toString).asJava

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val dataSchema =
      StructType(fullSchema.filterNot(f => snap.partitionColumns.contains(f.name)))
    val index = ScanBridge.snapshotIndex(tx.spark, new Path(tx.root, "data"),
      fullSchema, snap.partitionColumns,
      snap.files.map(f => (f.path, f.partitionValues, f.sizeBytes)))
    ScanBridge.parquetScanBuilder(tx.spark, index, fullSchema, dataSchema, options)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsOverwriteV2 {
      private var overwriteAll = false

      override def truncate(): WriteBuilder = { overwriteAll = true; this }

      override def overwrite(predicates: Array[Predicate]): WriteBuilder = {
        // Only full-table overwrite (INSERT OVERWRITE without a partition
        // spec analyzes to an always-true predicate). Partition-scoped
        // overwrite would need a delete+append composite commit.
        val alwaysTrue = predicates.isEmpty ||
          (predicates.length == 1 && predicates(0).name() == "ALWAYS_TRUE")
        if (!alwaysTrue) throw new UnsupportedOperationException(
          s"partial OVERWRITE by ${predicates.mkString(", ")}")
        overwriteAll = true
        this
      }

      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit =
              if (overwriteAll || overwrite) tx.overwrite(data) else tx.append(data)
          }
      }
    }
}
