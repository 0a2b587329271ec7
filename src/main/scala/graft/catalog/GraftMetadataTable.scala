package graft.catalog

import graft.table.TxTable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util
import scala.jdk.CollectionConverters._

/**
 * Iceberg-style metadata tables addressed as a suffix on the table
 * identifier — `SELECT * FROM graft.ns.t.files` / `.history` /
 * `.partitions` / `.tags` — resolved by [[GraftCatalog.loadTable]]
 * when the two-level namespace names a real table.
 *
 * Served as a [[LocalScan]]: the rows ARE driver metadata (snapshot
 * descriptors, commit history, the tag store) — the whole point of the
 * surface is answering from the log without touching data files, so a
 * distributed scan would be theater. At 10⁶-file scale the `files`
 * listing is manifest-resolution work, still metadata-bound.
 */
class GraftMetadataTable(tx: TxTable, kind: String) extends Table
    with SupportsRead {

  private val df: DataFrame = kind match {
    case "files"      => tx.filesDf
    case "partitions" => tx.partitionsDf
    case "history"    => tx.history()
    case "tags"       =>
      val spark = tx.spark
      import spark.implicits._
      tx.tags.toSeq.sortBy(_._1).toDF("tag", "version")
    case "branches"   =>
      val spark = tx.spark
      import spark.implicits._
      tx.branches.map(b => (b, tx.branch(b).currentVersion,
        tx.branchForkVersion(b))).toDF("branch", "head_version", "fork_version")
    case "constraints" =>
      val spark = tx.spark
      import spark.implicits._
      tx.constraints.toSeq.sortBy(_._1).toDF("name", "condition")
    // the SHOW INDEXES rows as a RELATION, so index observability
    // composes (WHERE over coverage, joins against .history, CTEs) —
    // same stats-parity bar as .files/.partitions (coverage is
    // row counts over the whole table)
    case "indexes"    => tx.showIndexes
    case other => throw new IllegalArgumentException(
      s"unknown metadata table '$other' " +
        "(files|partitions|history|tags|branches|constraints|indexes)")
  }

  override def name(): String = s"${tx.name}.$kind"
  override def schema(): StructType = df.schema
  override def properties(): util.Map[String, String] =
    Map("provider" -> "graft-metadata").asJava
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def readSchema(): StructType = df.schema
        override def rows(): Array[InternalRow] =
          df.queryExecution.executedPlan.executeCollect()
        override def description(): String = s"GraftMetadata(${name()})"
      }
    }
}
