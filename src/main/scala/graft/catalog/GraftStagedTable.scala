package graft.catalog

import graft.table.{TableCatalog => GraftTableCatalog, TxTable}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException
import org.apache.spark.sql.connector.catalog.{Identifier, StagedTable, SupportsWrite, TableCapability}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util

/**
 * The atomic half of `CREATE OR REPLACE TABLE ... AS SELECT` /
 * `REPLACE TABLE ... AS SELECT` (Spark's [[StagedTable]] contract,
 * the Iceberg/Delta RTAS behavior): the AS-SELECT writes into a
 * hidden staging table under `<ns>/_stage_<table>_<uuid>` — invisible
 * to listings and readers — and publication is a single atomic step:
 *
 *  - CREATE: one directory rename of the staged root onto the final
 *    table root (create-if-absent: a racing creator loses cleanly);
 *  - REPLACE: [[TxTable.replaceFrom]] — adopt the staged data files
 *    into the existing table's data dir and swap schema + file list in
 *    ONE CAS commit, so readers see the old table or the new one,
 *    never a mix, and the old versions stay time-travelable.
 *
 * `abortStagedChanges` (query failure) deletes the staging dir; the
 * real table is untouched in every failure mode.
 */
private[catalog] class GraftStagedTable(
    spark: SparkSession,
    cat: GraftTableCatalog,
    ns: String,
    table: String,
    staged: TxTable,
    /** create | replace | createOrReplace */
    mode: String) extends StagedTable with SupportsWrite {

  private val delegate = new GraftV2Table(staged)

  override def name(): String = s"$ns.$table (staged)"
  override def schema(): StructType = delegate.schema()
  override def partitioning() = delegate.partitioning()
  override def properties(): util.Map[String, String] = delegate.properties()
  override def capabilities(): util.Set[TableCapability] = delegate.capabilities()

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    delegate.newWriteBuilder(info)

  override def commitStagedChanges(): Unit = {
    val fs = cat.warehouse.getFileSystem(spark.sessionState.newHadoopConf())
    val finalRoot = cat.tableRoot(ns, table)
    val exists = cat.tableExists(ns, table)
    mode match {
      case "replace" if !exists =>
        abortStagedChanges()
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
          Identifier.of(Array(ns), table))
      case "create" | "createOrReplace" if !exists =>
        // publish by rename: atomic create-if-absent on the table root
        if (!fs.rename(staged.root, finalRoot)) {
          abortStagedChanges()
          if (cat.tableExists(ns, table))
            throw new TableAlreadyExistsException(Identifier.of(Array(ns), table))
          throw new IllegalStateException(
            s"could not publish staged table to $finalRoot")
        }
      case "create" =>
        abortStagedChanges()
        throw new TableAlreadyExistsException(Identifier.of(Array(ns), table))
      case _ =>
        try cat.getTable(ns, table).replaceFrom(staged)
        finally abortStagedChanges()   // data files already adopted; drop the husk
    }
  }

  override def abortStagedChanges(): Unit = {
    val fs = cat.warehouse.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(staged.root)) fs.delete(staged.root, true)
  }
}
