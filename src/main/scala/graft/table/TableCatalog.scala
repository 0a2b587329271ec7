package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Namespace/table catalog over a warehouse directory — the engine-native
 * equivalent of the reference's table-bucket → namespace → table
 * hierarchy (kinesis-firehose-stream/lambda/custom_resource/index.py:63-137
 * creates bucket/namespace/table; :140-176 drops them idempotently;
 * :143-151 lists buckets; scripts/update_metadata.py:31-43 resolves by
 * name).
 *
 * Layout: `<warehouse>/<namespace>/<table>/{_log,data}`. The warehouse
 * root plays the table-bucket role. Tables are also registered as Spark
 * temp views on demand so the SQL surface (`spark.sql("SELECT ... FROM
 * ns.tbl")`) resolves against catalog state.
 */
class TableCatalog(val spark: SparkSession, val warehouse: Path) {

  private val conf = spark.sessionState.newHadoopConf()
  private def fs = warehouse.getFileSystem(conf)

  // ---- namespace DDL (custom_resource/index.py:76-78, :162-170) -------

  def createNamespace(ns: String): Unit = fs.mkdirs(new Path(warehouse, ns))

  /** Idempotent: missing namespace is a no-op, mirroring the reference's
    * ResourceNotFound swallow (custom_resource/index.py:164-176). */
  def dropNamespace(ns: String): Unit = {
    val p = new Path(warehouse, ns)
    if (fs.exists(p)) fs.delete(p, true)
    // same stale-header hazard as dropTable, for every table (and
    // branch chain) the namespace held — and the namespace ACL store
    // the delete just removed must not be served from cache to a
    // recreated namespace of the same name
    TxLog.purgeRawCacheUnder(p)
    NamespaceAcl.invalidate(warehouse, ns)
  }

  def listNamespaces(): Seq[String] =
    if (!fs.exists(warehouse)) Nil
    else fs.listStatus(warehouse).filter(_.isDirectory).map(_.getPath.getName).toSeq.sorted

  // ---- table DDL (custom_resource/index.py:86-137, :140-160) ----------

  def tableRoot(ns: String, table: String): Path =
    new Path(new Path(warehouse, ns), table)

  def createTable(ns: String, table: String, schema: StructType,
      partitionBy: Seq[String] = Nil,
      properties: Map[String, String] = Map.empty,
      partitionSpec: Seq[PartField] = Nil): TxTable = {
    createNamespace(ns)
    require(!TxTable.exists(spark, tableRoot(ns, table)),
      s"table $ns.$table already exists")
    TxTable.create(spark, tableRoot(ns, table), s"$ns.$table", schema,
      partitionBy, properties, partitionSpec)
  }

  def getTable(ns: String, table: String): TxTable =
    TxTable.open(spark, tableRoot(ns, table), s"$ns.$table")

  /** Snapshot-pinned handle for statement-scoped reads: one head
    * resolution serves every metadata consultation through it. */
  private[graft] def getTablePinned(ns: String, table: String): TxTable =
    TxTable.openPinned(spark, tableRoot(ns, table), s"$ns.$table")

  def tableExists(ns: String, table: String): Boolean =
    TxTable.exists(spark, tableRoot(ns, table))

  /** Idempotent drop (DROP TABLE IF EXISTS). */
  def dropTable(ns: String, table: String): Unit = {
    val p = tableRoot(ns, table)
    if (fs.exists(p)) fs.delete(p, true)
    // a later CREATE at this path reuses version file names; cached
    // parsed headers from the dropped table must not survive the drop
    // (the mtime+length probe can miss a same-second, same-length
    // reuse). Prefix purge: branch chains under _log/refs/<name> reuse
    // paths the same way.
    TxLog.purgeRawCacheUnder(new Path(p, "_log"))
  }

  /** Begin an atomic multi-table transaction over this warehouse's
    * tables (markers live under `<warehouse>/_txns`). */
  def beginTransaction(): GraftTxn =
    GraftTxn.begin(spark, new Path(warehouse, "_txns"))

  /** Every decided transaction marker under this warehouse: id,
    * terminal state, decision time (the SHOW TRANSACTIONS surface;
    * in-flight transactions have no marker yet, by design). */
  def listTransactions(): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val txnDir = new Path(warehouse, "_txns")
    val conf = spark.sessionState.newHadoopConf()
    val rows =
      if (!fs.exists(txnDir)) Nil
      else fs.listStatus(txnDir).filter(_.isFile).toSeq.map { st =>
        val qualified = fs.makeQualified(st.getPath).toString
        (st.getPath.getName.stripSuffix(".txn"),
          TxLog.txnState(qualified, conf).getOrElse("UNREADABLE"),
          new java.sql.Timestamp(st.getModificationTime))
      }
    rows.sortBy(_._3.getTime).reverse
      .toDF("txn_id", "state", "decided_at")
  }

  /** Reap transaction markers no READABLE header still references.
    * A marker must outlive every header carrying its path (resolution
    * reads it on every serve of that header), so the reference walk
    * covers each table's stored headers from its retention floor to
    * its head — after `expireSnapshots` drops the last referencing
    * header, the marker becomes reclaimable. `graceMillis` additionally
    * protects markers younger than the longest publish→decide window
    * (a just-created marker whose headers a racing listing missed).
    * Returns the number of markers deleted. */
  def vacuumTxnMarkers(graceMillis: Long = 24L * 3600 * 1000): Int = {
    val txnDir = new Path(warehouse, "_txns")
    if (!fs.exists(txnDir)) return 0
    val conf = spark.sessionState.newHadoopConf()
    val referenced: Set[String] = listNamespaces()
      .filterNot(_.startsWith("_")).flatMap { ns =>
      listTables(ns).flatMap { tbl =>
        val logDir = new Path(tableRoot(ns, tbl), "_log")
        (for {
          head <- TxLog.currentVersion(logDir, conf).toSeq
          floor = TxLog.minVersion(logDir, conf).getOrElse(0L)
          v <- floor to head
          marker <- (try TxLog.readStored(logDir, v, conf).pendingTxn
            catch { case _: java.io.FileNotFoundException => None }).toSeq
        } yield marker)
      }
    }.toSet
    val cutoff = System.currentTimeMillis() - graceMillis
    var removed = 0
    fs.listStatus(txnDir).foreach { st =>
      val qualified = fs.makeQualified(st.getPath).toString
      if (st.isFile && st.getModificationTime < cutoff &&
          !referenced.contains(qualified) && fs.delete(st.getPath, false))
        removed += 1
    }
    removed
  }

  def listTables(ns: String): Seq[String] = {
    val p = new Path(warehouse, ns)
    if (!fs.exists(p)) Nil
    // underscore-prefixed dirs are catalog internals (_views), not tables
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .filterNot(_.startsWith("_")).toSeq.sorted
  }

  // ---- SQL surface ----------------------------------------------------

  /** Register the table's current snapshot as a temp view named
    * `<ns>_<table>` so `spark.sql` queries resolve against it (the
    * Athena-over-catalog path, README.md:139-166). */
  def registerView(ns: String, table: String): String = {
    val viewName = s"${ns}_$table"
    getTable(ns, table).toDF.createOrReplaceTempView(viewName)
    viewName
  }

  /** SQL-text surface: CREATE/DROP TABLE statements (the reference's
    * Athena-DDL management path) route through this catalog via
    * [[GraftSql]]; queries delegate to spark.sql over registered
    * views. */
  def sql(query: String): DataFrame = GraftSql.sql(this, query)
}
