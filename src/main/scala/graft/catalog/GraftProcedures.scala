package graft.catalog

import graft.table.{TableCatalog => GraftTableCatalog, TxLog, TxTable}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.util.{Collections, Iterator => JIterator}

/**
 * Stored maintenance procedures served through Spark's native
 * `ProcedureCatalog` — the Iceberg `CALL catalog.system.<proc>(...)`
 * surface (the managed-engine side of the reference's S3 Tables
 * maintenance: automatic compaction / snapshot expiration described in
 * kinesis-firehose-stream/README.md's S3 Tables setup). Spark 4 parses
 * `CALL graft.system.expire_snapshots(table => 'ns.t', retain_last => 5)`
 * natively; the analyzer binds here and invokes [[BoundProcedure.call]],
 * whose result rows surface as the statement's result set.
 *
 * All procedures are driver-side METADATA operations on the transaction
 * log (or kick off table-layer jobs like compaction that are themselves
 * distributed) — a [[LocalScan]] result is the honest shape, exactly as
 * for [[GraftMetadataTable]].
 */
private[graft] object GraftProcedures {

  /** table argument, shared by every procedure */
  private val TableParam =
    ProcedureParameter.in("table", StringType).build()

  private def p(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  private def pDefault(name: String, dt: DataType, sql: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(sql).build()

  val names: Seq[String] = Seq(
    "expire_snapshots", "remove_orphan_files", "rewrite_data_files",
    "rewrite_position_deletes", "evolve_partition_spec",
    "rollback_to_version", "rollback_to_timestamp", "fast_forward",
    "create_branch", "drop_branch", "create_tag", "add_files",
    "analyze_table", "build_bloom_index", "refresh_bloom_index",
    "compact_bloom_index", "build_vector_index",
    "refresh_vector_index", "rewrite_vector_index",
    "maintain_vector_index", "maintain_table",
    "measure_vector_index_recall", "shallow_clone", "index_commits")

  def load(name: String, cat: () => GraftTableCatalog): Option[UnboundProcedure] =
    if (names.contains(name)) Some(new GraftProcedure(name, cat)) else None

  /** `'ns.t'` → the transaction-log table (the procedure-argument
    * addressing; a bare `'t'` is refused — procedures act across
    * namespaces, so the caller must say which). */
  private def resolve(cat: GraftTableCatalog, ref: String): TxTable = {
    val parts = ref.split("\\.")
    require(parts.length == 2,
      s"procedure table argument must be 'namespace.table', got '$ref'")
    cat.getTable(parts(0), parts(1))
  }

  private final class GraftProcedure(procName: String,
      cat: () => GraftTableCatalog) extends UnboundProcedure {

    override def name(): String = procName
    override def description(): String = s"graft maintenance procedure $procName"

    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = procName
      override def description(): String = s"graft maintenance procedure $procName"
      override def isDeterministic: Boolean = false

      override def parameters(): Array[ProcedureParameter] = procName match {
        case "expire_snapshots" => Array(TableParam,
          pDefault("retain_last", IntegerType, "10"),
          pDefault("older_than", TimestampType, "NULL"))
        case "remove_orphan_files" => Array(TableParam,
          pDefault("retain_versions", IntegerType, "2"),
          pDefault("grace_millis", LongType, (10L * 60 * 1000).toString))
        case "rewrite_data_files" => Array(TableParam,
          pDefault("target_file_size_bytes", LongType, (128L * 1024 * 1024).toString),
          pDefault("zorder_by", StringType, "NULL"),
          pDefault("where", StringType, "NULL"),
          pDefault("small_files_only", StringType, "false"),
          pDefault("sort_by", StringType, "NULL"))
        case "evolve_partition_spec" => Array(TableParam,
          p("spec", StringType))
        case "rewrite_position_deletes" => Array(TableParam,
          pDefault("target_file_size_bytes", LongType, (128L * 1024 * 1024).toString))
        case "rollback_to_version"   => Array(TableParam, p("version", LongType))
        case "rollback_to_timestamp" => Array(TableParam, p("timestamp", TimestampType))
        case "fast_forward"          => Array(TableParam, p("branch", StringType))
        case "create_branch"         => Array(TableParam, p("branch", StringType))
        case "drop_branch"           => Array(TableParam, p("branch", StringType))
        case "create_tag" => Array(TableParam, p("tag", StringType),
          pDefault("version", LongType, "-1"))
        case "add_files"  => Array(TableParam, p("source", StringType))
        case "analyze_table" => Array(TableParam,
          pDefault("columns", StringType, "NULL"))
        case "build_bloom_index" => Array(TableParam, p("column", StringType),
          pDefault("fpp", DoubleType, "0.001"))
        case "refresh_bloom_index" => Array(TableParam, p("column", StringType))
        case "compact_bloom_index" => Array(TableParam, p("column", StringType))
        case "build_vector_index" => Array(TableParam,
          p("id_column", StringType), p("vector_column", StringType),
          p("dim", IntegerType),
          pDefault("recall_target", DoubleType, "0.9"),
          pDefault("n_cells", IntegerType, "-1"),
          pDefault("rerank_to", IntegerType, "300"))
        case "refresh_vector_index" => Array(TableParam,
          p("vector_column", StringType))
        case "rewrite_vector_index" => Array(TableParam,
          p("vector_column", StringType),
          pDefault("target_file_size_bytes", LongType,
            (128L * 1024 * 1024).toString))
        case "maintain_vector_index" => Array(TableParam,
          p("vector_column", StringType),
          pDefault("coverage_floor", DoubleType, "0.9"),
          pDefault("rebuild_below", DoubleType, "0.5"),
          pDefault("max_code_files", IntegerType, "64"),
          // opt-in MEASURED drift check: rebuild when held-out recall
          // at the stored operating point fell below the build's own
          // target — the in-place-churn case coverage cannot see
          pDefault("check_recall", BooleanType, "false"))
        case "measure_vector_index_recall" => Array(TableParam,
          // the read-only drift probe maintain_vector_index(check_recall)
          // acts on, callable standalone so a scheduler can WATCH recall
          // without holding the write bar: held-out sample, brute-force
          // ground truth, the real search path (TxTable
          // .measureVectorIndexRecall). One brute pass over
          // sample x corpus — the monitoring cost, priced explicitly.
          p("vector_column", StringType),
          pDefault("k", IntegerType, "-1"),
          pDefault("sample_queries", IntegerType, "32"))
        case "maintain_table" => Array(TableParam,
          // the one-call policy over every maintenance dimension (the
          // reference's managed S3 Tables behavior): small-file
          // compaction, per-index upkeep, snapshot retention, orphan
          // sweep — each behind its own threshold. Defaults are NULL:
          // an omitted argument falls back to the table's own
          // `graft.maintain.*` property (then the API default), so a
          // CALL and the per-table declarative config resolve
          // identically — CALL arguments override properties.
          pDefault("target_file_size_bytes", LongType, "NULL"),
          pDefault("small_file_bytes", LongType, "NULL"),
          pDefault("min_small_files", IntegerType, "NULL"),
          pDefault("retain_snapshots", IntegerType, "NULL"),
          pDefault("max_snapshot_age_ms", LongType, "NULL"),
          pDefault("remove_orphans", BooleanType, "NULL"),
          pDefault("orphan_grace_ms", LongType, "NULL"),
          pDefault("maintain_indexes", BooleanType, "NULL"),
          pDefault("check_recall", BooleanType, "NULL"))
        case "shallow_clone" => Array(TableParam, p("destination", StringType),
          pDefault("version", LongType, "-1"))
        case "index_commits" => Array(TableParam)
      }

      override def call(input: InternalRow): JIterator[Scan] = {
        val c = cat()
        val t = resolve(c, input.getString(0))
        procName match {
          case "expire_snapshots" =>
            val olderThan = if (input.isNullAt(2)) None
              else Some(input.getLong(2) / 1000L)   // micros → ms
            val n = olderThan match {
              case Some(ms) => t.expireSnapshotsOlderThan(ms)
              case None     => t.expireSnapshots(input.getInt(1))
            }
            result("expired_snapshots" -> n)
          case "remove_orphan_files" =>
            result("removed_files" ->
              t.vacuum(input.getInt(1), input.getLong(2)))
          case "rewrite_data_files" =>
            val zorder = if (input.isNullAt(2)) Nil
              else input.getString(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
            // as for OPTIMIZE ... WHERE: the filter must convert entirely
            // to partition equalities (a dropped conjunct would widen the
            // rewrite); the simple `col = value` csv form is accepted here
            val pf = if (input.isNullAt(3)) Map.empty[String, String]
              else input.getString(3).split(",").map { kv =>
                val Array(k, v) = kv.split("=", 2).map(_.trim)
                k -> v.stripPrefix("'").stripSuffix("'")
              }.toMap
            val smallOnly = !input.isNullAt(4) &&
              input.getString(4).trim.equalsIgnoreCase("true")
            // sort strategy (Iceberg rewrite_data_files(strategy =>
            // 'sort')): range-sort the rewrite by these columns so
            // footer min/max ranges become tight on them
            val sortBy = if (input.isNullAt(5)) Nil
              else input.getString(5).split(",").map(_.trim)
                .filter(_.nonEmpty).toSeq
            result("version" ->
              (if (smallOnly) {
                require(zorder.isEmpty,
                  "small_files_only bin-packs; it cannot zorder")
                t.compactSmallFiles(input.getLong(1), partitionFilter = pf,
                  sortBy = sortBy)
              } else t.compact(input.getLong(1), clusterBy = zorder,
                partitionFilter = pf, sortBy = sortBy)))
          case "evolve_partition_spec" =>
            // metadata-only spec evolution (day -> month as data ages):
            // old files keep their own partition values; reads prune
            // per file against whichever spec wrote it
            result("version" -> t.alterPartitionSpec(
              graft.table.PartitionTransform.parseSpecList(
                input.getString(1))))
          case "rewrite_position_deletes" =>
            val (v, n) = t.rewritePositionDeletes(input.getLong(1))
            result("version" -> v, "rewritten_files" -> n)
          case "rollback_to_version" =>
            result("version" -> t.restore(input.getLong(1)))
          case "rollback_to_timestamp" =>
            val ms = input.getLong(1) / 1000L
            val v = TxLog.versionAtOrBefore(new Path(t.root, "_log"),
              t.currentVersion, ms, sparkConf)
            result("restored_from" -> v, "version" -> t.restore(v))
          case "fast_forward" =>
            result("version" -> t.fastForward(input.getString(1)))
          case "create_branch" =>
            result("fork_version" -> t.createBranch(input.getString(1)))
          case "drop_branch" =>
            t.dropBranch(input.getString(1)); result("dropped" -> true)
          case "create_tag" =>
            val v = input.getLong(2)
            t.tag(input.getString(1), v)
            result("tagged_version" -> (if (v >= 0) v else t.currentVersion))
          case "add_files" =>
            val (v, n) = t.addFiles(input.getString(1))
            result("version" -> v, "added_files" -> n)
          case "analyze_table" =>
            val cols = if (input.isNullAt(1)) Nil
              else input.getString(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
            val stats = t.analyze(cols)
            result("row_count" -> stats.rowCount,
              "analyzed_columns" -> stats.cols.size)
          case "build_bloom_index" =>
            result("indexed_files" ->
              t.buildBloomIndex(input.getString(1), input.getDouble(2)))
          case "refresh_bloom_index" =>
            // O(new files): encode only uncovered files, append one part
            result("indexed_files" ->
              t.refreshBloomIndex(input.getString(1)))
          case "compact_bloom_index" =>
            // O(sidecar): drop dead entries + fold the part chain, no
            // data-file reads (rebuild stays reserved for fpp reshaping)
            result("dropped_entries" ->
              t.compactBloomIndex(input.getString(1)))
          case "build_vector_index" =>
            // train + encode + CALIBRATE once; the sidecar ships the
            // measured operating point (see TxTable.buildVectorIndex)
            result("calibrated_nprobe" -> t.buildVectorIndex(
              input.getString(1), input.getString(2), input.getInt(3),
              recallTarget = input.getDouble(4), nCells = input.getInt(5),
              rerankTo = input.getInt(6)))
          case "refresh_vector_index" =>
            result("encoded_rows" ->
              t.refreshVectorIndex(input.getString(1)))
          case "rewrite_vector_index" =>
            // bin-pack the code files refreshVectorIndex appends per
            // call (the small-file compaction of the ANN sidecar)
            result("code_files" -> t.rewriteVectorIndex(
              input.getString(1), input.getLong(2)))
          case "maintain_vector_index" =>
            // threshold-driven lifecycle: rebuild / refresh / compact /
            // noop from the coverage + code-file signals SHOW INDEXES
            // reports (see TxTable.maintainVectorIndex)
            val (action, detail) = t.maintainVectorIndex(
              input.getString(1), input.getDouble(2), input.getDouble(3),
              input.getInt(4), checkRecall = input.getBoolean(5))
            result("action" -> action, "detail" -> detail)
          case "measure_vector_index_recall" =>
            // persist=false: the procedure is FULL_SELECT-gated, so a
            // read-only principal's probe must not publish a meta slot
            // (the memo is a write; see TxTable.measureVectorIndexRecall)
            val r = t.measureVectorIndexRecall(input.getString(1),
              k = input.getInt(2), sampleQueries = input.getInt(3),
              persist = false)
            result("recall" -> r)
          case "maintain_table" =>
            def optL(i: Int) =
              if (input.isNullAt(i)) None else Some(input.getLong(i))
            def optI(i: Int) =
              if (input.isNullAt(i)) None else Some(input.getInt(i))
            def optB(i: Int) =
              if (input.isNullAt(i)) None else Some(input.getBoolean(i))
            val actions = t.maintainTableConfigured(
              targetFileBytes = optL(1),
              smallFileBytes = optL(2),
              minSmallFiles = optI(3),
              retainSnapshots = optI(4),
              maxSnapshotAgeMs = optL(5),
              removeOrphans = optB(6),
              orphanGraceMs = optL(7),
              maintainIndexes = optB(8),
              checkRecall = optB(9))
            resultRows(Seq("action", "detail"),
              actions.map { case (a, d) => Seq(a, d) })
          case "shallow_clone" =>
            val parts = input.getString(1).split("\\.")
            require(parts.length == 2,
              s"destination must be 'namespace.table', got '${input.getString(1)}'")
            c.createNamespace(parts(0))
            val cloned = t.cloneTo(c.tableRoot(parts(0), parts(1)),
              s"${parts(0)}.${parts(1)}", input.getLong(2))
            result("version" -> cloned.currentVersion)
          case "index_commits" =>
            // backfill the persisted commit index (logs that predate
            // it, or chunks whose best-effort write was lost)
            result("chunks_written" -> TxLog.backfillIndex(
              new Path(t.root, "_log"), t.currentVersion, sparkConf))
        }
      }

      private def sparkConf =
        SparkSession.active.sessionState.newHadoopConf()
    }
  }

  /** One-row LocalScan result set: (name → value) pairs with types
    * inferred from the Scala values. */
  /** Multi-row string result set (one row per maintenance action). */
  private def resultRows(cols: Seq[String],
      rows: Seq[Seq[String]]): JIterator[Scan] = {
    val schema = StructType(cols.map(StructField(_, StringType,
      nullable = false)))
    val data: Array[InternalRow] = rows.map(r =>
      new GenericInternalRow(
        r.map(v => UTF8String.fromString(v): Any).toArray): InternalRow)
      .toArray
    Collections.singletonList[Scan](new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = data
      override def description(): String = "GraftProcedureResult"
    }).iterator()
  }

  private def result(fields: (String, Any)*): JIterator[Scan] = {
    val schema = StructType(fields.map { case (n, v) =>
      StructField(n, v match {
        case _: Int => IntegerType
        case _: Long => LongType
        case _: Boolean => BooleanType
        case _: Double => DoubleType
        case _ => StringType
      }, nullable = false)
    })
    val row = new GenericInternalRow(fields.map {
      case (_, v: String) => UTF8String.fromString(v)
      case (_, v) => v.asInstanceOf[Any]
    }.toArray)
    Collections.singletonList[Scan](new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = Array(row)
      override def description(): String = "GraftProcedureResult"
    }).iterator()
  }
}
