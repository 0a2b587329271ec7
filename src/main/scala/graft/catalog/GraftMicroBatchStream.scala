package graft.catalog

import graft.table.{TxLog, TxTable}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxBytes, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Stream position = committed table version (the log IS the WAL). */
case class GraftOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

/**
 * Micro-batch streaming source over a graft table's commit log — the
 * Delta-style "table as a stream" surface behind
 * `spark.readStream.table("graft.ns.t")`:
 *
 *  - the OFFSET is the committed version number; `latestOffset` is one
 *    log-head read, and progress checkpoints exactly like any other
 *    Structured Streaming source;
 *  - the FIRST batch is the full live snapshot at the stream's start
 *    (initial load), after which each batch reads only the files FIRST
 *    ADDED by commits in `(start, end]` — [[TxLog.readChanged]] resolves
 *    those from the commit's OWN new manifest/inline remainder, so
 *    catching up K commits costs K × |changed files|, never
 *    K × |table files|;
 *  - rows are read through Spark's own vectorized parquet batch
 *    machinery over a per-batch snapshot-pinned file index.
 *
 * Admission control (the Delta/Kafka `maxFilesPerTrigger` surface):
 * with `maxFilesPerTrigger` / `maxBytesPerTrigger` read options (or a
 * `Trigger.AvailableNow` run), `latestOffset(start, limit)` admits
 * commits one at a time until the cumulative added-file count/bytes
 * would exceed the limit — a stream starting against a 10⁵-commit
 * backlog drains it in bounded micro-batches instead of planning one
 * batch containing the entire lake. At least one commit is always
 * admitted so progress is guaranteed. Version granularity is the floor:
 * a single huge commit is still one batch (its files were committed
 * atomically and must surface atomically).
 *
 * `startingVersion` skips the initial snapshot: `N` streams commits
 * ≥ N only; `latest` streams only commits after stream start. Without
 * it the initial load is the full snapshot in one batch (use
 * `startingVersion` + bounded triggers for large backfills).
 *
 * Semantics match Delta's `ignoreChanges`: appends stream exactly once;
 * a copy-on-write rewrite (merge/update/delete/compact) streams the
 * REWRITTEN files' rows again, because those bytes were genuinely
 * re-committed — downstream dedup on a key column (the standard CDC
 * consumer shape) absorbs them.
 */
class GraftMicroBatchStream(tx: TxTable, fullSchema: StructType,
    partitionColumns: Seq[String],
    options: CaseInsensitiveStringMap = CaseInsensitiveStringMap.empty(),
    partSpec: Seq[graft.table.PartField] = Nil)
  extends MicroBatchStream with SupportsAdmissionControl
  with SupportsTriggerAvailableNow {

  private val logDir = new Path(tx.root, "_log")
  private val dataDir = new Path(tx.root, "data")
  private val conf = tx.spark.sessionState.newHadoopConf()

  private val maxFilesOpt: Option[Int] =
    Option(options.get("maxFilesPerTrigger")).map(_.trim.toInt)
  private val maxBytesOpt: Option[Long] =
    Option(options.get("maxBytesPerTrigger")).map(_.trim.toLong)

  // Trigger.AvailableNow fences the run at the log head observed when
  // the query starts: every latestOffset answer is capped there, so the
  // run drains a fixed prefix in (possibly many) bounded batches and
  // stops — commits racing in behind the fence wait for the next run.
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(tx.currentVersion)

  override def getDefaultReadLimit: ReadLimit =
    (maxFilesOpt, maxBytesOpt) match {
      case (Some(f), Some(b)) =>
        ReadLimit.compositeLimit(Array(ReadLimit.maxFiles(f), ReadLimit.maxBytes(b)))
      case (Some(f), None) => ReadLimit.maxFiles(f)
      case (None, Some(b)) => ReadLimit.maxBytes(b)
      case _               => ReadLimit.allAvailable()
    }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def reportLatestOffset(): Offset = GraftOffset(tx.currentVersion)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startV = start.asInstanceOf[GraftOffset].version
    val head = availableNowCap match {
      case Some(cap) => cap
      case None      => tx.currentVersion
    }
    GraftOffset(admitUpTo(startV, head, limit))
  }

  private def limitBounds(limit: ReadLimit): (Option[Int], Option[Long]) =
    limit match {
      case f: ReadMaxFiles => (Some(f.maxFiles()), None)
      case b: ReadMaxBytes => (None, Some(b.maxBytes()))
      case c: CompositeReadLimit =>
        val parts = c.getReadLimits.map(limitBounds)
        (parts.flatMap(_._1).minOption, parts.flatMap(_._2).minOption)
      case _: ReadAllAvailable => (None, None)
      case _ => (None, None) // unknown limit kinds admit everything
    }

  /** Highest version ≤ `head` reachable from `startV` without the
    * cumulative added-file count/bytes crossing the limit. Walks raw
    * snapshot headers only — O(admitted commits), no manifest IO for
    * the count (sizes come from [[TxLog.readChanged]], which opens just
    * the commit's own new manifest). */
  private def admitUpTo(startV: Long, head: Long, limit: ReadLimit): Long = {
    if (head <= startV) return startV.max(head)
    val (maxFiles, maxBytes) = limitBounds(limit)
    if (maxFiles.isEmpty && maxBytes.isEmpty) return head
    // the initial snapshot (startV < 0) is version-atomic: admit the
    // snapshot as one batch positioned at the stream-start head; bounded
    // drains of large tables should set startingVersion instead
    if (startV < 0) return head
    var v = startV
    var files = 0L
    var bytes = 0L
    var done = false
    while (!done && v < head) {
      val changed = TxLog.readChanged(logDir, v + 1, conf)
      val cnt = changed.size
      val bs = changed.map(_.sizeBytes).sum
      val over = maxFiles.exists(files + cnt > _) ||
        maxBytes.exists(bytes + bs > _)
      if (over && v > startV) done = true      // ≥1 commit always admitted
      else { v += 1; files += cnt; bytes += bs; if (over) done = true }
    }
    v
  }

  override def initialOffset(): Offset = {
    val sv = Option(options.get("startingVersion")).map(_.trim)
    sv match {
      case None => GraftOffset(-1L)            // full snapshot first batch
      case Some(s) if s.equalsIgnoreCase("latest") =>
        GraftOffset(tx.currentVersion)         // only commits after start
      case Some(s) =>
        val v = s.toLong
        require(v >= 0, s"startingVersion $v must be >= 0 or 'latest'")
        GraftOffset(v - 1)                     // first batch = commits >= v
    }
  }

  override def deserializeOffset(json: String): Offset =
    GraftOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  private def filesFor(start: Long, end: Long): Seq[(String, Map[String, String], Long)] = {
    if (start < 0) {
      // initial load: the full live snapshot as of `end`
      TxLog.read(logDir, end, conf).files
        .map(f => (f.path, f.partitionValues, f.sizeBytes))
    } else {
      // incremental: files first added by commits in (start, end] —
      // O(changed) per commit via the commit's own manifest/remainder
      (start + 1 to end).flatMap(v =>
        TxLog.readChanged(logDir, v, conf)
          .map(f => (f.path, f.partitionValues, f.sizeBytes)))
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftOffset].version
    val e = end.asInstanceOf[GraftOffset].version
    if (e <= s && s >= 0) return Array.empty
    org.apache.spark.sql.graft.ScanBridge.parquetBatch(tx.spark, dataDir,
      fullSchema, partitionColumns, filesFor(s, e), partSpec)._1
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // factories are schema-determined and file-agnostic: one built over
    // an empty file list serves every batch's partitions
    org.apache.spark.sql.graft.ScanBridge.parquetBatch(tx.spark, dataDir,
      fullSchema, partitionColumns, Nil, partSpec)._2
}
