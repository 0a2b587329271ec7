package graft.catalog

import graft.table.{TxLog, TxTable}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.types.StructType

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
 *    ADDED by commits in `(start, end]` — the per-commit `added`
 *    records written by the checkpointed log make that an O(changed)
 *    driver lookup, never a log replay;
 *  - rows are read through Spark's own vectorized parquet batch
 *    machinery over a per-batch snapshot-pinned file index.
 *
 * Semantics match Delta's `ignoreChanges`: appends stream exactly once;
 * a copy-on-write rewrite (merge/update/delete/compact) streams the
 * REWRITTEN files' rows again, because those bytes were genuinely
 * re-committed — downstream dedup on a key column (the standard CDC
 * consumer shape) absorbs them.
 */
class GraftMicroBatchStream(tx: TxTable, fullSchema: StructType,
    partitionColumns: Seq[String]) extends MicroBatchStream {

  private val logDir = new Path(tx.root, "_log")
  private val dataDir = new Path(tx.root, "data")
  private val conf = tx.spark.sessionState.newHadoopConf()

  override def latestOffset(): Offset = GraftOffset(tx.currentVersion)

  override def initialOffset(): Offset = GraftOffset(-1L)

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
      // incremental: files first added by commits in (start, end]
      (start + 1 to end).flatMap { v =>
        val added = TxLog.readAdded(logDir, v, conf).toSet
        if (added.isEmpty) Nil
        else TxLog.read(logDir, v, conf).files
          .filter(f => added.contains(f.path))
          .map(f => (f.path, f.partitionValues, f.sizeBytes))
      }
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftOffset].version
    val e = end.asInstanceOf[GraftOffset].version
    if (e <= s && s >= 0) return Array.empty
    org.apache.spark.sql.graft.ScanBridge.parquetBatch(tx.spark, dataDir,
      fullSchema, partitionColumns, filesFor(s, e))._1
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // factories are schema-determined and file-agnostic: one built over
    // an empty file list serves every batch's partitions
    org.apache.spark.sql.graft.ScanBridge.parquetBatch(tx.spark, dataDir,
      fullSchema, partitionColumns, Nil)._2
}
