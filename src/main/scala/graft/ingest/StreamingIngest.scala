package graft.ingest

import graft.model.Schemas
import graft.table.TxTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Streaming CDC ingest: the reference's Firehose delivery loop
 * (SURVEY.md §3.1-3.2) as a Structured Streaming query.
 *
 *  - micro-batch buffering 60 s / 1 MB (stack/firehose.py:92-94,152-154)
 *    → `Trigger.ProcessingTime` (configurable; tests use AvailableNow);
 *  - batch size 100 from the stream mapping (stack/firehose.py:255)
 *    → `maxFilesPerTrigger` on the file source;
 *  - Iceberg upsert on `transaction_id` (stack/firehose.py:95-101)
 *    → `foreachBatch { TxTable.merge }` — at-least-once delivery plus a
 *    keyed MERGE is exactly-once in effect (re-delivered rows upsert to
 *    the same state), the same argument the reference relies on;
 *  - failed deliveries land uncompressed under an `errors/` prefix after
 *    retry (stack/firehose.py:86-91,107-109,146-151,167-169)
 *    → per-batch try/catch writing the poisoned batch to `errorsDir`.
 */
object StreamingIngest {

  /** DynamoDB-Streams-shaped ingest: a directory of JSON envelope files
    * (the test-harness stand-in for the stream shard). */
  def start(
      spark: SparkSession,
      inputDir: String,
      table: TxTable,
      checkpointDir: String,
      errorsDir: String,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds"),
      maxFilesPerTrigger: Int = 100,
      /** Exactly-once fencing identity; defaults to the checkpoint
        * path. IMPORTANT: if a checkpoint is ever DELETED and recreated
        * at the same path (batchIds restart at 0), pass a fresh appId —
        * otherwise the table's old watermark fences the new batches
        * (the same rule Delta documents for its txn appId). */
      streamAppId: Option[String] = None,
      /** forward REMOVE events as table deletes (the reference drops
        * them); requires the stream view to carry pre-images. */
      propagateDeletes: Boolean = false): StreamingQuery = {

    val events = spark.readStream
      .schema(Schemas.cdcEnvelope)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(inputDir)

    val rows =
      if (propagateDeletes) CdcPipeline.dynamoStreamsPathWithDeletes(events)
      else CdcPipeline.dynamoStreamsPath(events)

    rows.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the stream executes under its own CLONED session; tune that
        // clone, not the user's session: every job in a micro-batch
        // merge is a sub-second multi-stage plan where adaptive
        // re-planning only adds per-stage submission latency (the
        // batch's shuffles are too small for AQE to improve), so turn
        // it off for the stream's merges and bind the table to the
        // clone so its scans/writes plan there too
        val ss = batch.sparkSession
        ss.conf.set("spark.sql.adaptive.enabled", "false")
        // the merge-on-read matched-refs probe is a LIMIT-capped
        // collect; Spark's executeTake scans 1 partition, then 4×
        // more, … — 3-4 separate jobs per micro-batch when the cap is
        // never reached (the overwhelmingly common case: live matches
        // are batch-bounded). Scanning everything in the FIRST take
        // job collapses that to one job per probe.
        ss.conf.set("spark.sql.limit.initialScanPartitionNum", "4096")
        // micro-batches are small by the buffering contract (60 s /
        // maxFilesPerTrigger), so 32 shuffle partitions means ~70
        // sub-10ms tasks per merge job — task scheduling, not work.
        // 8 reducers keep every shuffle round 4x cheaper to schedule
        // and still spread a catch-up batch (AQE stays off for plan
        // latency; override via the stream session conf if a deployment
        // tails multi-GB batches).
        if (ss.conf.getOption("spark.graft.stream.shufflePartitions")
              .forall(_ != "keep"))
          ss.conf.set("spark.sql.shuffle.partitions",
            ss.conf.getOption("spark.graft.stream.shufflePartitions")
              .getOrElse("8"))
        mergeBatch(table.withSession(ss), batch, batchId, errorsDir,
          streamAppId = Some(streamAppId.getOrElse(checkpointDir)),
          deleteCol = if (propagateDeletes) Some("_deleted") else None)
      }
      .start()
  }

  /** ATOMIC FAN-OUT ingest: every micro-batch upserts the MAIN table
    * and appends the raw winners to an AUDIT table in ONE multi-table
    * transaction ([[graft.table.GraftTxn]]) under ONE exactly-once
    * fence — downstream readers can never observe the upsert without
    * its audit record (or vice versa), and a crash at ANY point
    * replays to exactly-once effects on BOTH tables: the fence
    * watermark rides the pending headers, so it only takes effect if
    * the marker committed; an aborted attempt leaves both watermarks
    * unset and the replayed batch re-applies. The pattern the
    * reference cannot express with one Firehose delivery per table. */
  def startFanOut(
      spark: SparkSession,
      inputDir: String,
      main: TxTable,
      audit: TxTable,
      txnDir: org.apache.hadoop.fs.Path,
      checkpointDir: String,
      errorsDir: String,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds"),
      maxFilesPerTrigger: Int = 100,
      streamAppId: Option[String] = None): StreamingQuery = {
    val events = spark.readStream
      .schema(Schemas.cdcEnvelope)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(inputDir)
    CdcPipeline.dynamoStreamsPath(events).writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // same per-stream tuning as start(): the fan-out's merge +
        // append run on the stream's cloned session with AQE off
        val ss = batch.sparkSession
        ss.conf.set("spark.sql.adaptive.enabled", "false")
        ss.conf.set("spark.sql.limit.initialScanPartitionNum", "4096")
        if (ss.conf.getOption("spark.graft.stream.shufflePartitions")
              .forall(_ != "keep"))
          ss.conf.set("spark.sql.shuffle.partitions",
            ss.conf.getOption("spark.graft.stream.shufflePartitions")
              .getOrElse("8"))
        fanOutBatch(ss, main.withSession(ss), audit.withSession(ss),
          txnDir, batch, batchId, errorsDir,
          appId = streamAppId.getOrElse(checkpointDir))
      }
      .start()
  }

  private[graft] def fanOutBatch(spark: SparkSession, main: TxTable,
      audit: TxTable, txnDir: org.apache.hadoop.fs.Path, batch: DataFrame,
      batchId: Long, errorsDir: String, appId: String): Unit = {
    if (!batch.isEmpty) {
      val fence = Some((appId, batchId))
      try graft.table.GraftTxn.begin(spark, txnDir)
        .merge(main, batch, key = "transaction_id",
          orderCol = "processing_timestamp", txn = fence)
        .append(audit, batch, txn = fence)
        .commit()
      catch {
        case scala.util.control.NonFatal(e) =>
          batch.write.mode("append").json(s"$errorsDir/batch=$batchId")
          org.slf4j.LoggerFactory.getLogger(getClass)
            .error(s"fan-out batch $batchId failed, wrote to DLQ: ${e.getMessage}")
      }
    }
  }

  /** One micro-batch commit with DLQ semantics. With `streamAppId`, the
    * (appId, batchId) pair rides the table's transaction watermark, so
    * a micro-batch replayed after a crash-between-commit-and-checkpoint
    * is FENCED instead of re-merged — exactly-once table effects on an
    * at-least-once stream. */
  private[ingest] def mergeBatch(table: TxTable, batch: DataFrame,
      batchId: Long, errorsDir: String,
      streamAppId: Option[String] = None,
      deleteCol: Option[String] = None): Unit = {
    // no isEmpty pre-check: that costs a limit-1 job through the whole
    // decode pipeline per micro-batch; merge() itself detects an empty
    // batch from its (cached) partition-count job and commits nothing
    try table.merge(batch, key = "transaction_id",
      orderCol = "processing_timestamp",
      txn = streamAppId.map(app => (app, batchId)),
      deleteCol = deleteCol)
    catch {
      case scala.util.control.NonFatal(e) =>
        // DLQ: reject path mirrors Firehose's errors/ prefix — keep the
        // batch replayable, then rethrow nothing (stream keeps going).
        batch.write.mode("append").json(s"$errorsDir/batch=$batchId")
        org.slf4j.LoggerFactory.getLogger(getClass)
          .error(s"batch $batchId failed, wrote to DLQ: ${e.getMessage}")
    }
  }

  /** Batch (non-streaming) path over the same dataflow: read every
    * envelope file currently in `inputDir` and merge once. */
  def ingestOnce(spark: SparkSession, inputDir: String, table: TxTable): Long = {
    val events = spark.read.schema(Schemas.cdcEnvelope).json(inputDir)
    table.merge(CdcPipeline.dynamoStreamsPath(events),
      key = "transaction_id", orderCol = "processing_timestamp")
  }
}
