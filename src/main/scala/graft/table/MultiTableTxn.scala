package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import scala.collection.mutable.ArrayBuffer

/**
 * Atomic MULTI-TABLE transaction: any mix of append / overwrite /
 * copy-on-write delete across any number of tables becomes visible in
 * one atomic step, or not at all.
 *
 * The reference's commit primitive is a per-table optimistic CAS
 * (kinesis-firehose-stream/scripts/update_metadata.py:135-141 — one
 * `versionToken` swap per table), so a writer touching two tables can
 * expose a reader to the state between the two swaps. This coordinator
 * removes that window with a two-phase, roll-FORWARD protocol built on
 * the same put-if-absent primitive [[TxLog]]'s commits already use:
 *
 *  1. '''stage''' (slow, at op-declaration time): each operation writes
 *     its data files into its table's data directory. Nothing
 *     references them yet — invisible, crash-safe (vacuum reaps
 *     orphans after the grace window).
 *  2. '''publish''' (fast, metadata-only): each table CAS-commits its
 *     next header carrying `pendingTxn = <marker path>`. A pending
 *     header contributes NOTHING to reads: [[TxLog.readRaw]] resolves
 *     it against the marker before serving it.
 *  3. '''decide''' (the commit point): one atomic create of the marker
 *     file with COMMITTED flips every participating table live at
 *     once. An aborting coordinator — or any reader/writer that finds
 *     a marker still absent after `graft.txn.resolveWaitMs` — writes
 *     ABORTED through the same put-if-absent CAS instead; exactly one
 *     side wins, so a crashed coordinator can never wedge a table and
 *     a reader can never observe data whose transaction later fails.
 *
 * An aborted transaction leaves each published table a no-op version
 * (operation `ABORTED_TXN`, parent content) — history stays linear and
 * honest, and the staged files age out via vacuum.
 *
 * Isolation: per-table serializability matches the single-table ops —
 * append/overwrite rebase across concurrent commits; a staged delete
 * whose base snapshot moved aborts the whole transaction. One
 * operation per table per transaction (a second op would have to read
 * its own uncommitted predecessor, which resolution hides by design).
 *
 * At 100 TB the protocol costs what single-table commits cost: the
 * stage phase is the same distributed write the op would do anyway,
 * and publish/decide are O(tables) tiny metadata CAS writes — no
 * global lock, no cross-table coordination service, and marker probes
 * are cached terminally so steady-state reads pay nothing.
 */
final class GraftTxn private (spark: SparkSession, txnDir: Path) {

  val id: String = java.util.UUID.randomUUID().toString

  private val conf = spark.sessionState.newHadoopConf()
  private val marker: String = {
    val p = new Path(txnDir, s"$id.txn")
    p.getFileSystem(conf).makeQualified(p).toString
  }

  private final case class StagedOp(table: TxTable, op: String,
      commitFn: Option[String] => Long)
  private val ops = ArrayBuffer.empty[StagedOp]
  private var done = false

  private def stage(t: TxTable, op: String)(
      f: => (Option[String] => Long)): this.type = synchronized {
    require(!done, s"transaction $id is already finished")
    require(t.branchName.isEmpty,
      "multi-table transactions operate on main table refs only")
    require(!ops.exists(o => o.table.root.toString == t.root.toString),
      s"transaction $id already has an operation on ${t.name} — " +
        "one operation per table per transaction")
    // stage under this txn's in-flight scope: the files written here
    // are protected from same-process vacuums until publish — and an
    // explicit ABORT releases them in one sweep, keeping the
    // "aborted staged files are immediately reapable orphans" contract
    val prev = TxLog.inFlightScope.get()
    TxLog.inFlightScope.set(id)
    val fn = try f finally TxLog.inFlightScope.set(prev)
    ops += StagedOp(t, op, fn)
    this
  }

  /** Stage an append; data files are written NOW, visibility waits for
    * [[commit]]. An optional `(appId, version)` idempotent-writer
    * fence makes replayed streaming micro-batches no-ops — and it
    * COMPOSES with atomicity: the watermark rides the pending header,
    * so it only takes effect if the whole transaction commits (an
    * aborted attempt leaves the watermark unset and the replay
    * re-applies). */
  def append(t: TxTable, df: DataFrame,
      txn: Option[(String, Long)] = None): this.type =
    stage(t, "APPEND")(t.stageAppend(df, txn))

  /** Stage a whole-table overwrite. */
  def overwrite(t: TxTable, df: DataFrame): this.type =
    stage(t, "OVERWRITE")(t.stageOverwrite(df))

  /** Stage a copy-on-write delete. The rewrite is computed against the
    * table's snapshot as of THIS call; if the table moves before
    * [[commit]], the whole transaction aborts (serializability).
    * `partitionFilter` prunes the rewrite to affected partitions,
    * exactly as on the single-table [[TxTable.delete]]. */
  def delete(t: TxTable, predicate: Column,
      partitionFilter: Map[String, String] = Map.empty): this.type =
    stage(t, "DELETE")(t.stageDelete(predicate, partitionFilter))

  /** Stage a keyed last-writer-wins upsert ([[TxTable.merge]]'s
    * semantics, incl. merge-on-read routing via the table's merge-mode
    * property). Same exactly-once base-snapshot contract as
    * [[delete]]. */
  def merge(t: TxTable, batch: DataFrame, key: String, orderCol: String,
      txn: Option[(String, Long)] = None,
      deleteCol: Option[String] = None): this.type =
    stage(t, "MERGE")(
      t.stageMerge(batch, key, orderCol, txn = txn, deleteCol = deleteCol))

  /** Publish every staged header (pending), then decide COMMITTED —
    * the all-or-nothing commit point. Returns table name → committed
    * version. Throws [[CommitConflictException]] if any publish CAS
    * fails or a concurrent resolver force-aborted the marker; the
    * transaction is then fully aborted (published headers become
    * no-op `ABORTED_TXN` versions). */
  def commit(): Map[String, Long] = synchronized {
    require(!done, s"transaction $id is already finished")
    done = true
    try {
      val versions = publishPending()
      decide() match {
        case TxLog.TxnCommitted => versions
        case other => throw new CommitConflictException(
          s"transaction $id was $other by a concurrent resolver " +
            "(publish window exceeded graft.txn.resolveWaitMs?)")
      }
    } finally
      // published files were already released per-commit; this drops
      // the scope bookkeeping (and, on an aborted publish, restores
      // immediate reapability of the never-published remainder)
      TxLog.releaseInFlightScope(id)
  }

  /** Abort: staged data files become vacuum-reapable orphans; any
    * already-published headers resolve to no-ops. Idempotent; a
    * losing race against a COMMITTED decision surfaces as the final
    * state. */
  def abort(): String = synchronized {
    done = true
    TxLog.releaseInFlightScope(id)
    TxLog.decideTxn(marker, TxLog.TxnAborted, conf)
  }

  /** Phase 2 alone (spec access): CAS-publish each staged header with
    * the pending marker, sorted by table path so transactions over
    * overlapping table sets meet in a deterministic order. */
  private[graft] def publishPending(): Map[String, Long] = {
    val committed = ArrayBuffer.empty[(String, Long)]
    try {
      ops.sortBy(_.table.root.toString).foreach { o =>
        committed += o.table.name -> o.commitFn(Some(marker))
      }
    } catch {
      case e: Throwable =>
        TxLog.decideTxn(marker, TxLog.TxnAborted, conf)
        throw new CommitConflictException(
          s"transaction $id aborted during publish: ${e.getMessage}")
    }
    committed.toMap
  }

  /** Phase 3 alone (spec access): the atomic commit point. */
  private[graft] def decide(): String =
    TxLog.decideTxn(marker, TxLog.TxnCommitted, conf)

  private[graft] def markerPath: String = marker
}

object GraftTxn {
  /** Begin a transaction whose marker lives under `txnDir` (markers
    * are tiny, immutable once decided, and referenced by absolute path
    * from participating headers — keep the directory with the
    * warehouse). */
  def begin(spark: SparkSession, txnDir: Path): GraftTxn =
    new GraftTxn(spark, txnDir)
}
