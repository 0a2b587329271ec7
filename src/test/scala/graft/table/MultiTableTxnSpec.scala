package graft.table

import graft.SparkSpec
import graft.ingest.SampleData
import graft.model.Schemas
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Multi-table transaction protocol: stage → publish(pending) →
  * decide(marker CAS). Covers atomic visibility, in-flight
  * invisibility with reader force-abort, whole-txn abort on a
  * publish conflict, crashed-coordinator recovery, and the no-op
  * semantics of aborted versions (time travel + change feed). */
class MultiTableTxnSpec extends SparkSpec {

  // keep reader force-abort fast for the in-flight tests (default 3 s)
  spark.sparkContext.hadoopConfiguration.setLong("graft.txn.resolveWaitMs", 300L)

  private def freshCatalog(name: String): TableCatalog =
    new TableCatalog(spark, new Path(freshDir(name)))

  private def seeded(cat: TableCatalog, table: String, n: Int, seed: Long): TxTable = {
    val t = cat.createTable("txn", table, Schemas.transactions, Seq("date"))
    t.append(SampleData.transactions(spark, n, seed = seed))
    t
  }

  test("commit applies append + delete across two tables atomically") {
    val cat = freshCatalog("txn_commit")
    val a = seeded(cat, "a", 50, seed = 1L)
    val b = seeded(cat, "b", 50, seed = 2L)
    val extra = SampleData.transactions(spark, 20, seed = 3L)
    val versions = cat.beginTransaction()
      .append(a, extra)
      .delete(b, col("risk_score") === "HIGH")
      .commit()
    assert(versions === Map("txn.a" -> 2L, "txn.b" -> 2L))
    assert(a.toDF.count() === 70)
    val expectedB = b.asOf(1).filter(col("risk_score") =!= "HIGH").count()
    assert(b.toDF.count() === expectedB)
    // committed txn versions read as their real operations
    assert(a.snapshot.operation === "APPEND")
    assert(b.snapshot.operation === "DELETE")
  }

  test("published-but-undecided state is invisible; a reader force-aborts it") {
    val cat = freshCatalog("txn_inflight")
    val a = seeded(cat, "a", 40, seed = 4L)
    val b = seeded(cat, "b", 40, seed = 5L)
    val txn = cat.beginTransaction()
      .append(a, SampleData.transactions(spark, 10, seed = 6L))
      .append(b, SampleData.transactions(spark, 10, seed = 7L))
    txn.publishPending()
    // marker missing → the reader waits resolveWaitMs, then forces
    // ABORTED: uncommitted data is never served
    assert(a.toDF.count() === 40)
    assert(b.toDF.count() === 40)
    // the coordinator's late decide loses the marker CAS
    assert(txn.decide() === TxLog.TxnAborted)
    // aborted versions are explicit no-ops in history
    assert(a.currentVersion === 2)
    assert(a.snapshot.operation === "ABORTED_TXN")
    assert(a.snapshot.files.map(_.path).toSet ===
      a.snapshotAt(1).files.map(_.path).toSet)
  }

  test("decide(COMMITTED) after publish flips both tables live at once") {
    val cat = freshCatalog("txn_decide")
    val a = seeded(cat, "a", 30, seed = 8L)
    val b = seeded(cat, "b", 30, seed = 9L)
    val txn = cat.beginTransaction()
      .append(a, SampleData.transactions(spark, 5, seed = 10L))
      .append(b, SampleData.transactions(spark, 5, seed = 11L))
    txn.publishPending()
    assert(txn.decide() === TxLog.TxnCommitted)
    assert(a.toDF.count() === 35)
    assert(b.toDF.count() === 35)
  }

  test("a publish CAS conflict aborts the WHOLE transaction") {
    val cat = freshCatalog("txn_conflict")
    val a = seeded(cat, "a", 40, seed = 12L)
    val b = seeded(cat, "b", 40, seed = 13L)
    val txn = cat.beginTransaction()
      .append(a, SampleData.transactions(spark, 10, seed = 14L))
      // staged against v1 of b; the external DELETE below REWRITES b's
      // files, so this rewrite's inputs are stale — a true write-write
      // conflict that must fail the publish (a blind append would
      // rebase instead, see the WriteSerializable spec in TxTableSpec)
      .delete(b, col("risk_score") === "HIGH")
    val externallyDeleted =
      b.toDF.filter(col("status") === "FAILED").count()
    b.delete(col("status") === "FAILED")
    val e = intercept[CommitConflictException](txn.commit())
    assert(e.getMessage.contains("aborted"))
    // a published before b (path sort order) — its pending version
    // resolves to a no-op; b kept only the external delete's effect
    assert(a.toDF.count() === 40)
    assert(a.snapshot.operation === "ABORTED_TXN")
    assert(b.toDF.count() === 40 - externallyDeleted)
  }

  test("crashed coordinator: next writer recovers the table by force-abort") {
    val cat = freshCatalog("txn_crash")
    val a = seeded(cat, "a", 25, seed = 16L)
    val txn = cat.beginTransaction()
      .append(a, SampleData.transactions(spark, 10, seed = 17L))
    txn.publishPending()
    // coordinator "crashes" here (no decide). A later writer's head
    // read resolves the stale txn and the append lands on the no-op.
    a.append(SampleData.transactions(spark, 5, seed = 18L))
    assert(a.toDF.count() === 30)
    assert(a.currentVersion === 3)
    assert(a.asOf(2).count() === 25)          // aborted no-op version
    // ...and the late decide reports the loss instead of succeeding
    assert(txn.decide() === TxLog.TxnAborted)
  }

  test("aborted versions are no-ops to time travel and the change feed") {
    val cat = freshCatalog("txn_cdf")
    val a = seeded(cat, "a", 30, seed = 19L)
    val txn = cat.beginTransaction()
      .append(a, SampleData.transactions(spark, 10, seed = 20L))
    txn.publishPending()
    assert(txn.abort() === TxLog.TxnAborted)
    a.append(SampleData.transactions(spark, 7, seed = 21L))
    assert(a.asOf(2).count() === 30)
    // v2 (aborted) contributes nothing; v3 contributes its 7 inserts
    val feed = a.changeFeed(2, 3)
    assert(feed.count() === 7)
    assert(feed.filter(col("_commit_version") === 2).count() === 0)
  }

  test("merge + append commit atomically (CDC upsert with audit log)") {
    val cat = freshCatalog("txn_merge")
    val a = seeded(cat, "a", 50, seed = 24L)
    val audit = cat.createTable("txn", "audit", Schemas.transactions, Nil)
    val mods = a.toDF.orderBy("transaction_id").limit(15)
      .withColumn("amount", lit(1234.56).cast(
        org.apache.spark.sql.types.DecimalType(12, 2)))
      .withColumn("processing_timestamp", col("processing_timestamp") + 1L)
    cat.beginTransaction()
      .merge(a, mods, key = "transaction_id", orderCol = "processing_timestamp")
      .append(audit, mods)
      .commit()
    assert(a.toDF.count() === 50)
    assert(a.toDF.filter(col("amount") === 1234.56).count() === 15)
    assert(audit.toDF.count() === 15)
    assert(a.snapshot.operation === "MERGE")
  }

  test("SQL transaction: INSERT + DELETE across tables commit atomically") {
    val cat = freshCatalog("txn_sql")
    val a = seeded(cat, "a", 40, seed = 26L)
    val b = seeded(cat, "b", 40, seed = 27L)
    val highB = b.toDF.filter(col("risk_score") === "HIGH").count()
    val res = GraftSql.transaction(cat, Seq(
      "INSERT INTO txn.a SELECT * FROM txn.b WHERE risk_score = 'HIGH'",
      "DELETE FROM txn.b WHERE risk_score = 'HIGH'"))
    assert(res.collect().map(r => (r.getString(0), r.getLong(1))).toMap ===
      Map("txn.a" -> 2L, "txn.b" -> 2L))
    assert(a.toDF.count() === 40 + highB)
    assert(b.toDF.count() === 40 - highB)
    // an unsupported statement aborts without touching anything
    intercept[IllegalArgumentException](GraftSql.transaction(cat, Seq(
      "INSERT INTO txn.a SELECT * FROM txn.b",
      "OPTIMIZE txn.b")))
    assert(a.currentVersion === 2 && b.currentVersion === 2)
  }

  test("exactly-once fence composes with atomicity across replays") {
    val cat = freshCatalog("txn_fence")
    val main = seeded(cat, "main", 30, seed = 28L)
    val audit = cat.createTable("txn", "audit", Schemas.transactions, Nil)
    val batch = main.toDF.orderBy("transaction_id").limit(10)
      .withColumn("processing_timestamp", col("processing_timestamp") + 1L)
      .cache()
    val fence0 = Some(("app", 0L))
    def applyBatch(f: Option[(String, Long)]) = cat.beginTransaction()
      .merge(main, batch, "transaction_id", "processing_timestamp", txn = f)
      .append(audit, batch, txn = f)
      .commit()
    applyBatch(fence0)
    assert(main.toDF.count() === 30 && audit.toDF.count() === 10)
    val (vm, va) = (main.currentVersion, audit.currentVersion)
    // replay after success: BOTH tables fence to no-ops — no versions
    applyBatch(fence0)
    assert(main.currentVersion === vm && audit.currentVersion === va)
    assert(audit.toDF.count() === 10)
    // crash before decide: the fence watermark rode the pending
    // headers, which ABORT — so the replayed batch must re-apply
    val fence1 = Some(("app", 1L))
    val crashed = cat.beginTransaction()
      .merge(main, batch, "transaction_id", "processing_timestamp", txn = fence1)
      .append(audit, batch, txn = fence1)
    crashed.publishPending()
    assert(crashed.abort() === TxLog.TxnAborted)
    assert(audit.toDF.count() === 10)        // aborted append invisible
    applyBatch(fence1)
    assert(audit.toDF.count() === 20)        // replay applied ONCE
    assert(main.toDF.count() === 30)
    batch.unpersist()
  }

  test("streaming fan-out batch: DLQ on failure, atomic on success") {
    val cat = freshCatalog("txn_fanout")
    val main = seeded(cat, "main", 20, seed = 29L)
    val audit = cat.createTable("txn", "audit", Schemas.transactions, Nil)
    val errors = freshDir("txn_fanout_dlq")
    val batch = graft.ingest.SampleData.transactions(spark, 8, seed = 30L)
    graft.ingest.StreamingIngest.fanOutBatch(spark, main, audit,
      new Path(freshDir("txn_fanout_markers")), batch, batchId = 0L,
      errorsDir = errors, appId = "fan")
    assert(main.toDF.count() === 28 && audit.toDF.count() === 8)
    // replayed micro-batch (same appId/batchId) is a no-op on BOTH
    graft.ingest.StreamingIngest.fanOutBatch(spark, main, audit,
      new Path(freshDir("txn_fanout_markers2")), batch, batchId = 0L,
      errorsDir = errors, appId = "fan")
    assert(main.toDF.count() === 28 && audit.toDF.count() === 8)
  }

  test("overlapping concurrent transactions serialize: both commit") {
    val cat = freshCatalog("txn_overlap")
    val shared = seeded(cat, "shared", 20, seed = 31L)
    val only1 = seeded(cat, "only1", 20, seed = 32L)
    val only2 = seeded(cat, "only2", 20, seed = 33L)
    val txn1 = cat.beginTransaction()
      .append(shared, SampleData.transactions(spark, 5, seed = 34L))
      .append(only1, SampleData.transactions(spark, 5, seed = 35L))
    txn1.publishPending()
    // txn2 shares `shared`: its publish lands behind txn1's pending
    // header and BLOCKS in resolution (polling the marker) — txn1's
    // decide inside the resolve window lets txn2 rebase and commit
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fut = Future {
      cat.beginTransaction()
        .append(shared, SampleData.transactions(spark, 7, seed = 36L))
        .append(only2, SampleData.transactions(spark, 7, seed = 37L))
        .commit()
    }
    Thread.sleep(100)                 // let txn2 reach the poll
    assert(txn1.decide() === TxLog.TxnCommitted)
    Await.result(fut, 30.seconds)
    assert(shared.toDF.count() === 20 + 5 + 7)
    assert(only1.toDF.count() === 25)
    assert(only2.toDF.count() === 27)
  }

  test("BEGIN;...;COMMIT text block runs as one transaction; SHOW TRANSACTIONS lists it") {
    val cat = freshCatalog("txn_block")
    val a = seeded(cat, "a", 30, seed = 45L)
    val b = seeded(cat, "b", 30, seed = 46L)
    val res = GraftSql.sql(cat, """
      BEGIN;
      INSERT INTO txn.a SELECT * FROM txn.b WHERE risk_score = 'LOW';
      DELETE FROM txn.b WHERE risk_score = 'LOW';
      COMMIT""")
    assert(res.columns.toSeq === Seq("table", "version"))
    val lowB = 30 - b.toDF.count()
    assert(a.toDF.count() === 30 + lowB && lowB > 0)
    val txns = cat.listTransactions().collect()
    assert(txns.length === 1 && txns.head.getString(1) === "COMMITTED")
    // and through SQL
    assert(GraftSql.sql(cat, "SHOW TRANSACTIONS").count() === 1)
  }

  test("marker GC reaps only markers no readable header references") {
    val cat = freshCatalog("txn_gc")
    val a = seeded(cat, "a", 20, seed = 38L)
    cat.beginTransaction()
      .append(a, SampleData.transactions(spark, 5, seed = 39L))
      .commit()
    // referenced by a's v2 header — must survive even with zero grace
    assert(cat.vacuumTxnMarkers(graceMillis = 0L) === 0)
    assert(a.toDF.count() === 25)
    // advance the head, then expire the referencing header
    a.append(SampleData.transactions(spark, 5, seed = 48L))
    assert(a.expireSnapshots(retainVersions = 1) > 0)
    assert(cat.vacuumTxnMarkers(graceMillis = 0L) === 1)
    assert(a.toDF.count() === 30)
  }

  test("a publish landing on an index-chunk boundary must not self-abort") {
    val logDir = new Path(freshDir("txn_chunk"), "_log")
    val conf = spark.sparkContext.hadoopConfiguration
    def snap(v: Long, pending: Option[String] = None) = Snapshot(
      version = v, timestampMs = 1000L + v,
      operation = if (v == 0) "CREATE" else "APPEND",
      schemaJson = Schemas.transactions.json, partitionColumns = Nil,
      files = Nil, pendingTxn = pending)
    var expected: Option[Long] = None
    (0L until TxLog.IndexChunkSize - 1).foreach { v =>
      TxLog.commit(logDir, expected, snap(v), conf)
      expected = Some(v)
    }
    val marker = new Path(freshDir("txn_chunk_m"), "m.txn")
    val qual = marker.getFileSystem(conf).makeQualified(marker).toString
    // version 255: (next+1) % 256 == 0 triggers the chunk write, which
    // walks every header in range INCLUDING the pending one just
    // published — it must skip, never wait out and force-abort the
    // committer's own still-undecided transaction
    TxLog.commit(logDir, expected,
      snap(TxLog.IndexChunkSize - 1, Some(qual)), conf)
    assert(TxLog.txnState(qual, conf).isEmpty,
      "the chunk writer decided the publisher's own marker")
    assert(TxLog.decideTxn(qual, TxLog.TxnCommitted, conf) ===
      TxLog.TxnCommitted)
    assert(TxLog.read(logDir, TxLog.IndexChunkSize - 1, conf)
      .pendingTxn.isEmpty)
    // the skipped 0-255 chunk HEALS at the next boundary, once the
    // marker is terminal
    val f = logDir.getFileSystem(conf)
    val skipped = new Path(logDir, f"ci-${0L}%08d-${TxLog.IndexChunkSize - 1}%08d.index.json")
    assert(!f.exists(skipped))
    (TxLog.IndexChunkSize until 2 * TxLog.IndexChunkSize).foreach { v =>
      TxLog.commit(logDir, Some(v - 1), snap(v), conf)
    }
    assert(f.exists(skipped), "next boundary did not heal the skipped chunk")
  }

  test("expire protects the parents aborted-txn headers resolve to") {
    val cat = freshCatalog("txn_expire")
    val a = seeded(cat, "a", 20, seed = 47L)             // v1: 20 rows
    val txn = cat.beginTransaction()
      .append(a, SampleData.transactions(spark, 5, seed = 49L))
    txn.publishPending()
    txn.abort()                                          // v2: ABORTED_TXN
    a.append(SampleData.transactions(spark, 5, seed = 51L))  // v3
    // keep v2..head — v2 (aborted) serves v1's CONTENT, so v1's header
    // must survive the expiration of everything below the horizon
    assert(a.expireSnapshots(retainVersions = 2) >= 0)
    assert(a.asOf(2).count() === 20)                     // still readable
    assert(a.toDF.count() === 25)
  }

  test("vacuum keeps an aborted version's own manifest-list and manifest") {
    // ADVICE r12: an ABORTED-txn version RESOLVES to its parent's
    // content, but PARSING its stored header still loads the aborted
    // version's own manifest-list file (and, through it, the manifest
    // its staged files went to) — vacuum's referenced set must include
    // the STORED refs, or a retained aborted version becomes unreadable
    // to any cold process after the sweep.
    val root = new Path(freshDir("vac_aborted"), "t")
    val logDir = new Path(root, "_log")
    val conf = spark.sparkContext.hadoopConfiguration
    def df(i: Int) = DataFile(f"d$i%05d.parquet", Map.empty, 10L, 100L)
    var files = Vector.empty[DataFile]
    var next = 0
    var expected: Option[Long] = None
    def burst(n: Int, pending: Option[String] = None): Long = {
      files = files ++ (0 until n).map { _ => next += 1; df(next) }
      val v = expected.map(_ + 1).getOrElse(0L)
      TxLog.commit(logDir, expected, Snapshot(version = v,
        timestampMs = 1700000000000L + v, operation =
          if (v == 0) "CREATE" else "APPEND",
        schemaJson = Schemas.transactions.json, partitionColumns = Nil,
        files = files, pendingTxn = pending), conf)
      expected = Some(v)
      v
    }
    // tier-spread bursts (the LayoutFuzzSpec life-cycle shape, TierUnit
    // 33) push the ref list past the inline bound → manifest-list
    // files appear
    burst(0)
    Seq(33, 33, 33, 150, 150, 150, 550, 550, 550).foreach(burst(_))
    assert(TxLog.readRaw(logDir, expected.get, conf).manifestList.isDefined)
    // an ABORTED txn commit that spilled a fresh manifest + list file
    // (2200 files → a tier-4 manifest: no tier fills to the merge
    // threshold, so refs stay 10 > inline bound and a NEW list spills)
    val marker = new Path(freshDir("vac_aborted_m"), "m.txn")
    val qual = marker.getFileSystem(conf).makeQualified(marker).toString
    val abortedV = burst(2200, pending = Some(qual))
    assert(TxLog.decideTxn(qual, TxLog.TxnAborted, conf) === TxLog.TxnAborted)
    val storedAborted = TxLog.readStored(logDir, abortedV, conf)
    val abortedList = storedAborted.manifestList.get
    val abortedManifests = storedAborted.manifests.map(_.path)
    // the aborted files must not survive into the next commit's state
    files = TxLog.read(logDir, abortedV, conf).files.toVector
    burst(1)
    // vacuum with every version retained: nothing a retained header
    // NEEDS — resolved or stored — may be deleted
    val t = TxTable.open(spark, root, "vac.t")
    t.vacuum(retainVersions = 100, graceMillis = 0)
    val base = new java.io.File(logDir.toUri.getPath)
    assert(new java.io.File(base, abortedList).exists(),
      "vacuum deleted the aborted version's manifest-list file")
    abortedManifests.foreach { m =>
      // header-CARRIED manifests (`hdr:vN`) live inside header N —
      // vacuum never touches headers, but the carrier must still be
      // there for the aborted header to parse
      if (m.startsWith("hdr:v")) {
        val cv = m.stripPrefix("hdr:v").takeWhile(_.isDigit).toLong
        assert(new java.io.File(base, f"v$cv%08d.metadata.json").exists(),
          s"carrier header for $m missing")
      } else
        assert(new java.io.File(base, m).exists(),
          s"vacuum deleted manifest $m referenced by the aborted header")
    }
    // a cold process (caches purged) can still walk the whole log
    TxLog.purgeRawCacheUnder(logDir)
    (0L to expected.get).foreach(v => TxLog.read(logDir, v, conf))
  }

  test("protocol fuzz: random crash/abort/commit interleavings conserve data") {
    val cat = freshCatalog("txn_fuzz")
    val a = seeded(cat, "a", 10, seed = 90L)
    val b = cat.createTable("txn", "b", Schemas.transactions, Nil)
    var expectedA = 10L
    var expectedB = 0L
    val rnd = new scala.util.Random(7)   // deterministic interleavings
    (1 to 10).foreach { i =>
      val batch = SampleData.transactions(spark, 3, seed = 200L + i)
      val txn = cat.beginTransaction().append(a, batch).append(b, batch)
      rnd.nextInt(5) match {
        case 0 | 1 =>
          txn.commit(); expectedA += 3; expectedB += 3
        case 2 =>                         // clean abort after publish
          txn.publishPending(); txn.abort()
        case 3 =>                         // coordinator crash mid-flight
          txn.publishPending()
        case 4 =>                         // crash + a racing writer
          txn.publishPending()
          a.append(SampleData.transactions(spark, 2, seed = 300L + i))
          expectedA += 2
      }
      // the invariant, after EVERY step: exactly the committed data,
      // nothing from undecided or aborted attempts
      assert(a.toDF.count() === expectedA, s"table a after step $i")
      assert(b.toDF.count() === expectedB, s"table b after step $i")
    }
    // the whole chain stays readable (aborted versions resolve cleanly)
    (0L to a.currentVersion).foreach(v => a.asOf(v).count())
    (0L to b.currentVersion).foreach(v => b.asOf(v).count())
  }

  test("explicit abort before publish leaves no trace in any table") {
    val cat = freshCatalog("txn_early_abort")
    val a = seeded(cat, "a", 20, seed = 22L)
    val txn = cat.beginTransaction()
      .append(a, SampleData.transactions(spark, 10, seed = 23L))
    txn.abort()
    assert(a.currentVersion === 1)
    assert(a.toDF.count() === 20)
    // the staged files are orphans under data/ until vacuum's grace
    // window passes — and vacuum with a zero grace reaps them
    assert(a.vacuum(retainVersions = 2, graceMillis = 0L) > 0)
    assert(a.toDF.count() === 20)
  }

  test("transactional SQL DELETE prunes to affected partitions") {
    val cat = freshCatalog("txn_delete_prune")
    val a = cat.createTable("txn", "a", Schemas.transactions, Seq("date"))
    // the generator's timestamps land on one date — spread rows over
    // three so partition pruning has something to prune
    a.append(SampleData.transactions(spark, 60, seed = 40L)
      .withColumn("date", date_add(col("date"),
        pmod(abs(hash(col("transaction_id"))), lit(3)).cast("int"))))
    val dates = a.snapshot.files.flatMap(_.partitionValues.get("date"))
      .distinct.sorted
    assert(dates.size >= 2, "need at least two date partitions")
    val target = dates.head
    val untouchedBefore = a.snapshot.files
      .filter(_.partitionValues.get("date").exists(_ != target))
      .map(_.path).toSet
    val before = a.toDF.count()
    val inTarget = a.toDF.filter(col("date") === target).count()
    GraftSql.transaction(cat,
      Seq(s"DELETE FROM txn.a WHERE date = '$target'"))
    assert(a.toDF.count() === before - inTarget)
    // only the target partition's files were rewritten: every other
    // partition's files survive by identity (no full-table COW)
    val untouchedAfter = a.snapshot.files
      .filter(_.partitionValues.get("date").exists(_ != target))
      .map(_.path).toSet
    assert(untouchedAfter === untouchedBefore)
  }

  /** Fault-injected commit protocol: marker (.txn) CAS writes carrying
    * `slowContent` sleep `delayMs` before publishing — a slow object
    * store / delayed-visibility stand-in. Everything else passes
    * straight through to the real local protocol. */
  private class SlowMarkerProtocol(delayMs: Long, slowContent: String)
      extends CommitProtocol {
    override def putIfAbsent(f: org.apache.hadoop.fs.FileSystem,
        target: Path, content: Array[Byte], next: Long,
        expected: Option[Long]): Unit = {
      if (target.getName.endsWith(".txn") &&
          new String(content, java.nio.charset.StandardCharsets.UTF_8)
            == slowContent)
        Thread.sleep(delayMs)
      LocalAtomicRenameProtocol.putIfAbsent(f, target, content, next, expected)
    }
  }

  test("a marker CAS slower than the publish but inside the resolve window still commits") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // the window conf is snapshotted into each table's Hadoop conf at
    // open/create time — widen it BEFORE creating the tables
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.setLong("graft.txn.resolveWaitMs", 2000L)
    val cat = freshCatalog("txn_slow_cas_ok")
    val a = seeded(cat, "a", 30, seed = 30L)
    val b = seeded(cat, "b", 30, seed = 31L)
    TxLog.protocolOverride =
      Some(new SlowMarkerProtocol(400L, TxLog.TxnCommitted))
    try {
      val txn = cat.beginTransaction()
        .append(a, SampleData.transactions(spark, 5, seed = 32L))
        .append(b, SampleData.transactions(spark, 5, seed = 33L))
      txn.publishPending()
      // coordinator decides concurrently; its COMMITTED CAS lands
      // ~400 ms late — well inside the readers' 2 s resolve window
      val decide = Future(txn.decide())
      // readers poll the in-flight marker instead of force-aborting
      assert(a.toDF.count() === 35)
      assert(b.toDF.count() === 35)
      assert(Await.result(decide, 30.seconds) === TxLog.TxnCommitted)
    } finally {
      TxLog.protocolOverride = None
      hconf.setLong("graft.txn.resolveWaitMs", 300L)
    }
  }

  test("a marker CAS slower than the resolve window loses to a reader's force-abort") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val cat = freshCatalog("txn_slow_cas_lost")
    val a = seeded(cat, "a", 30, seed = 34L)
    val b = seeded(cat, "b", 30, seed = 35L)
    // suite default: 300 ms resolve window; the COMMITTED CAS takes
    // 1.5 s (abort CAS stays fast — it is the reader's own write)
    TxLog.protocolOverride =
      Some(new SlowMarkerProtocol(1500L, TxLog.TxnCommitted))
    try {
      val txn = cat.beginTransaction()
        .append(a, SampleData.transactions(spark, 5, seed = 36L))
        .append(b, SampleData.transactions(spark, 5, seed = 37L))
      txn.publishPending()
      val decide = Future(txn.decide())
      // the reader's window (from header publish time) expires first:
      // it force-aborts, and the coordinator's late CAS must LOSE —
      // uncommitted data is never served, exactly one side wins
      assert(a.toDF.count() === 30)
      assert(b.toDF.count() === 30)
      assert(Await.result(decide, 30.seconds) === TxLog.TxnAborted)
      assert(a.snapshot.operation === "ABORTED_TXN")
      assert(b.toDF.count() === 30)
    } finally TxLog.protocolOverride = None
  }
}
