package graft.table

import graft.SparkSpec
import graft.ingest.SampleData
import graft.model.Schemas
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Positional merge-on-read deletes (deletion vectors): one sorted
  * sidecar per data file, applied on the V1 scan by broadcast anti-join
  * and on the V2 scan by counting readers; retired automatically by
  * copy-on-write rewrites. */
class DeletionVectorSpec extends SparkSpec {

  test("deletePos removes exactly the matched rows without rewriting data") {
    val t = TxTable.create(spark, new Path(freshDir("dv_basic")), "t",
      Schemas.transactions, Seq("date"))
    val seed = SampleData.transactions(spark, 60, seed = 91L)
    t.append(seed)
    val dataFilesBefore = t.snapshot.files.map(_.path).toSet
    val nHigh = seed.filter(col("risk_score") === "HIGH").count()
    t.deletePos(col("risk_score") === "HIGH")
    // no data file rewritten — only vectors recorded
    assert(t.snapshot.files.map(_.path).toSet === dataFilesBefore)
    assert(t.snapshot.deletionVectors.nonEmpty)
    assert(t.toDF.count() === 60 - nHigh)
    assert(t.toDF.filter(col("risk_score") === "HIGH").count() === 0)
    // metadata count stays exact (vector cardinalities subtract)
    assert(t.count() === 60 - nHigh)
    // second positional delete MERGES per-file vectors (idempotent on
    // already-deleted rows, additive on new matches)
    val nMed = seed.filter(col("risk_score") === "MEDIUM").count()
    t.deletePos(col("risk_score").isin("HIGH", "MEDIUM"))
    assert(t.toDF.count() === 60 - nHigh - nMed)
    assert(t.count() === 60 - nHigh - nMed)
    // one vector per affected file, never stacking duplicates
    val perFile = t.snapshot.deletionVectors.groupBy(_.dataFile)
    assert(perFile.values.forall(_.size == 1))
  }

  test("copy-on-write rewrite retires the affected files' vectors") {
    val t = TxTable.create(spark, new Path(freshDir("dv_retire")), "t",
      Schemas.transactions, Seq("date"))
    val seed = SampleData.transactions(spark, 50, seed = 92L)
    t.append(seed)
    t.deletePos(col("risk_score") === "LOW")
    val live = t.toDF.count()
    assert(t.snapshot.deletionVectors.nonEmpty)
    // full compaction rewrites every file: vectors applied and retired
    t.compact()
    assert(t.snapshot.deletionVectors.isEmpty)
    assert(t.toDF.count() === live)
    assert(t.toDF.filter(col("risk_score") === "LOW").count() === 0)
  }

  test("V2 catalog scans apply deletion vectors (counting readers)") {
    val wh = freshDir("dv_v2")
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dv")
    spark.sql("CREATE TABLE graft.dv.t (id STRING, v INT)")
    val rows = (1 to 500).map(i => s"('r$i', $i)").mkString(", ")
    spark.sql(s"INSERT INTO graft.dv.t VALUES $rows")
    val cat = new TableCatalog(spark, new Path(wh))
    val tx = cat.getTable("dv", "t")
    tx.deletePos(col("v") % 7 === 0)
    val expect = (1 to 500).count(_ % 7 != 0)
    assert(spark.sql("SELECT count(*) AS n FROM graft.dv.t")
      .collect()(0).getLong(0) === expect)
    assert(spark.sql("SELECT count(*) AS n FROM graft.dv.t WHERE v % 7 = 0")
      .collect()(0).getLong(0) === 0)
    // selective predicate over the DV'd file still answers correctly
    // (data conjuncts stay residual above positional sub-scans)
    assert(spark.sql("SELECT v FROM graft.dv.t WHERE v IN (13, 14, 15)")
      .collect().map(_.getInt(0)).toSet === Set(13, 15))
    // and equality deletes compose with positional ones
    tx.deleteMor(col("v") === 13, "id")
    assert(spark.sql("SELECT count(*) AS n FROM graft.dv.t")
      .collect()(0).getLong(0) === expect - 1)
  }

  test("V2 counting readers stay exact across row groups and file splits") {
    val wh = freshDir("dv_splits")
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    val hconf = spark.sparkContext.hadoopConfiguration
    val oldBlock = hconf.get("parquet.block.size")
    val oldMaxPart = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      // tiny row groups at write time + tiny split size at read time:
      // the DV'd file plans as MANY splits over MANY row groups, so the
      // parquet-generated row-index column (exact per split, per row
      // group) is what this test actually exercises
      hconf.set("parquet.block.size", "16384")
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dvs")
      spark.sql("CREATE TABLE graft.dvs.t (id STRING, v INT)")
      val cat = new TableCatalog(spark, new Path(wh))
      val tx = cat.getTable("dvs", "t")
      import spark.implicits._
      tx.append((1 to 50000).map(i => (s"row$i", i)).toDF("id", "v")
        .coalesce(1))
      tx.deletePos(col("v") % 997 === 0)
      val expect = (1 to 50000).count(_ % 997 != 0)
      spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
      assert(spark.sql("SELECT count(*) AS n FROM graft.dvs.t")
        .collect()(0).getLong(0) === expect)
      val survivors = spark.sql(
        "SELECT v FROM graft.dvs.t WHERE v % 997 = 0 OR v % 991 = 0")
        .collect().map(_.getInt(0)).toSet
      assert(survivors === (1 to 50000)
        .filter(i => i % 997 != 0 && i % 991 == 0).toSet)
      // a PUSHABLE range predicate engages row-group skipping in the
      // DV'd sub-scan; the generated row indexes must stay exact so
      // exactly the vectored rows disappear
      val ranged = spark.sql(
        "SELECT v FROM graft.dvs.t WHERE v >= 40000 AND v <= 41000")
        .collect().map(_.getInt(0)).toSet
      assert(ranged === (40000 to 41000).filterNot(_ % 997 == 0).toSet)
    } finally {
      if (oldBlock == null) hconf.unset("parquet.block.size")
      else hconf.set("parquet.block.size", oldBlock)
      spark.conf.set("spark.sql.files.maxPartitionBytes", oldMaxPart)
    }
  }

  test("updateMor: positions + appended post-images, one commit, CDF images") {
    val t = TxTable.create(spark, new Path(freshDir("dv_upd")), "t",
      Schemas.transactions, Seq("date"),
      properties = Map(TxTable.ChangeFeedProperty -> "true"))
    val seed = SampleData.transactions(spark, 60, seed = 94L)
    t.append(seed)
    val filesBefore = t.snapshot.files.map(_.path).toSet
    val nHigh = seed.filter(col("risk_score") === "HIGH").count()
    t.updateMor(col("risk_score") === "HIGH",
      Map("amount" -> lit(77.77).cast(org.apache.spark.sql.types.DecimalType(12, 2))))
    // no original file rewritten; new post-image files appended
    assert(t.snapshot.files.map(_.path).toSet.intersect(filesBefore) === filesBefore)
    assert(t.snapshot.files.size > filesBefore.size)
    assert(t.snapshot.deletionVectors.nonEmpty)
    assert(t.toDF.count() === 60)
    assert(t.toDF.filter(col("amount") === 77.77).count() === nHigh)
    assert(t.count() === 60)
    // CDF carries both images
    val v = t.currentVersion
    val feed = t.changeFeed(v, v)
    assert(feed.filter(col("_change_type") === "update_preimage").count() === nHigh)
    assert(feed.filter(col("_change_type") === "update_postimage")
      .filter(col("amount") =!= 77.77).count() === 0)
  }

  test("write modes: SQL DELETE/UPDATE honor merge-on-read properties") {
    val cat = new TableCatalog(spark, new Path(freshDir("dv_modes")))
    val t = cat.createTable("analytics", "txns_mor",
      Schemas.transactions, Seq("date"),
      properties = Map(
        TxTable.DeleteModeProperty -> "merge-on-read",
        TxTable.UpdateModeProperty -> "merge-on-read"))
    val seed = SampleData.transactions(spark, 50, seed = 95L)
    t.append(seed)
    val filesBefore = t.snapshot.files.map(_.path).toSet
    cat.sql("DELETE FROM analytics.txns_mor WHERE risk_score = 'LOW'")
    cat.sql("UPDATE analytics.txns_mor SET status = 'FLAGGED' WHERE risk_score = 'HIGH'")
    // both statements were merge-on-read: originals untouched
    assert(t.snapshot.files.map(_.path).toSet.intersect(filesBefore) === filesBefore)
    assert(t.snapshot.deletionVectors.nonEmpty)
    val nLow = seed.filter(col("risk_score") === "LOW").count()
    val nHigh = seed.filter(col("risk_score") === "HIGH").count()
    assert(t.toDF.count() === 50 - nLow)
    assert(t.toDF.filter(col("risk_score") === "HIGH")
      .filter(col("status") =!= "FLAGGED").count() === 0)
    assert(nHigh === t.toDF.filter(col("status") === "FLAGGED" &&
      col("risk_score") === "HIGH").count())
  }

  test("merge-on-read MERGE: vectors for matched keys, appended winners") {
    val t = TxTable.create(spark, new Path(freshDir("dv_merge")), "t",
      Schemas.transactions, Seq("date"),
      properties = Map(
        TxTable.MergeModeProperty -> "merge-on-read",
        TxTable.ChangeFeedProperty -> "true"))
    val seed = SampleData.transactions(spark, 50, seed = 96L)
    t.append(seed)
    val filesBefore = t.snapshot.files.map(_.path).toSet
    val mods = seed.orderBy("transaction_id").limit(12)
      .withColumn("amount",
        lit(333.33).cast(org.apache.spark.sql.types.DecimalType(12, 2)))
      .withColumn("processing_timestamp", col("processing_timestamp") + 1L)
      .withColumn("__kill", lit(false))
    val kills = seed.orderBy(col("transaction_id").desc).limit(4)
      .withColumn("processing_timestamp", col("processing_timestamp") + 1L)
      .withColumn("__kill", lit(true))
    val news = SampleData.transactions(spark, 60, seed = 96L)
      .join(seed.select("transaction_id"), Seq("transaction_id"), "left_anti")
      .withColumn("__kill", lit(false))
    val nNew = news.count()
    t.merge(mods.unionByName(kills).unionByName(news.select(mods.columns.map(col): _*)),
      key = "transaction_id", orderCol = "processing_timestamp",
      deleteCol = Some("__kill"))
    // no original file rewritten; matched keys' old rows are vectored
    assert(t.snapshot.operation === "MERGE_MOR")
    assert(t.snapshot.files.map(_.path).toSet.intersect(filesBefore) === filesBefore)
    assert(t.snapshot.deletionVectors.nonEmpty)
    assert(t.toDF.count() === 50 - 4 + nNew)
    assert(t.count() === 50 - 4 + nNew)
    assert(t.toDF.filter(col("amount") === 333.33).count() === 12)
    // upsert contract holds: keys unique after the MOR merge
    assert(t.toDF.select("transaction_id").distinct().count() === 50 - 4 + nNew)
    // CDF classification identical to the COW merge
    val v = t.currentVersion
    val feed = t.changeFeed(v, v)
    assert(feed.filter(col("_change_type") === "insert").count() === nNew)
    assert(feed.filter(col("_change_type") === "update_preimage").count() === 12)
    assert(feed.filter(col("_change_type") === "delete").count() === 4)
    // txn fencing still applies: a replayed epoch is a no-op
    val before = t.currentVersion
    val replay = mods.limit(1)
    t.merge(replay, "transaction_id", "processing_timestamp",
      txn = Some(("mor-app", 5L)))
    assert(t.currentVersion === before + 1)
    t.merge(replay, "transaction_id", "processing_timestamp",
      txn = Some(("mor-app", 5L)))
    assert(t.currentVersion === before + 1)
  }

  test("rewrite_position_deletes applies vectors by rewriting only DV'd files") {
    val wh = freshDir("dv_rewrite")
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.rw")
    spark.sql("CREATE TABLE graft.rw.t (id STRING, v INT)")
    val cat = new TableCatalog(spark, new Path(wh))
    val tx = cat.getTable("rw", "t")
    import spark.implicits._
    // two files; only the first gets a vector
    tx.append((1 to 100).map(i => (s"a$i", i)).toDF("id", "v").coalesce(1))
    tx.append((101 to 200).map(i => (s"b$i", i)).toDF("id", "v").coalesce(1))
    tx.deletePos(col("v") <= 10)
    val untouched = tx.snapshot.files.map(_.path)
      .filterNot(tx.snapshot.deletionVectors.map(_.dataFile).contains)
    val res = spark.sql(
      "CALL graft.system.rewrite_position_deletes(table => 'rw.t')").collect()
    assert(res(0).getInt(1) === 1, "exactly one DV'd file rewritten")
    assert(tx.snapshot.deletionVectors.isEmpty)
    // the clean file carried through untouched; contents exact
    assert(untouched.forall(tx.snapshot.files.map(_.path).contains))
    assert(tx.toDF.count() === 190)
    assert(tx.count() === 190)
    // the rewrite is a no-logical-change commit for the change feed
    val v = tx.currentVersion
    tx.setProperties(Map(TxTable.ChangeFeedProperty -> "true"))
    assert(tx.changeFeed(v, v).count() === 0)
  }

  test("plan shape pins: .changes partitions never mix commits; DV files plan positional sub-scans") {
    val wh = freshDir("dv_planpin")
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.pp")
    spark.sql("CREATE TABLE graft.pp.t (id STRING, v INT)")
    val cat = new TableCatalog(spark, new Path(wh))
    val tx = cat.getTable("pp", "t")
    tx.setProperties(Map(TxTable.ChangeFeedProperty -> "true"))
    (1 to 3).foreach(i =>
      spark.sql(s"INSERT INTO graft.pp.t VALUES ('r$i', $i)"))
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    // every .changes input partition carries exactly ONE commit's
    // constants — a refactor that batches files across commits would
    // stamp rows with the wrong version
    val parts = spark.read.table("graft.pp.t.changes")
      .queryExecution.executedPlan
      .collect { case b: BatchScanExec => b }.flatMap(_.inputPartitions)
    val versions = parts.map {
      case c: graft.catalog.ChangesInputPartition => c.version
    }
    assert(versions.distinct.sorted === Seq(2L, 3L, 4L))
    // a DV'd file plans through the parquet row-index column (positions
    // resolve executor-side against exact file row indexes), and the
    // WHOLE scan stays columnar — deletion vectors must not knock the
    // table off the vectorized read path
    tx.deletePos(col("v") === 2)
    val exec = spark.sql("SELECT * FROM graft.pp.t")
      .queryExecution.executedPlan
    val scans = exec.collect { case b: BatchScanExec => b }
    val morParts = scans.flatMap(_.inputPartitions)
      .collect { case m: org.apache.spark.sql.graft.MorInputPartition => m }
    assert(morParts.nonEmpty)
    assert(scans.nonEmpty && scans.forall(_.supportsColumnar),
      "a DV'd MOR scan must keep vectorized (columnar) reads")
  }

  test("concurrent deletePos and append both land (retrying CAS)") {
    val t = TxTable.create(spark, new Path(freshDir("dv_race")), "t",
      Schemas.transactions, Seq("date"))
    val seed = SampleData.transactions(spark, 40, seed = 97L)
    t.append(seed)
    val nHigh = seed.filter(col("risk_score") === "HIGH").count()
    val extra = SampleData.transactions(spark, 45, seed = 97L)
      .join(seed.select("transaction_id"), Seq("transaction_id"), "left_anti")
    val nExtra = extra.count()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val fDel = Future(t.deletePos(col("risk_score") === "HIGH"))
    val fApp = Future(t.append(extra))
    Await.result(Future.sequence(Seq(fDel, fApp)), 120.seconds)
    // both effects present whatever the commit order: vector applied to
    // the seed rows, appended rows intact (appended AFTER the ref scan
    // cannot be position-deleted — new files have no vector)
    assert(t.currentVersion === 3)
    assert(t.toDF.count() === 40 - nHigh + nExtra)
    assert(t.toDF.filter(col("risk_score") === "HIGH").count() ===
      extra.filter(col("risk_score") === "HIGH").count())
    // vacuum with zero grace reaps nothing referenced; reads intact
    t.vacuum(retainVersions = 10, graceMillis = 0L)
    assert(t.toDF.count() === 40 - nHigh + nExtra)
  }

  test("deletePos records CDF pre-images and survives vacuum") {
    val t = TxTable.create(spark, new Path(freshDir("dv_cdf")), "t",
      Schemas.transactions, Seq("date"),
      properties = Map(TxTable.ChangeFeedProperty -> "true"))
    val seed = SampleData.transactions(spark, 40, seed = 93L)
    t.append(seed)
    val nHigh = seed.filter(col("risk_score") === "HIGH").count()
    t.deletePos(col("risk_score") === "HIGH")
    val v = t.currentVersion
    val feed = t.changeFeed(v, v)
    assert(feed.count() === nHigh)
    assert(feed.select("_change_type").distinct().collect()
      .map(_.getString(0)).toSet === Set("delete"))
    // vacuum keeps the referenced vector files; reads stay correct
    t.vacuum(retainVersions = 10, graceMillis = 0L)
    assert(t.toDF.filter(col("risk_score") === "HIGH").count() === 0)
    // restore to the pre-delete version resurrects the rows (vectors
    // roll back with the snapshot)
    t.restore(v - 1)
    assert(t.toDF.count() === 40)
  }

  test("scan payload is O(1) in delete state; oversized key sets defer to executors") {
    val wh = freshDir("dv_payload")
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.pl")
    import spark.implicits._
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def factoryBytes(table: String): Int = {
      val fac = spark.sql(s"SELECT * FROM graft.pl.$table")
        .queryExecution.executedPlan
        .collect { case b: BatchScanExec => b }.head.readerFactory
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(fac); oos.close()
      bos.size()
    }
    val cat = new TableCatalog(spark, new Path(wh))
    Seq("small", "big").foreach { t =>
      spark.sql(s"CREATE TABLE graft.pl.$t (id STRING, v INT)")
      cat.getTable("pl", t)
        .append((1 to 20000).map(i => (s"r$i", i)).toDF("id", "v").coalesce(1))
    }
    cat.getTable("pl", "small").deletePos(col("v") % 2000 === 0)   //    10 pos
    cat.getTable("pl", "big").deletePos(col("v") % 2 === 0)        // 10000 pos
    // positions live in executor-opened sidecars, never in the plan:
    // 1000x the delete cardinality must not grow the task payload
    // (inline positions would add ~80 KB here)
    val (sSmall, sBig) = (factoryBytes("small"), factoryBytes("big"))
    assert(sBig - sSmall < 4096,
      s"factory grew with DV cardinality: small=$sSmall big=$sBig")
    assert(spark.sql("SELECT count(*) AS n FROM graft.pl.big")
      .collect()(0).getLong(0) === 10000L)
    // an equality delete past the inline threshold ships as a PATH and
    // loads executor-side; results stay exact
    spark.conf.set("spark.graft.morMaxInlineDeleteKeys", "10")
    try {
      cat.getTable("pl", "big").deleteMor(col("v") % 3 === 0, "id")
      val expect = (1 to 20000).count(v => v % 2 != 0 && v % 3 != 0)
      assert(spark.sql("SELECT count(*) AS n FROM graft.pl.big")
        .collect()(0).getLong(0) === expect.toLong)
      val bigAfter = factoryBytes("big")
      assert(bigAfter - sSmall < 8192,
        s"factory grew with deferred key set: small=$sSmall big=$bigAfter")
      // selective data predicate over the deferred-delete scan
      assert(spark.sql("SELECT v FROM graft.pl.big WHERE v IN (2,3,5,7,9)")
        .collect().map(_.getInt(0)).toSet === Set(5, 7))
    } finally spark.conf.unset("spark.graft.morMaxInlineDeleteKeys")
  }

  test("broad-predicate MOR DML degrades to copy-on-write past the position cap") {
    val t = TxTable.create(spark, new Path(freshDir("dv_cap")), "t",
      Schemas.transactions, Seq("date"))
    val seed = SampleData.transactions(spark, 60, seed = 99L)
    t.append(seed)
    spark.conf.set("spark.graft.morMaxPositions", "5")
    try {
      val filesBefore = t.snapshot.files.map(_.path).toSet
      val nHigh = seed.filter(col("risk_score") === "HIGH").count()
      assert(nHigh > 5)
      // exceeds the cap: no vectors, affected files REWRITTEN (COW)
      t.deletePos(col("risk_score") === "HIGH")
      assert(t.snapshot.deletionVectors.isEmpty)
      assert(t.snapshot.files.map(_.path).toSet !== filesBefore)
      assert(t.toDF.count() === 60 - nHigh)
      // same for updateMor: COW update, no vectors, values correct
      val nMed = seed.filter(col("risk_score") === "MEDIUM").count()
      assert(nMed > 5)
      t.updateMor(col("risk_score") === "MEDIUM",
        Map("amount" -> lit(1.23)
          .cast(org.apache.spark.sql.types.DecimalType(12, 2))))
      assert(t.snapshot.deletionVectors.isEmpty)
      assert(t.toDF.filter(col("amount") === 1.23).count() === nMed)
      // under the cap, the positional path still engages
      spark.conf.set("spark.graft.morMaxPositions", "1000000")
      val one = t.toDF.select("transaction_id").limit(1)
        .collect()(0).getString(0)
      t.deletePos(col("transaction_id") === one)
      assert(t.snapshot.deletionVectors.nonEmpty)
      assert(t.toDF.count() === 60 - nHigh - 1)
    } finally spark.conf.unset("spark.graft.morMaxPositions")
  }

  test("merge-on-read MERGE degrades to the COW merge past the position cap") {
    val t = TxTable.create(spark, new Path(freshDir("dv_merge_cap")), "t",
      Schemas.transactions, Seq("date"),
      properties = Map(TxTable.MergeModeProperty -> "merge-on-read"))
    val seed = SampleData.transactions(spark, 60, seed = 101L)
    t.append(seed)
    val batch = seed.limit(20)
      .withColumn("processing_timestamp", col("processing_timestamp") + 1L)
    spark.conf.set("spark.graft.morMaxPositions", "5")
    try {
      val filesBefore = t.snapshot.files.map(_.path).toSet
      // 20 matched keys exceed the cap: the merge must NOT collect
      // them — it rewrites the touched partitions instead (COW), so no
      // vectors appear and the affected files change
      t.merge(batch, "transaction_id", "processing_timestamp")
      assert(t.snapshot.deletionVectors.isEmpty)
      assert(t.snapshot.operation === "MERGE")
      assert(t.snapshot.files.map(_.path).toSet !== filesBefore)
      assert(t.toDF.count() === 60)
      assert(t.toDF.filter(col("processing_timestamp")
        .isin(batch.select("processing_timestamp").collect()
          .map(_.getLong(0)).toSeq: _*)).count() === 20)
      // under the cap the positional path re-engages
      spark.conf.set("spark.graft.morMaxPositions", "1000000")
      val one = batch.limit(1)
        .withColumn("processing_timestamp", col("processing_timestamp") + 1L)
      t.merge(one, "transaction_id", "processing_timestamp")
      assert(t.snapshot.operation === "MERGE_MOR")
      assert(t.snapshot.deletionVectors.nonEmpty)
      assert(t.toDF.count() === 60)
    } finally spark.conf.unset("spark.graft.morMaxPositions")
  }

  test("concurrent merge-on-read MERGEs on disjoint partitions both commit") {
    val anchor = 1754988000000L
    val t = TxTable.create(spark, new Path(freshDir("dv_merge_rebase")), "t",
      Schemas.transactions, Seq("date"),
      properties = Map(TxTable.MergeModeProperty -> "merge-on-read"))
    val day1 = SampleData.transactions(spark, 30, seed = 61L, anchorMs = anchor)
    val day2 = SampleData.transactions(spark, 30, seed = 62L,
      anchorMs = anchor + 86400000L)
    t.append(day1); t.append(day2)
    def mods(src: org.apache.spark.sql.DataFrame, amt: Double) =
      src.orderBy("transaction_id").limit(10)
        .withColumn("amount", lit(amt).cast(
          org.apache.spark.sql.types.DecimalType(12, 2)))
        .withColumn("processing_timestamp", col("processing_timestamp") + 1L)
    // writer 1 stages a day-1 MOR upsert; writer 2 lands a day-2 MOR
    // merge first — disjoint partitions, writer 1 REBASES and both
    // commit, each through its own deletion vectors (multi-stream CDC
    // ingest in merge-on-read mode)
    val commit1 = t.stageMerge(mods(day1, 111.11),
      "transaction_id", "processing_timestamp")
    t.merge(mods(day2, 222.22), "transaction_id", "processing_timestamp")
    commit1(None)
    assert(t.snapshot.operation === "MERGE_MOR")
    assert(t.snapshot.deletionVectors.nonEmpty)
    assert(t.toDF.count() === 60)
    assert(t.toDF.filter(col("amount") === 111.11).count() === 10)
    assert(t.toDF.filter(col("amount") === 222.22).count() === 10)
    assert(t.count() === 60)      // metadata count stays vector-exact
    // a concurrent APPEND into a merged partition could carry the
    // batch's keys — that rebase must refuse
    val commitStale = t.stageMerge(mods(day1, 333.33),
      "transaction_id", "processing_timestamp")
    t.append(day1.orderBy("transaction_id").limit(3)
      .withColumn("transaction_id", concat(col("transaction_id"), lit("_x"))))
    intercept[java.util.ConcurrentModificationException](commitStale(None))
    // WITHOUT key-stable partitions the ref scan spanned every
    // partition, so no touched-set guard can certify a rebase: any
    // concurrent commit conflicts (like the COW branch in that mode)
    val commitWide = t.stageMerge(mods(day1, 444.44),
      "transaction_id", "processing_timestamp",
      keyStablePartitions = false)
    t.append(day2.orderBy("transaction_id").limit(1)
      .withColumn("transaction_id", concat(col("transaction_id"), lit("_y"))))
    intercept[CommitConflictException](commitWide(None))
  }

  test("MOR-merge fuzz: random concurrent interleavings never duplicate a key") {
    val anchor = 1754988000000L
    Seq(11L, 22L, 33L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val t = TxTable.create(spark, new Path(freshDir(s"dv_fuzz_$seed")), "t",
        Schemas.transactions, Seq("date"),
        properties = Map(TxTable.MergeModeProperty -> "merge-on-read"))
      val days = (0 until 3).map(d =>
        SampleData.transactions(spark, 20, seed = 100L + seed * 10 + d,
          anchorMs = anchor + d * 86400000L))
      days.foreach(t.append)
      val nKeys = t.toDF.select("transaction_id").distinct().count()
      var ts = 0L
      (1 to 4).foreach { round =>
        ts += 10L
        def batchFor(day: Int): org.apache.spark.sql.DataFrame =
          days(day).orderBy("transaction_id").limit(5 + rnd.nextInt(10))
            .withColumn("processing_timestamp",
              col("processing_timestamp") + ts)
        // two writers over random (possibly overlapping) partitions:
        // writer 1 stages against the pre-round snapshot, writer 2
        // commits first, then writer 1 lands — rebasing when the
        // partitions are disjoint, conflicting when they overlap or a
        // guard cannot certify. Either OUTCOME is legal; duplicated
        // keys never are.
        val d1 = rnd.nextInt(3); val d2 = rnd.nextInt(3)
        val staged = t.stageMerge(batchFor(d1),
          "transaction_id", "processing_timestamp")
        t.merge(batchFor(d2), "transaction_id", "processing_timestamp")
        try staged(None)
        catch {
          case _: CommitConflictException => ()
          case _: java.util.ConcurrentModificationException => ()
        }
        // invariants after every round, whatever committed:
        val dupKeys = t.toDF.groupBy(col("transaction_id"))
          .count().filter(col("count") > 1).count()
        assert(dupKeys === 0, s"seed=$seed round=$round ($d1,$d2)")
        assert(t.toDF.count() === nKeys, s"seed=$seed round=$round")
        // metadata count stays vector-exact
        assert(t.count() === nKeys, s"seed=$seed round=$round")
      }
    }
  }

  test("deletePos retry preserves a concurrently-committed vector") {
    val dir = new Path(freshDir("dv_race"))
    val t = TxTable.create(spark, dir, "t",
      Schemas.transactions, Seq("date"))
    val seed = SampleData.transactions(spark, 60, seed = 95L)
    t.append(seed)
    val nHigh = seed.filter(col("risk_score") === "HIGH").count()
    val nLow = seed.filter(col("risk_score") === "LOW").count()
    val other = TxTable.open(spark, dir, "t")
    // a second writer lands a DELETE_DV in t's CAS window — the commit
    // attempt must re-merge against the CURRENT vectors, not replace
    // them with a merge computed from the stale ref-scan snapshot
    t.onBeforeDvCommit =
      () => { other.deletePos(col("risk_score") === "LOW"); () }
    t.deletePos(col("risk_score") === "HIGH")
    assert(t.toDF.filter(col("risk_score").isin("HIGH", "LOW")).count() === 0)
    assert(t.toDF.count() === 60 - nHigh - nLow)
    assert(t.count() === 60 - nHigh - nLow)
    // still one vector per file after the merged commit
    assert(t.snapshot.deletionVectors.groupBy(_.dataFile)
      .values.forall(_.size == 1))
  }

  test("deletePos conflicts (not silent no-op) when a rewrite retires its files") {
    val dir = new Path(freshDir("dv_race_rw"))
    val t = TxTable.create(spark, dir, "t",
      Schemas.transactions, Seq("date"))
    val seed = SampleData.transactions(spark, 60, seed = 97L)
    t.append(seed)
    val other = TxTable.open(spark, dir, "t")
    // a concurrent compaction rewrites every file the collected
    // positions point at: committing would silently delete nothing, so
    // the writer must surface a conflict for the caller to re-read
    t.onBeforeDvCommit = () => { other.compact(); () }
    intercept[java.util.ConcurrentModificationException] {
      t.deletePos(col("risk_score") === "HIGH")
    }
    assert(t.toDF.count() === 60)                    // nothing half-applied
    assert(t.snapshot.deletionVectors.isEmpty)
  }

  test("positional MOR ops compose after outstanding equality deletes") {
    val t = TxTable.create(spark, new Path(freshDir("dv_eq_first")), "t",
      Schemas.transactions, Seq("date"))
    val seed = SampleData.transactions(spark, 60, seed = 96L)
    t.append(seed)
    val nHigh = seed.filter(col("risk_score") === "HIGH").count()
    val nLow = seed.filter(col("risk_score") === "LOW").count()
    val nMed = seed.filter(col("risk_score") === "MEDIUM").count()
    // equality delete FIRST: the subsequent ref scans must keep
    // __graft_file through the equality-delete anti-join
    t.deleteMor(col("risk_score") === "HIGH", "transaction_id")
    t.deletePos(col("risk_score") === "LOW")
    assert(t.toDF.count() === 60 - nHigh - nLow)
    t.updateMor(col("risk_score") === "MEDIUM",
      Map("amount" -> lit(9.99)
        .cast(org.apache.spark.sql.types.DecimalType(12, 2))))
    assert(t.toDF.count() === 60 - nHigh - nLow)
    assert(t.toDF.filter(col("amount") === 9.99).count() === nMed)
    assert(t.toDF.filter(col("risk_score") === "HIGH").count() === 0)
  }

  test("non-deferrable delete keys: capped inline at the bound, COW degrade over it") {
    import spark.implicits._
    val wh = freshDir("dv_nondef")
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    val cat = new TableCatalog(spark, new Path(wh))
    // DECIMAL key: not in EqKeyStore.deferrable — its only MOR read
    // path is a driver-side collect, so the write side must respect
    // the inline cap
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("amt",
        org.apache.spark.sql.types.DecimalType(12, 2))))
    val t = cat.createTable("dv", "dec", schema, Nil)
    t.append(spark.createDataFrame(
      spark.sparkContext.parallelize((1 to 100).map(i =>
        org.apache.spark.sql.Row(i.toLong, new java.math.BigDecimal(s"$i.00")))),
      schema))
    spark.conf.set("spark.graft.morMaxInlineDeleteKeys", "4")
    try {
      // AT the bound (3 distinct keys ≤ 4): stays merge-on-read — an
      // equality delete lands, no data file is rewritten
      val filesBefore = t.snapshot.files.map(_.path).toSet
      t.deleteMor(col("amt") <= new java.math.BigDecimal("3.00"), "amt")
      assert(t.snapshot.equalityDeletes.size === 1)
      assert(t.snapshot.files.map(_.path).toSet === filesBefore)
      assert(spark.sql("SELECT count(*) AS n FROM graft.dv.dec")
        .collect()(0).getLong(0) === 97)
      // reader backstop for legacy logs: under a LOWERED cap, the V2
      // scan refuses the unbounded driver collect with a clear error
      spark.conf.set("spark.graft.morMaxInlineDeleteKeys", "1")
      val e = intercept[Exception](
        spark.sql("SELECT count(*) AS n FROM graft.dv.dec").collect())
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(e).exists(c =>
        c.isInstanceOf[IllegalStateException] &&
          c.getMessage.contains("morMaxInlineDeleteKeys")), e.toString)
      spark.conf.set("spark.graft.morMaxInlineDeleteKeys", "4")
      // OVER the bound (10 distinct keys > 4): degrades to the
      // copy-on-write delete — rows gone, NO new equality delete
      t.deleteMor(col("amt") <= new java.math.BigDecimal("13.00"), "amt")
      assert(t.snapshot.equalityDeletes.size === 1,
        "over-cap non-deferrable delete must not add MOR state")
      assert(t.snapshot.operation === "DELETE")
      assert(spark.sql("SELECT count(*) AS n FROM graft.dv.dec")
        .collect()(0).getLong(0) === 87)
      // the COW rewrite out-sequences the legacy delete: it no longer
      // applies to any scanned file, so even a tiny cap cannot trip
      spark.conf.set("spark.graft.morMaxInlineDeleteKeys", "1")
      assert(spark.sql("SELECT count(*) AS n FROM graft.dv.dec")
        .collect()(0).getLong(0) === 87)
    } finally spark.conf.unset("spark.graft.morMaxInlineDeleteKeys")
  }
}
