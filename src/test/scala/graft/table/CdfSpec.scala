package graft.table

import graft.SparkSpec
import graft.ingest.SampleData
import graft.model.Schemas
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Stored Change Data Feed: DML commits persist row-level change
  * parquet under `_change_data/` and `changeFeed` replays them in
  * O(changes) — no snapshot diffing (contrast with `diff`, the
  * computed feed). */
class CdfSpec extends SparkSpec {

  private def cdfTable(dir: String): TxTable =
    TxTable.create(spark, new Path(freshDir(dir)), "t",
      Schemas.transactions, Seq("date"),
      properties = Map(TxTable.ChangeFeedProperty -> "true"))

  test("update/delete record pre/post images; appends synthesize inserts") {
    val t = cdfTable("cdf_basic")
    val seed = SampleData.transactions(spark, 50, seed = 61L)
    t.append(seed)                                                   // v1
    t.update(col("risk_score") === "HIGH",
      Map("amount" -> lit(111.11).cast(DecimalType(12, 2))))         // v2
    val nHigh = seed.filter(col("risk_score") === "HIGH").count()
    t.delete(col("risk_score") === "LOW")                            // v3
    val nLow = seed.filter(col("risk_score") === "LOW").count()

    val feed = t.changeFeed(0).cache()
    // v1: every seeded row surfaces exactly once as a synthesized insert
    val ins = feed.filter(col("_commit_version") === 1)
    assert(ins.count() === 50)
    assert(ins.select("_change_type").distinct().collect()
      .map(_.getString(0)).toSet === Set("insert"))
    // v2: one pre + one post image per updated row, stored not computed
    val upd = feed.filter(col("_commit_version") === 2)
    assert(upd.filter(col("_change_type") === "update_preimage")
      .count() === nHigh)
    assert(upd.filter(col("_change_type") === "update_postimage")
      .count() === nHigh)
    assert(upd.filter(col("_change_type") === "update_postimage")
      .filter(col("amount") =!= 111.11).count() === 0)
    // pre-images carry the OLD amounts (none are the post value)
    assert(upd.filter(col("_change_type") === "update_preimage")
      .filter(col("amount") === 111.11).count() === 0)
    // v3: delete pre-images for exactly the predicate-matched rows
    val del = feed.filter(col("_commit_version") === 3)
    assert(del.count() === nLow)
    assert(del.select("_change_type").distinct().collect()
      .map(_.getString(0)).toSet === Set("delete"))
    assert(t.snapshotAt(2).changeFiles.nonEmpty)
    assert(t.snapshotAt(3).changeFiles.nonEmpty)
    feed.unpersist()
  }

  test("merge classifies insert / update pre+post / delete in one feed") {
    val t = cdfTable("cdf_merge")
    val seed = SampleData.transactions(spark, 40, seed = 62L)
    t.append(seed)                                                   // v1
    val mods = seed.orderBy("transaction_id").limit(10)
      .withColumn("amount", lit(222.22).cast(DecimalType(12, 2)))
      .withColumn("processing_timestamp", col("processing_timestamp") + 1L)
      .withColumn("__kill", lit(false))
    val kills = seed.orderBy(col("transaction_id").desc).limit(5)
      .withColumn("processing_timestamp", col("processing_timestamp") + 1L)
      .withColumn("__kill", lit(true))
    val news = SampleData.transactions(spark, 48, seed = 62L)
      .join(seed.select("transaction_id"), Seq("transaction_id"), "left_anti")
      .withColumn("__kill", lit(false))
    val nNew = news.count()
    t.merge(mods.unionByName(kills).unionByName(news.select(mods.columns.map(col): _*)),
      key = "transaction_id", orderCol = "processing_timestamp",
      deleteCol = Some("__kill"))                                    // v2
    val feed = t.changeFeed(2, 2).cache()
    assert(feed.filter(col("_change_type") === "insert").count() === nNew)
    assert(feed.filter(col("_change_type") === "update_preimage").count() === 10)
    assert(feed.filter(col("_change_type") === "update_postimage").count() === 10)
    assert(feed.filter(col("_change_type") === "delete").count() === 5)
    // post-images carry the merged (new) values
    assert(feed.filter(col("_change_type") === "update_postimage")
      .filter(col("amount") =!= 222.22).count() === 0)
    feed.unpersist()
  }

  test("mergeBranches records branch-resolved changes; overwrite synthesizes") {
    val t = cdfTable("cdf_branches")
    val seed = SampleData.transactions(spark, 30, seed = 63L)
    t.append(seed)                                                   // v1
    val src = seed.orderBy("transaction_id").limit(8)
      .withColumn("amount", lit(9.99).cast(DecimalType(12, 2)))
    t.mergeBranches(src, "t", "s", "t.transaction_id = s.transaction_id",
      matched = Seq(
        TxTable.MatchedBranch(Some("s.amount > t.amount"), isDelete = true,
          assignments = None),
        TxTable.MatchedBranch(None, isDelete = false, assignments = None)),
      notMatched = Seq(TxTable.InsertBranch(None, None, Nil)))       // v2
    val feed2 = t.changeFeed(2, 2).cache()
    // every matched row resolves to exactly one branch: delete where the
    // source amount beats the target, update pre/post otherwise
    val dels = feed2.filter(col("_change_type") === "delete").count()
    val pres = feed2.filter(col("_change_type") === "update_preimage").count()
    assert(dels + pres === 8)
    assert(pres === feed2.filter(col("_change_type") === "update_postimage").count())
    feed2.unpersist()

    val replacement = SampleData.transactions(spark, 12, seed = 64L)
    t.overwrite(replacement)                                         // v3
    val feed3 = t.changeFeed(3, 3)
    val live = t.toDF.count()
    assert(feed3.filter(col("_change_type") === "delete").count() === t.asOf(2).count())
    assert(feed3.filter(col("_change_type") === "insert").count() === live)
  }

  test("feed errors on DML committed without CDF; compaction stays silent") {
    val t = TxTable.create(spark, new Path(freshDir("cdf_off")), "t",
      Schemas.transactions, Seq("date"))
    t.append(SampleData.transactions(spark, 20, seed = 65L))         // v1
    t.delete(col("risk_score") === "LOW")                            // v2, no CDF
    val e = intercept[IllegalStateException](t.changeFeed(0).count())
    assert(e.getMessage.contains("change data not recorded"))
    // the range BEFORE the unrecorded DML still reads fine
    assert(t.changeFeed(0, 1).count() === 20)

    val t2 = cdfTable("cdf_compact")
    t2.append(SampleData.transactions(spark, 20, seed = 66L))        // v1
    t2.compact()                                                     // v2
    assert(t2.changeFeed(2, 2).count() === 0)                        // no logical change
    assert(t2.changeFeed(0).count() === 20)                          // inserts only
  }

  test("SQL: SELECT * FROM table_changes('ns.tbl', from, to) reads the feed") {
    val root = freshDir("cdf_sql")
    val cat = new TableCatalog(spark, new Path(root))
    val t = cat.createTable("analytics", "txns_cdf_sql",
      Schemas.transactions, Seq("date"),
      properties = Map(TxTable.ChangeFeedProperty -> "true"))
    t.append(SampleData.transactions(spark, 25, seed = 68L))         // v1
    t.delete(col("risk_score") === "LOW")                            // v2
    val nLow = 25 - t.toDF.count()
    val feed = cat.sql("SELECT * FROM table_changes('analytics.txns_cdf_sql', 2, 2)")
    assert(feed.count() === nLow)
    assert(feed.columns.contains("_change_type"))
    assert(feed.select("_change_type").distinct().collect()
      .map(_.getString(0)).toSet === Set("delete"))
    // open-ended form: from version 0 through the head
    assert(cat.sql("SELECT * FROM table_changes('analytics.txns_cdf_sql', 0)")
      .count() === 25 + nLow)
    // COMPOSED positions (r15): the TVF resolves at analysis level, so
    // a WHERE over the feed and an aggregate in a CTE work — the
    // whole-statement regex dispatch could serve neither
    assert(cat.sql("SELECT * FROM table_changes('analytics.txns_cdf_sql'," +
        " 0) WHERE _change_type = 'delete'").count() === nLow)
    val byType = cat.sql(
      "WITH feed AS (SELECT * FROM " +
        "table_changes('analytics.txns_cdf_sql', 0)) " +
        "SELECT _change_type, count(*) AS n FROM feed GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType === Map("insert" -> 25L, "delete" -> nLow))
  }

  test("changeFeedByTime and the timestamp TVF resolve commit-time ranges") {
    val root = freshDir("cdf_time")
    val cat = new TableCatalog(spark, new Path(root))
    val t = cat.createTable("analytics", "txns_cdf_ts",
      Schemas.transactions, Seq("date"),
      properties = Map(TxTable.ChangeFeedProperty -> "true"))
    t.append(SampleData.transactions(spark, 20, seed = 69L))         // v1
    val afterAppend = t.snapshot.timestampMs
    Thread.sleep(5)
    t.delete(col("risk_score") === "HIGH")                           // v2
    val nHigh = 20 - t.toDF.count()
    // from just after the append: only the delete commit replays
    val feed = t.changeFeedByTime(afterAppend + 1)
    assert(feed.count() === nHigh)
    assert(feed.select("_change_type").distinct().collect()
      .map(_.getString(0)).toSet === Set("delete"))
    // full range from epoch covers both commits
    assert(t.changeFeedByTime(0L).count() === 20 + nHigh)
    intercept[IllegalArgumentException] {
      t.changeFeedByTime(System.currentTimeMillis() + 60000)
    }
    // SQL TVF with quoted timestamps (session-zone rendering)
    val fromTs = new java.sql.Timestamp(afterAppend + 1).toString
    assert(cat.sql(
      s"SELECT * FROM table_changes('analytics.txns_cdf_ts', '$fromTs')")
      .count() === nHigh)
  }

  test("DROP PARTITION is metadata-only and feeds exact deletes to CDF") {
    val cat = new TableCatalog(spark, new Path(freshDir("cdf_droppart")))
    val t = cat.createTable("analytics", "txns_dp",
      Schemas.transactions, Seq("date"),
      properties = Map(TxTable.ChangeFeedProperty -> "true"))
    // spread the generator's single date over three partitions
    val seed = SampleData.transactions(spark, 80, seed = 70L)
      .withColumn("date",
        date_add(col("date"), abs(hash(col("transaction_id"))) % 3))
    t.append(seed)
    val firstDate = seed.filter(col("date").isNotNull)
      .select(min(col("date"))).collect()(0).getDate(0)
    val nDropped = seed.filter(col("date") === firstDate).count()
    val partsBefore = cat.sql("SHOW PARTITIONS analytics.txns_dp")
      .collect().map(_.getString(0))
    assert(partsBefore.contains(s"date=$firstDate") && partsBefore.length >= 2)
    val res = cat.sql(
      s"ALTER TABLE analytics.txns_dp DROP PARTITION (date='$firstDate')")
      .collect()(0).getString(0)
    assert(res.startsWith("DROPPED"))
    assert(!cat.sql("SHOW PARTITIONS analytics.txns_dp")
      .collect().map(_.getString(0)).contains(s"date=$firstDate"))
    assert(t.toDF.count() === 80 - nDropped)
    assert(t.toDF.filter(col("date") === firstDate).count() === 0)
    // the drop commit wrote no data files (metadata-only)
    assert(t.snapshot.operation === "DROP_PARTITION")
    // CDF synthesizes the dropped rows as exact deletes
    val v = t.currentVersion
    val feed = t.changeFeed(v, v)
    assert(feed.count() === nDropped)
    assert(feed.select("_change_type").distinct().collect()
      .map(_.getString(0)).toSet === Set("delete"))
    // already position-deleted rows never resurface as partition-drop
    // deletes: DV a few rows of the next date, then drop it
    val secondDate = t.toDF.filter(col("date").isNotNull)
      .select(min(col("date"))).collect()(0).getDate(0)
    val inPart = t.toDF.filter(col("date") === secondDate).count()
    val dvd = t.toDF.filter(col("date") === secondDate &&
      col("risk_score") === "HIGH").count()
    t.deletePos(col("date") === secondDate && col("risk_score") === "HIGH")
    cat.sql(s"ALTER TABLE analytics.txns_dp DROP PARTITION (date='$secondDate')")
    val v2 = t.currentVersion
    assert(t.changeFeed(v2, v2).count() === inPart - dvd)
  }

  test("deleteMor records pre-images; vacuum keeps referenced change files") {
    val t = cdfTable("cdf_mor")
    val seed = SampleData.transactions(spark, 30, seed = 67L)
    t.append(seed)                                                   // v1
    val nHigh = seed.filter(col("risk_score") === "HIGH").count()
    t.deleteMor(col("risk_score") === "HIGH", "transaction_id")      // v2
    val feed = t.changeFeed(2, 2)
    assert(feed.count() === nHigh)
    assert(feed.select("_change_type").distinct().collect()
      .map(_.getString(0)).toSet === Set("delete"))
    // vacuum with full retention must not touch referenced change files
    t.vacuum(retainVersions = 10, graceMillis = 0L)
    assert(t.changeFeed(2, 2).count() === nHigh)
  }

  test(".changes scan applies prior MOR deletes to overwrite-removed files") {
    val wh = freshDir("cdf_ow_mor")
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.om")
    spark.sql("CREATE TABLE graft.om.t (id STRING, v INT)")             // v0
    spark.sql(
      "INSERT INTO graft.om.t VALUES ('a',1),('b',2),('c',3),('d',4)")  // v1
    val cat = new TableCatalog(spark, new Path(wh))
    val tx = cat.getTable("om", "t")
    tx.deletePos(col("id") === "b")                                     // v2
    tx.deleteMor(col("id") === "c", "id")                               // v3
    spark.sql("INSERT OVERWRITE graft.om.t VALUES ('z', 9)")            // v4
    val v = tx.currentVersion
    // V1 feed semantics: only the LIVE rows a,d are overwrite deletes —
    // b (position-deleted) and c (equality-deleted) fell earlier
    assert(tx.changeFeed(v, v).filter(col("_change_type") === "delete")
      .select("id").collect().map(_.getString(0)).toSet === Set("a", "d"))
    // the V2 .changes scan must agree (it planned removed files raw
    // before: already-MOR-deleted rows resurfaced as delete events and
    // continuous MV folds double-subtracted)
    def ch = spark.read.option("startingVersion", v.toString)
      .table("graft.om.t.changes")
    assert(ch.filter(col("_change_type") === "delete")
      .select("id").collect().map(_.getString(0)).toSet === Set("a", "d"))
    assert(ch.filter(col("_change_type") === "insert")
      .select("id").collect().map(_.getString(0)).toSet === Set("z"))
    // second read serves from the materialized synth cache, same rows
    assert(ch.filter(col("_change_type") === "delete").count() === 2)
  }
}
