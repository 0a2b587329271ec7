package graft.table

import graft.SparkSpec
import graft.ingest.SampleData
import graft.model.Schemas
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/**
 * End-to-end over [[MockS3FileSystem]] (`s3mock://` — non-atomic
 * copy+delete rename, no append): the whole table stack — create,
 * append, keyed merge, positional MOR delete, time travel, V2 catalog
 * SQL — must work on object-store semantics, with commits going
 * through [[TxLog.FsCreateProtocol]]'s conditional-PUT primitive and
 * the log's version slots NEVER published via rename.
 */
class ObjectStoreSpec extends SparkSpec {

  spark.sparkContext.hadoopConfiguration
    .set("fs.s3mock.impl", classOf[MockS3FileSystem].getName)

  test("full table lifecycle on an object-store-shaped filesystem") {
    val root = new Path(s"s3mock://${freshDir("s3mock_e2e")}/t")
    MockS3FileSystem.renames.clear()
    val t = TxTable.create(spark, root, "s3.t",
      Schemas.transactions, Seq("date"))
    val seed = SampleData.transactions(spark, 80, seed = 50L)
    t.append(seed)
    assert(t.toDF.count() === 80)
    // keyed CDC merge (upserts rewrite their touched partitions)
    val batch = seed.orderBy("transaction_id").limit(30)
      .withColumn("processing_timestamp", col("processing_timestamp") + 1L)
    t.merge(batch, "transaction_id", "processing_timestamp")
    assert(t.toDF.count() === 80)
    assert(t.toDF.filter(col("processing_timestamp")
      .isin(batch.select("processing_timestamp").collect()
        .map(_.getLong(0)).toSeq: _*)).count() === 30)
    // positional merge-on-read delete: sidecars + metadata-exact count
    val nHigh = t.toDF.filter(col("risk_score") === "HIGH").count()
    t.deletePos(col("risk_score") === "HIGH")
    assert(t.snapshot.deletionVectors.nonEmpty)
    assert(t.toDF.count() === 80 - nHigh)
    assert(t.count() === 80 - nHigh)
    // time travel across the same log
    assert(t.asOf(1).count() === 80)
    // the COMMIT PATH never published a version slot via rename: every
    // recorded rename is a data/staging/change-data move (or an index-
    // chunk cache write, whose reader tolerates torn copies) — the
    // version slots went through the conditional-PUT protocol
    val headerRenames = MockS3FileSystem.renames.asScala
      .filter(r => r.split("->")(1).contains("/_log/") &&
        r.split("->")(1).contains(".metadata.json"))
    assert(headerRenames.isEmpty,
      s"log headers published via rename: ${headerRenames.take(3)}")
    assert(MockS3FileSystem.renames.asScala.nonEmpty,
      "expected data-file staging moves to route through the mock")
  }

  test("multi-table transaction commits atomically over s3mock") {
    // the marker put-if-absent — the reference's service-side token
    // CAS — must carry the whole protocol on object-store semantics
    val wh = new Path(s"s3mock://${freshDir("s3mock_txn")}")
    val cat = new TableCatalog(spark, wh)
    def seeded(name: String): TxTable = {
      val t = cat.createTable("txn", name, Schemas.transactions, Seq("date"))
      t.append(SampleData.transactions(spark, 30, seed = 70L))
      t
    }
    val a = seeded("a")
    val b = seeded("b")
    val extra = SampleData.transactions(spark, 10, seed = 71L)
    val versions = cat.beginTransaction()
      .append(a, extra)
      .append(b, extra)
      .commit()
    assert(versions.values.toSet === Set(2L))
    assert(a.toDF.count() === 40)
    assert(b.toDF.count() === 40)
    // an aborted txn stays invisible on the same store
    val txn = cat.beginTransaction()
      .append(a, SampleData.transactions(spark, 5, seed = 72L))
    txn.publishPending()
    assert(txn.abort() === TxLog.TxnAborted)
    assert(a.toDF.count() === 40)
  }

  test("V2 catalog SQL works against an s3mock warehouse") {
    val wh = s"s3mock://${freshDir("s3mock_sql")}"
    spark.conf.set("spark.sql.catalog.s3m", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.s3m.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS s3m.ns")
    spark.sql("""CREATE TABLE s3m.ns.t (id INT, v STRING, date DATE)
                 PARTITIONED BY (date)""")
    spark.sql("""INSERT INTO s3m.ns.t VALUES
      (1, 'a', DATE'2026-01-01'), (2, 'b', DATE'2026-01-02'),
      (3, 'c', DATE'2026-01-02')""")
    assert(spark.sql("SELECT count(*) AS n FROM s3m.ns.t")
      .collect()(0).getLong(0) === 3)
    spark.sql("DELETE FROM s3m.ns.t WHERE id = 2")
    assert(spark.sql("SELECT sum(id) AS s FROM s3m.ns.t")
      .collect()(0).getLong(0) === 4)
  }

  test("steady-state commit round-trip budget over LagFs") {
    // the commit_lag bench's claim, pinned as a spec: a single-writer
    // metadata commit (head probe -> cached header read -> layout ->
    // CAS -> hint) costs a BOUNDED number of filesystem round-trips,
    // independent of table size — the term that bounds a real
    // object-store deployment. Budget per steady commit: 2 status
    // (head probe + header validate), 1 open (re-read of the fresh
    // header), 2 create (CAS + hint) + amortized spill/merge/list
    // writes. mkdirs is paid once, on the first commit only.
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.lagfs.impl", classOf[LagFs].getName)
    val base = new java.io.File(freshDir("lagfs_budget"), "_log")
    val logDir = new Path("lagfs:" + base.getAbsolutePath)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    def step(): Unit = {
      val cur = TxLog.currentVersion(logDir, conf)
      val snap = cur.map(TxLog.read(logDir, _, conf))
      val v = cur.map(_ + 1).getOrElse(0L)
      TxLog.commit(logDir, cur, Snapshot(version = v,
        timestampMs = 1700000000000L + v, operation =
          if (v == 0L) "CREATE" else "APPEND",
        schemaJson = schema.json, partitionColumns = Seq("date"),
        files = snap.map(_.files).getOrElse(Vector.empty) :+
          DataFile(f"f$v%06d.parquet", Map("date" -> "2026-01-01"),
            1L, 10L)), conf)
    }
    (0 until 40).foreach(_ => step())   // past spills and a tier merge
    LagFs.reset()
    val n = 30
    (0 until n).foreach(_ => step())
    val byCat = LagFs.snapshot
    val per = LagFs.total.toDouble / n
    info(s"round-trips/commit: $per (${byCat.mkString(", ")})")
    assert(byCat.getOrElse("mkdirs", 0L) === 0L,
      "steady-state commits must not re-probe the log directory")
    assert(byCat("status").toDouble / n <= 2.05)
    assert(byCat("open").toDouble / n <= 1.5)     // header + rare manifest
    assert(per <= 6.0, s"round-trips per commit grew to $per")
  }

  test("commit self-heals a log directory deleted behind the caches") {
    // freshDir-style external deletion (not through the catalog, which
    // purges TxLog's caches) leaves a stale head-cache entry; the next
    // CREATE's publish must recreate the directory and succeed
    val conf = spark.sparkContext.hadoopConfiguration
    val base = new java.io.File(freshDir("heal_extdel"), "_log")
    val logDir = new Path(base.getAbsolutePath)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    def create(v: Long): Unit =
      TxLog.commit(logDir, if (v == 0) None else Some(v - 1),
        Snapshot(version = v, timestampMs = 1700000000000L + v,
          operation = if (v == 0) "CREATE" else "APPEND",
          schemaJson = schema.json, partitionColumns = Nil,
          files = Vector.tabulate((v + 1).toInt)(i =>
            DataFile(f"f$i%04d.parquet", Map.empty, 1L, 10L))), conf)
    create(0); create(1)
    // delete the dir OUTSIDE TxLog — head cache still says head=1
    org.apache.commons.io.FileUtils.deleteQuietly(base.getParentFile)
    create(0)                               // must heal, not throw
    assert(TxLog.read(logDir, 0L, conf).files.size === 1)
  }
}
