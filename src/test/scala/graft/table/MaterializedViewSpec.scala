package graft.table

import graft.SparkSpec
import graft.ingest.SampleData
import graft.model.Schemas
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Materialized views: CREATE / REFRESH (incremental off the stored
  * CDF, full-recompute fallback) / DROP, backed by real graft tables. */
class MaterializedViewSpec extends SparkSpec {

  private def recomputed(src: DataFrame): Set[(String, Long, Double)] =
    src.filter(col("status") =!= "FAILED")
      .groupBy("risk_score")
      .agg(count(lit(1)).as("n"), sum("amount").as("total"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).doubleValue())).toSet

  private def mvContents(cat: TableCatalog, ns: String, mv: String)
      : Set[(String, Long, Double)] =
    cat.getTable(ns, mv).toDF
      .select(col("risk_score"), col("n"),
        col("total").cast("double").as("total"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  test("create + incremental refresh folds only the change feed") {
    val cat = new TableCatalog(spark, new Path(freshDir("mv_inc")))
    val t = cat.createTable("analytics", "txns", Schemas.transactions,
      Seq("date"), properties = Map(TxTable.ChangeFeedProperty -> "true"))
    t.append(SampleData.transactions(spark, 80, seed = 81L))
    val created = cat.sql("""
      CREATE MATERIALIZED VIEW analytics.mv_risk AS
      SELECT risk_score, COUNT(*) AS n, SUM(amount) AS total
      FROM analytics.txns WHERE status <> 'FAILED'
      GROUP BY risk_score""").collect()(0).getString(0)
    assert(created.startsWith("CREATED MATERIALIZED VIEW"))
    assert(mvContents(cat, "analytics", "mv_risk") === recomputed(t.toDF))

    // fresh: nothing to do
    assert(cat.sql("REFRESH MATERIALIZED VIEW analytics.mv_risk")
      .collect()(0).getString(0).contains("fresh"))

    // source DML across every change shape, then one incremental fold
    t.update(col("risk_score") === "HIGH",
      Map("amount" -> (col("amount") + 100).cast(DecimalType(12, 2))))
    t.append(SampleData.transactions(spark, 30, seed = 82L))
    t.delete(col("risk_score") === "LOW")
    val res = cat.sql("REFRESH MATERIALIZED VIEW analytics.mv_risk")
      .collect()(0).getString(0)
    assert(res.contains("incremental"), s"expected incremental fold: $res")
    assert(mvContents(cat, "analytics", "mv_risk") === recomputed(t.toDF))
    // the LOW group self-deleted (maintained count hit zero)
    assert(!mvContents(cat, "analytics", "mv_risk").exists(_._1 == "LOW"))
  }

  test("unreplayable feed gap falls back to a full recompute") {
    val cat = new TableCatalog(spark, new Path(freshDir("mv_full")))
    val t = cat.createTable("analytics", "txns", Schemas.transactions,
      Seq("date"))   // CDF NOT enabled
    t.append(SampleData.transactions(spark, 50, seed = 83L))
    cat.sql("""
      CREATE MATERIALIZED VIEW analytics.mv_risk AS
      SELECT risk_score, COUNT(*) AS n, SUM(amount) AS total
      FROM analytics.txns WHERE status <> 'FAILED'
      GROUP BY risk_score""")
    t.delete(col("risk_score") === "MEDIUM")   // unrecorded row-level DML
    val res = cat.sql("REFRESH MATERIALIZED VIEW analytics.mv_risk")
      .collect()(0).getString(0)
    assert(res.contains("(full"), s"expected full fallback: $res")
    assert(mvContents(cat, "analytics", "mv_risk") === recomputed(t.toDF))
  }

  test("continuous refresh folds the .changes stream exactly-once") {
    val cat = new TableCatalog(spark, new Path(freshDir("mv_cont")))
    val t = cat.createTable("analytics", "txns", Schemas.transactions,
      Seq("date"), properties = Map(TxTable.ChangeFeedProperty -> "true"))
    t.append(SampleData.transactions(spark, 60, seed = 85L))
    cat.sql("""
      CREATE MATERIALIZED VIEW analytics.mv_risk AS
      SELECT risk_score, COUNT(*) AS n, SUM(amount) AS total
      FROM analytics.txns WHERE status <> 'FAILED'
      GROUP BY risk_score""")
    val q = MaterializedViews.startContinuous(cat, "analytics", "mv_risk",
      s"${freshDir("mv_cont_ckpt")}/ckpt")
    try {
      // DML flows through the stream into the aggregate
      t.update(col("risk_score") === "HIGH",
        Map("amount" -> (col("amount") + 10).cast(DecimalType(12, 2))))
      t.delete(col("risk_score") === "LOW")
      q.processAllAvailable()
      assert(mvContents(cat, "analytics", "mv_risk") === recomputed(t.toDF))
      // a second wave keeps folding
      t.append(SampleData.transactions(spark, 25, seed = 86L))
      q.processAllAvailable()
      assert(mvContents(cat, "analytics", "mv_risk") === recomputed(t.toDF))
    } finally q.stop()
    // the fold fence is authoritative: a manual refresh sees it fresh
    assert(cat.sql("REFRESH MATERIALIZED VIEW analytics.mv_risk")
      .collect()(0).getString(0).contains("fresh"))
    // replaying an epoch is a table no-op (fence): same source version
    val backing = cat.getTable("analytics", "mv_risk")
    val vBefore = backing.currentVersion
    backing.overwrite(backing.toDF,
      Some(("graft-mv:analytics.mv_risk", t.currentVersion)))
    assert(backing.currentVersion === vBefore)
  }

  test("shape validation, IF NOT EXISTS, and DROP") {
    val cat = new TableCatalog(spark, new Path(freshDir("mv_ddl")))
    val t = cat.createTable("analytics", "txns", Schemas.transactions, Nil)
    t.append(SampleData.transactions(spark, 10, seed = 84L))
    intercept[IllegalArgumentException] {   // no aggregate
      cat.sql("CREATE MATERIALIZED VIEW analytics.bad AS SELECT risk_score FROM analytics.txns GROUP BY risk_score")
    }
    cat.sql("""CREATE MATERIALIZED VIEW analytics.mv AS
      SELECT risk_score, COUNT(*) AS n FROM analytics.txns GROUP BY risk_score""")
    assert(cat.sql("""CREATE MATERIALIZED VIEW IF NOT EXISTS analytics.mv AS
      SELECT risk_score, COUNT(*) AS n FROM analytics.txns GROUP BY risk_score""")
      .collect()(0).getString(0).startsWith("EXISTS"))
    assert(MaterializedViews.list(cat, "analytics") === Seq("mv"))
    val shown = cat.sql("SHOW MATERIALIZED VIEWS").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(shown === Seq(("analytics", "mv")))
    cat.sql("DROP MATERIALIZED VIEW analytics.mv")
    assert(MaterializedViews.list(cat, "analytics").isEmpty)
    assert(!TxTable.exists(spark, cat.tableRoot("analytics", "mv")))
    cat.sql("DROP MATERIALIZED VIEW IF EXISTS analytics.mv")   // idempotent
    intercept[Exception] {
      cat.sql("DROP MATERIALIZED VIEW analytics.mv")
    }
  }
}
