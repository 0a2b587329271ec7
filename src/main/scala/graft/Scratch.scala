package graft

import org.apache.spark.sql.SparkSession

/** Dev scratchpad — `sbt "runMain graft.Scratch"`. Not part of the API.
  * Current contents: V2 catalog end-to-end smoke. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val wh = "/tmp/graft_v2_smoke_fixed"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(wh))
    spark.conf.set("spark.sql.catalog.graft", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)

    spark.sql("CREATE NAMESPACE graft.analytics")
    spark.sql("""CREATE TABLE graft.analytics.txns (
        transaction_id STRING, date DATE, amount DECIMAL(12,2), region STRING)
        PARTITIONED BY (date)""")
    spark.sql("SHOW TABLES IN graft.analytics").show()
    spark.sql("""INSERT INTO graft.analytics.txns VALUES
      ('t1', DATE'2026-01-01', 10.50, 'EU'),
      ('t2', DATE'2026-01-01', 20.00, 'US'),
      ('t3', DATE'2026-01-02', 30.25, 'EU')""")
    println("--- full scan")
    spark.sql("SELECT * FROM graft.analytics.txns ORDER BY transaction_id").show()
    println("--- filtered (partition + data filter) plan:")
    val q = spark.sql(
      "SELECT transaction_id, amount FROM graft.analytics.txns WHERE date = DATE'2026-01-01' AND amount > 15")
    q.explain("formatted")
    q.show()
    println("--- INSERT OVERWRITE")
    spark.sql("INSERT OVERWRITE graft.analytics.txns VALUES ('t9', DATE'2026-02-01', 1.00, 'AP')")
    spark.sql("SELECT * FROM graft.analytics.txns").show()
    println("--- ALTER TABLE add/rename/drop")
    spark.sql("ALTER TABLE graft.analytics.txns ADD COLUMN note STRING")
    spark.sql("DESCRIBE TABLE graft.analytics.txns").show()
    spark.sql("ALTER TABLE graft.analytics.txns RENAME COLUMN note TO comment_text")
    spark.sql("ALTER TABLE graft.analytics.txns DROP COLUMN comment_text")
    println("--- CTAS")
    spark.sql("CREATE TABLE graft.analytics.eu AS SELECT * FROM graft.analytics.txns WHERE region='AP'")
    spark.sql("SELECT * FROM graft.analytics.eu").show()
    println("CTAS_SOURCE_COUNT=" + spark.sql("SELECT * FROM graft.analytics.txns WHERE region='AP'").count())
    println("EU_LOG=" + new java.io.File(s"$wh/analytics/eu/_log").list().toSeq.sorted)
    println("--- current catalog mode")
    spark.catalog.setCurrentCatalog("graft")
    spark.sql("SELECT count(*) AS n FROM analytics.txns").show()
    spark.catalog.setCurrentCatalog("spark_catalog")
    println("SMOKE_OK")
    spark.stop()
  }
}
