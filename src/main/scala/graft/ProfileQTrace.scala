package graft

import org.apache.spark.sql.SparkSession

object ProfileQTrace {
  def main(args: Array[String]): Unit = {
    import graft.table.{GraftSql, LagFs, TableCatalog}
    import org.apache.hadoop.fs.Path
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.hadoopConfiguration
      .set("fs.lagfs.impl", classOf[graft.table.LagFs].getName)
    val baseDir = new java.io.File("target/qwork/bench_qtrace2_wh")
    org.apache.commons.io.FileUtils.deleteQuietly(baseDir)
    val cat = new TableCatalog(spark, new Path("lagfs:" + baseDir.getAbsolutePath))
    val t = cat.createTable("gov", "txns", graft.model.Schemas.transactions, Seq("date"))
    t.append(graft.ingest.SampleData.transactions(spark, 2000, seed = 31L))
    spark.conf.set("graft.sql.principal", "admin")
    GraftSql.sql(cat, "GRANT SELECT ON gov.txns TO admin")
    val stmt = "SELECT region, count(*) AS n FROM gov.txns GROUP BY region"
    (0 until 3).foreach(_ => GraftSql.sql(cat, stmt).collect())
    LagFs.reset()
    sys.props.put("graft.lagfs.trace", "1")
    GraftSql.sql(cat, stmt)
    sys.props.remove("graft.lagfs.trace")
    println("TRACE_DONE " + LagFs.snapshot)
    spark.stop()
  }
}
