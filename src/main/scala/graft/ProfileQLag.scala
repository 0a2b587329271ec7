package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: run only the query_lag shakeout (see Bench.queryLag). */
object ProfileQLag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("QLAG " + Bench.queryLag(spark))
    spark.stop()
  }
}
