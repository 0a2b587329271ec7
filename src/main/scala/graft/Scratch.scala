package graft

import org.apache.spark.sql.SparkSession

/** Dev scratchpad — `sbt "runMain graft.Scratch"`. Not part of the API.
  * Default behavior: drive the driver-contract flagship twice (smoke +
  * scratch-dir idempotence) and print the row counts. */
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
    val df1 = SparkEntry.entry(spark)
    println(s"ENTRY_ROWS_1=${df1.count()}")
    df1.show(5, false)
    val df2 = SparkEntry.entry(spark)
    println(s"ENTRY_ROWS_2=${df2.count()}")
    spark.stop()
  }
}
