package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: run ONLY the commit-protocol LagFs ledger (the
  * BENCH `commit_lag` section) so round-trip changes are measurable in
  * seconds, not a full bench run. */
object ProfileCommitLag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(Bench.commitLag(spark))
    spark.stop()
  }
}
