package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: run only the ann_recall_clustered shakeout. */
object ProfileAnnClustered {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // mirror Bench: keep ScoreTopK on hash aggregation at 504 groups
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "65536")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("ANNC " + Bench.annClustered(spark))
    spark.stop()
  }
}
