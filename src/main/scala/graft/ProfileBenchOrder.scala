package graft

import org.apache.spark.sql.SparkSession

/** Dev probe for in-process bench contamination: run the heavy
  * table-layer sections in bench order, then ann_recall_clustered —
  * measuring how much the preceding sections' leftover state (cached
  * blocks, shuffle/broadcast residue, GC debt) inflates the clustered
  * batch keys, and whether a cache clear + GC barrier recovers the
  * isolated numbers. */
object ProfileBenchOrder {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val clear = args.contains("--clear")
    println("sustain " + Bench.sustainShakeout(spark).take(120))
    println("mor " + Bench.morSidecars(spark).take(120))
    println("commit " + Bench.commitLag(spark).take(80))
    println("qlag " + Bench.queryLag(spark).take(80))
    if (clear) {
      spark.catalog.clearCache()
      System.gc(); Thread.sleep(300)
      println("cleared caches")
    }
    println("ANNC " + Bench.annClustered(spark))
    spark.stop()
  }
}
