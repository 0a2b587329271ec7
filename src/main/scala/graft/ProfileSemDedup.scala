package graft

import org.apache.spark.sql.SparkSession

/** Dev harness for the sf1 `dedup_semantic` run-to-run spread (r13
  * VERDICT task 8: driver runs [1.20, 3.01, 1.72] — 2.5× — while every
  * other sf1 key held ≤1.5×): repeats the key under the exact
  * pipelineSf1 discipline while printing per-run GC time/count deltas,
  * so a slow run is attributable to collection pauses vs external
  * contention. */
object ProfileSemDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import scala.jdk.CollectionConverters._
    def gcStats(): (Long, Long) = {
      val beans = java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.asScala
      (beans.map(_.getCollectionCount).sum, beans.map(_.getCollectionTime).sum)
    }
    val fn = SparkEntry.queries("dedup_semantic")
    // warm (staging + JIT), then measured runs with GC deltas
    fn(spark, sfDir).count()
    (1 to 6).foreach { i =>
      System.gc(); Thread.sleep(200)
      val (c0, t0) = gcStats()
      val w0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - w0) / 1e9
      val (c1, t1) = gcStats()
      println(f"run $i: $sec%.3f s  rows=$rows  gc_count=${c1 - c0}  " +
        f"gc_ms=${t1 - t0}")
    }
    spark.stop()
  }
}
