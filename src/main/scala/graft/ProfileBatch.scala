package graft
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev tool: where does a small streaming micro-batch MERGE spend its
  * fixed ~0.7 s? Times 10 consecutive 500-row MOR merges into a seeded
  * 50k-row table and prints per-JOB wall durations (gaps between jobs
  * = driver-side planning/commit work). */
object ProfileBatch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val work = new java.io.File("target/qwork/profile_batch")
    org.apache.commons.io.FileUtils.deleteQuietly(work)
    val props = Map(
      graft.table.TxTable.MergeModeProperty -> "merge-on-read",
      "graft.autoCompact.enabled" -> "true")
    val t = graft.table.TxTable.create(spark,
      new Path(work.getAbsolutePath + "/table"), "txns",
      graft.model.Schemas.transactions, Seq("date"), properties = props)
    val seed = graft.ingest.SampleData.transactions(spark, 50000, seed = 3L)
    t.append(seed)
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long)]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.getOrDefault(je.jobId, 0L)
        jobs.add((je.jobId, s, System.nanoTime()))
      }
    })
    import org.apache.spark.sql.functions._
    (0 until 10).foreach { i =>
      val batch = graft.ingest.SampleData.transactions(spark, 50000, seed = 3L)
        .orderBy("transaction_id").limit(500)
        .withColumn("processing_timestamp", col("processing_timestamp") + i + 1)
      jobs.clear()
      val t0 = System.nanoTime()
      t.merge(batch, "transaction_id", "processing_timestamp")
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)   // let listener events drain
      val sorted = jobs.toArray(Array.empty[(Int, Long, Long)]).sortBy(_._2)
      val jobSum = sorted.map(j => (j._3 - j._2) / 1e9).sum
      val gaps = sorted.sliding(2).collect {
        case Array(a, b) => math.max(0.0, (b._2 - a._3) / 1e9) }.sum
      println(f"merge $i: total=$total%.3f jobs=${sorted.length} " +
        f"jobTime=$jobSum%.3f gapTime=$gaps%.3f " +
        f"perJob=[${sorted.map(j => f"${(j._3 - j._2) / 1e9}%.3f").mkString(",")}]")
    }
    spark.stop()
  }
}
