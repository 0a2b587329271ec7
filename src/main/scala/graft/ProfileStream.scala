package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: where does the STREAMING ingest micro-batch spend its
  * time? Replays the bench's exact streaming shape (40k envelope rows,
  * AvailableNow, maxFilesPerTrigger=8 → 4 micro-batches of ~10k rows,
  * COW by default / MOR with GRAFT_PROFILE_MOR=1) with a job listener,
  * printing per-batch wall time, job count, summed job time, and
  * inter-job gap time — the fixed-cost budget the ≥8k rows/s bar
  * depends on. GRAFT_PROFILE_ROWS overrides the row count — 400000
  * replays the bench's 10× MOR point (r18 VERDICT observation 1: the
  * 1× A/B harness needed extending to the 10× shape). */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val streamRows = sys.env.get("GRAFT_PROFILE_ROWS")
      .map(_.trim.toLong).getOrElse(40000L)
    val envDir = new java.io.File("target/qwork/profile_stream_env").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(envDir))
    graft.ingest.SampleData.toCdcEnvelopes(
        graft.ingest.SampleData.transactions(spark, streamRows, seed = 11L))
      .toJSON.repartition(32).write.text(envDir)
    val props =
      if (sys.env.contains("GRAFT_PROFILE_MOR"))
        Map(graft.table.TxTable.MergeModeProperty -> "merge-on-read",
          "graft.autoCompact.enabled" -> "true")
      else Map.empty[String, String]
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long)]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val sites = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        starts.put(js.jobId, System.nanoTime())
        sites.put(js.jobId, Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .getOrElse("?"))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.getOrDefault(je.jobId, 0L)
        jobs.add((je.jobId, s, System.nanoTime()))
      }
    })
    (0 until 4).foreach { r =>
      val work = new java.io.File(s"target/qwork/profile_stream_$r").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
      val t = graft.table.TxTable.create(spark,
        new org.apache.hadoop.fs.Path(s"$work/table"), "txns",
        graft.model.Schemas.transactions, Seq("date"), properties = props)
      jobs.clear()
      val t0 = System.nanoTime()
      val q = graft.ingest.StreamingIngest.start(spark, envDir, t,
        checkpointDir = s"$work/ckpt", errorsDir = s"$work/errors",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow(),
        maxFilesPerTrigger = 8)
      q.awaitTermination(600000)
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val sorted = jobs.toArray(Array.empty[(Int, Long, Long)]).sortBy(_._2)
      val jobSum = sorted.map(j => (j._3 - j._2) / 1e9).sum
      val gaps = sorted.sliding(2).collect {
        case Array(a, b) => math.max(0.0, (b._2 - a._3) / 1e9) }.sum
      val rate = math.round(streamRows / total)
      println(f"run $r: total=$total%.3f rate=$rate jobs=${sorted.length} " +
        f"jobTime=$jobSum%.3f gapTime=$gaps%.3f " +
        f"perJob=[${sorted.map(j => f"${(j._3 - j._2) / 1e9}%.3f@" +
          sites.getOrDefault(j._1, "?")).mkString(",")}]")
    }
    spark.stop()
  }
}
