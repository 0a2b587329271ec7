package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Dev harness: time COLD materialization of the planning_1m synthetic
  * million-entry head (headers + manifest content purged per
  * iteration) — the `planning_1m.snapshot_read` shape, isolated so a
  * profiler can attribute the JSON-parse vs IO vs construction split.
  * Run after a bench run has built the synthetic log. */
object ProfileColdRead {
  def main(args: Array[String]): Unit = {
    val wh = if (args.nonEmpty) args(0)
      else "target/qwork/bench_planning1m_wh"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val conf = spark.sessionState.newHadoopConf()
    val logDir = new Path(
      new java.io.File(s"$wh/meta/wide1m/_log").getAbsolutePath)
    val head = 9L
    (1 to 6).foreach { i =>
      graft.table.TxLog.purgeRawCache(logDir)
      graft.table.TxLog.purgeManifestCache()
      val t0 = System.nanoTime()
      val n = graft.table.TxLog.read(logDir, head, conf).files.size
      println(f"cold read $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n files)")
    }
    spark.stop()
  }
}
