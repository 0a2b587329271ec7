package graft
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Dev tool: pre-build the synthetic N-commit / N-file header-only log
  * the metadata shakeouts read (built once, reused across bench runs —
  * immutable once the head version exists). Prints per-decade commit
  * rates so the build cost's growth in accumulated files is visible. */
object BuildMetaLog {
  def main(args: Array[String]): Unit = {
    val commits = if (args.nonEmpty) args(0).toInt else 100000
    val wh = if (args.length > 1) args(1)
      else "target/qwork/bench_metadata100k_wh"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val built = graft.Bench.buildSyntheticLog(spark,
      new Path(s"$wh/meta/big/_log"), commits, verbose = true)
    println(f"built=$built total=${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}

/** Marginal-rate probe: append `n` more 1-file commits at the CURRENT
  * head of an existing synthetic log and print the rate — run on a
  * quiet machine against logs of different sizes, this isolates how
  * per-commit cost grows with accumulated table size (fs-directory
  * scaling + the O(files) carried-entry verify), with none of the
  * noise a 50-minute full build accumulates. */
object BuildMetaLogExtend {
  def main(args: Array[String]): Unit = {
    import graft.table.{DataFile, Snapshot, TxLog}
    val n = if (args.nonEmpty) args(0).toInt else 1000
    val wh = if (args.length > 1) args(1)
      else "target/qwork/bench_metadata100k_wh"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val logDir = new Path(s"$wh/meta/big/_log")
    val conf = spark.sessionState.newHadoopConf()
    val head = TxLog.currentVersion(logDir, conf).getOrElse(
      sys.error(s"no log at $logDir"))
    val snap = TxLog.read(logDir, head, conf)
    var files = snap.files.toVector
    var expected: Option[Long] = Some(head)
    val t0 = System.nanoTime()
    (1 to n).foreach { i =>
      val v = expected.get + 1
      files = files :+ DataFile(f"x$v%08d.parquet",
        Map("date" -> f"2026-01-${i % 28 + 1}%02d"), 1000L, 1000000L)
      expected = Some(TxLog.commit(logDir, expected, snap.copy(
        version = v, timestampMs = snap.timestampMs + v,
        operation = "APPEND", files = files, added = Nil,
        manifests = Nil, manifestList = None), conf))
    }
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"extended head=$head by $n in $dt%.1f s (${n / dt}%.0f commits/s)")
    spark.stop()
  }
}
