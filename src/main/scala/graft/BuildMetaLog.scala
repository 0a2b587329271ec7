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
