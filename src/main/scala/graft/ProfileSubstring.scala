package graft

import org.apache.spark.sql.SparkSession

/** Isolated fresh-JVM runs of the sf1 `dedup_substring` key — the
  * attribution harness for the r16-flagged quiet-to-quiet drift
  * (1.88 s in the r15 artifact → 2.36-2.59 s since): same operator,
  * same staged corpus, same checksum action as the bench, with
  * nothing else in the session. If the isolated number matches the
  * in-bench one, the operator itself is the cost and r15's 1.88 was
  * the outlier window; if it reproduces 1.9 s, the drift is
  * in-session state (JIT/code-cache/heap shape after the preceding
  * ~15 min of sections). */
object ProfileSubstring {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bigDir = new java.io.File(
      "target/qwork/bench_docs10x_sf0.1").getAbsolutePath
    def one(): Double = {
      System.gc(); Thread.sleep(200)
      val t0 = System.nanoTime()
      val out = graft.operators.Dedup.substringDedup(
        spark.read.parquet(s"$bigDir/documents.parquet"),
        minMatchTokens = 8)
      // same action the bench times (checksum over the kept text)
      import org.apache.spark.sql.functions._
      out.agg(count(lit(1)), bit_xor(xxhash64(col("text")))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    one()  // warm
    val runs = (1 to 5).map(_ => one())
    println("SUBSTRING_ISOLATED " + runs.map(r => f"$r%.3f").mkString(","))
    spark.stop()
  }
}
