package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for the sf1 Bloom-decontamination path (not part of
  * the API) — the one r10 number that drifted with untouched code. */
object ProfileBloom {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("PROF_DIR", "target/qwork/bench_docs10x_sf0.1")
    def timed(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime(); val r = body
      println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.2f s rows=$r")
    }
    def docs = graft.queries.Td.documents(spark, dir)
    println(s"corpus = ${docs.count()}")
    def full(): Long = graft.operators.Curation.decontaminateBloom(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0), n = 3, minShared = 2)
      .orderBy(col("doc_id")).count()
    timed("bloom_warm")(full())
    System.gc(); Thread.sleep(200)
    timed("bloom_1")(full())
    System.gc(); Thread.sleep(200)
    timed("bloom_2")(full())
    timed("bloom_3")(full())
    spark.stop()
  }
}
