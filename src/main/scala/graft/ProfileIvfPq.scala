package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for the sf1 IVF-PQ search path (not part of the API). */
object ProfileIvfPq {
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
    def emb = graft.queries.Td.embeddings(spark, dir)
    println(s"corpus = ${emb.count()}")
    def queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    def full(): Long = graft.operators.Similarity.ivfPqTopK(
        emb, queries, k = 10, dim = 64, nCells = 16, nprobe = 4, m = 8, kCodes = 16)
      .orderBy(col("query_id"), col("rank")).count()
    timed("ivfpq_warm")(full())
    timed("ivfpq_1")(full())
    timed("ivfpq_2")(full())
    spark.stop()
  }
}
