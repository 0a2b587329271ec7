package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileAnnIdx {
  def main(args: Array[String]): Unit = {
    import graft.operators.Similarity
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = new java.io.File("target/qwork/bench_docs10x_sf0.1").getAbsolutePath
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()
    emb.count()
    val queries = emb.filter(pmod(col("vec_id"), lit(311)) === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec")).cache()
    queries.count()
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val model = timed("build") { Similarity.buildIndexModel(emb, 64) }
    println("nprobe=" + model.nprobe)
    val indexed = Similarity.encodeIvfPq(emb, model).cache()
    indexed.count()
    timed("query1") { Similarity.searchIndexed(indexed, emb, queries, model, 10).count() }
    timed("query2") { Similarity.searchIndexed(indexed, emb, queries, model, 10).count() }
    spark.stop()
  }
}
