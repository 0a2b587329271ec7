package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for the sf1 embedding-dedup path (not part of the API). */
object ProfileEmb {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "target/qwork/bench_docs10x_sf0.1"
    def timed(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime(); val r = body
      println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.2f s rows=$r")
    }
    def emb = graft.queries.Td.embeddings(spark, dir)
    val k = graft.operators.Dedup.autoClusters(20000)
    println(s"k=$k")
    def assigned = graft.operators.Similarity.coarseCells(
      emb.select(col("vec_id"), col("embedding")), "vec_id", "embedding", k)
    timed("assign1")(assigned.count())
    timed("assign2")(assigned.count())
    // cluster population skew
    val pops = assigned.groupBy("cell").count()
    val vol = pops.select(sum(col("count")*(col("count")-1)/2)).collect()(0)
    println(s"pair volume = $vol")
    def full(): Long = graft.operators.Dedup.semDedup(emb, threshold = 0.4)
      .orderBy(col("vec_id")).count()
    timed("sem_full1")(full())
    timed("sem_full2")(full())
    def fullEmb(): Long = graft.operators.Dedup.embeddingNearDup(emb,
      dim = 64, threshold = 0.4, nTables = 8)
      .orderBy(col("id_a"), col("id_b")).count()
    timed("embdup_full1")(fullEmb())
    timed("embdup_full2")(fullEmb())
    spark.stop()
  }
}
