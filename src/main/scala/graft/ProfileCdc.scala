package graft

import graft.ingest.{CdcPipeline, SampleData}
import graft.model.Schemas
import graft.table.TxTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of the cdc_ingest_bench path. */
object ProfileCdc {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warm
    SampleData.stagedKinesisFrames(spark, 40000, seed = 7L)
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val framesDir = time("stage frames (cached)") {
        SampleData.stagedKinesisFrames(spark, 40000, seed = 7L)
      }
      val frames = spark.read.schema(Schemas.kinesisFrame).json(framesDir)
      time("decode only (count)") {
        CdcPipeline.kinesisPath(frames).count()
      }
      val work = new java.io.File(s"target/qwork/profile_cdc_$round")
      org.apache.commons.io.FileUtils.deleteQuietly(work)
      val t = time("table create") {
        TxTable.create(spark, new Path(work.getAbsolutePath), "txns",
          Schemas.transactions, Seq("date"))
      }
      time("merge") {
        t.merge(CdcPipeline.kinesisPath(frames),
          key = "transaction_id", orderCol = "processing_timestamp")
      }
      time("final groupBy") {
        t.toDF.groupBy(col("date"))
          .agg(count(lit(1)).as("n")).orderBy(col("date")).count()
      }
    }
    spark.stop()
  }
}
