package graft

import graft.ingest.{CdcPipeline, SampleData}
import graft.model.Schemas
import graft.table.TxTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Dev scratchpad — `sbt "runMain graft.Scratch"`. Not part of the API. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(n: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$n: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    val work = "target/qwork/profile_ingest"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    // warm codegen with a tiny run
    SampleData.toKinesisFrames(SampleData.toCdcEnvelopes(
      SampleData.transactions(spark, 100, seed = 1L))).count()

    t("a: generate+write json 40k")(
      SampleData.toKinesisFrames(SampleData.toCdcEnvelopes(
        SampleData.transactions(spark, 40000, seed = 7L)))
        .write.mode("overwrite").json(s"$work/frames"))
    val frames = spark.read.schema(Schemas.kinesisFrame).json(s"$work/frames")
    t("b: decode+transform count")(CdcPipeline.kinesisPath(frames).count())
    val tbl = TxTable.create(spark, new Path(s"$work/table"), "t",
      Schemas.transactions, Seq("date"))
    t("c: merge 40k into empty")(
      tbl.merge(CdcPipeline.kinesisPath(frames), "transaction_id", "processing_timestamp"))
    t("d: merge 40k again (update all)")(
      tbl.merge(CdcPipeline.kinesisPath(frames), "transaction_id", "processing_timestamp"))
    spark.stop()
  }
}
