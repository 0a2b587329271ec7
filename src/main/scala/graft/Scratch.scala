package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev scratchpad — `sbt "runMain graft.Scratch"`. Not part of the API. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$n: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$r")
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count()

    def pos(tk: org.apache.spark.sql.DataFrame) =
      tk.filter(size(col("tk")) >= 3)
        .select(array_distinct(transform(sequence(lit(1), size(col("tk")) - 2),
          i => xxhash64(element_at(col("tk"), i), element_at(col("tk"), i + 1),
            element_at(col("tk"), i + 2)))).as("h"))
        .filter(size(col("h")) > 0)

    t("plain split")(pos(docs.select(split(col("text"), " ").as("tk"))).count())
    t("regex split")(pos(docs.select(split(trim(lower(col("text"))), "\\s+").as("tk"))).count())
    val guarded = when(length(trim(col("text"))) === 0,
      array().cast(ArrayType(StringType)))
      .otherwise(split(trim(lower(col("text"))), "\\s+"))
    t("guarded regex")(pos(docs.select(guarded.as("tk"))).count())
    t("hashedShingles")(operators.Dedup.hashedShingles(docs, "doc_id", "text", 3).count())
    t("hashedShingles2")(operators.Dedup.hashedShingles(docs, "doc_id", "text", 3).count())
    spark.stop()
  }
}
