package graft

import graft.ingest.{CdcPipeline, SampleData}
import graft.model.Schemas
import graft.queries.{Pipeline, Pipeline2, Pipeline3, Pipeline4, Q, Relational, Relational2}
import graft.table.TxTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Full registry: relational surface + pipeline/table operators. */
  lazy val registry: Seq[Q] =
    Relational.all ++ Relational2.all ++ Pipeline.all ++ Pipeline2.all ++
      Pipeline3.all ++ Pipeline4.all

  /**
   * Flagship end-to-end slice (SURVEY §7 "minimum end-to-end slice"):
   * seeded transaction generator → DynamoDB-JSON CDC envelopes →
   * Kinesis-path ingest (decode/filter/unmarshal/derive) → MERGE into a
   * partitioned transactional table → the README Risk-Analysis query
   * (kfs/README.md:169-185) over the committed snapshot.
   */
  def entry(spark: SparkSession): DataFrame = {
    val work = java.nio.file.Paths.get("target", "qwork", "entry").toFile
    org.apache.commons.io.FileUtils.deleteQuietly(work)
    val t = TxTable.create(spark, new Path(new Path(work.getAbsolutePath), "table"),
      "transactions", Schemas.transactions, Seq("date"))
    // Materialize the CDC frames to storage and re-read — the reference's
    // events likewise arrive from a stream/storage boundary, and the
    // boundary keeps generator and ingest as separate Catalyst plans
    // (fusing them collapses into one exponential expression tree).
    val framesDir = new java.io.File(work, "frames").getAbsolutePath
    SampleData.toKinesisFrames(
        SampleData.toCdcEnvelopes(SampleData.transactions(spark, 1000, seed = 42L)))
      .write.mode("overwrite").json(framesDir)
    val frames = spark.read.schema(Schemas.kinesisFrame).json(framesDir)
    t.merge(CdcPipeline.kinesisPath(frames),
      key = "transaction_id", orderCol = "processing_timestamp")
    t.toDF
      .groupBy(col("region"), col("merchant_category"), col("date"))
      .agg(
        count(lit(1)).as("total_transactions"),
        sum(col("amount").cast(DecimalType(12, 2))).cast(DecimalType(18, 2))
          .as("total_amount"),
        count(when(col("risk_score") === "HIGH", 1)).as("high_risk_count"),
        count(when(col("velocity_check") === "FLAG", 1)).as("velocity_flags"),
        count(when(col("status") === "FLAGGED", 1)).as("flagged_count"))
      .filter(col("high_risk_count") > 0)
      .orderBy(col("high_risk_count").desc, col("region").asc,
        col("merchant_category").asc)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap

  /** Headline subset for the per-round Bench. */
  def benchNames: Seq[String] = registry.filter(_.bench).map(_.name)
}
