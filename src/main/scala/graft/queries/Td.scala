package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata tables (TESTDATA.md / FIXTURES.md §4). */
object Td {

  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some
    * testdata generations (Spark's reader rejects it by default) and
    * as plain micros (reading as TIMESTAMP_NTZ) in others — adapt to
    * whichever shape is on disk and normalize to a microsecond
    * session-zone TimestampType `ts` (floor-truncation — matching
    * DuckDB's `ts::TIMESTAMP` cast so oracle comparisons agree; the
    * session zone is UTC in every entry point, so the NTZ cast is
    * value-preserving against DuckDB's naive read). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      raw.schema("ts").dataType match {
        case LongType =>           // TIMESTAMP(NANOS) read as raw nanos
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>   // plain micros, not adjusted to UTC
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case _ => raw
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}

/** One named query: the Spark implementation plus (when the operator is
  * SQL-expressible) the equivalent DuckDB oracle SQL over the same
  * parquet tables. Column names/aliases MUST match between the two —
  * the driver's hash compare sorts columns by name. */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    /** include in the per-round Bench headline set */
    bench: Boolean = false)
