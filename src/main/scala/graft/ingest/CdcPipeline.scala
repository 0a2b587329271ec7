package graft.ingest

import graft.model.Schemas
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * The CDC dataflow of the reference's two Lambdas, re-expressed as
 * narrow DataFrame transforms that fuse into a single whole-stage-codegen
 * project+filter (SURVEY.md §2.2, §3.1-3.2):
 *
 *  T1 base64-decode + JSON-parse  (lambda/transform/index.py:22-23)
 *  T2 event filter INSERT|MODIFY  (lambda/transform/index.py:25,
 *                                  lambda/firehose/index.py:12)
 *  T3 NewImage projection         (lambda/transform/index.py:27)
 *  T4 DynamoDB-JSON unmarshal     (lambda/transform/index.py:30)
 *  T5 derive date/hour/minute     (lambda/transform/index.py:33-37)
 *
 * T6 (Decimal→float coercion, transform/index.py:10-14) is intentionally
 * NOT reproduced: we keep DecimalType(12,2) end-to-end where the
 * reference's Kinesis path degrades to float (documented divergence,
 * SURVEY.md §7). T7's re-encode/ack is transport-level and subsumed by
 * Structured Streaming's batch contract.
 */
object CdcPipeline {

  /** T1 for the Kinesis path: each record is `{recordId, data}` with the
    * envelope JSON base64-encoded in `data`
    * (lambda/transform/index.py:22-23). */
  def decodeKinesisFrames(frames: DataFrame): DataFrame =
    frames.select(
      // slim schema: from_json only materializes eventName + NewImage
      from_json(unbase64(col("data")).cast(StringType), Schemas.cdcEnvelopeSlim)
        .as("event"))
      .select("event.*")

  /** T1 for raw JSON lines (DynamoDB Streams test harness). */
  def parseJsonLines(lines: DataFrame): DataFrame =
    lines.select(from_json(col("value"), Schemas.cdcEnvelope).as("event"))
      .select("event.*")

  /** T2: keep INSERT/MODIFY; REMOVE (and anything else) is dropped —
    * deletes are not propagated (lambda/transform/index.py:25). */
  def filterEvents(events: DataFrame): DataFrame =
    events.filter(col("eventName").isin("INSERT", "MODIFY"))

  /** T4 helper: unmarshal one DynamoDB-typed attribute — take the sole
    * set value of the type-tagged struct ({"S": x} → x, {"N": "3"} → "3"),
    * exactly `{k: list(v.values())[0]}` (lambda/transform/index.py:30),
    * then cast to the target Spark type (the table declares real types;
    * Firehose/Iceberg performed this coercion implicitly — SURVEY §1.2). */
  def unmarshalAttr(image: Column, field: StructField): Column = {
    val attr = image.getItem(field.name)
    val raw = coalesce(
      attr.getField("S"),
      attr.getField("N"),
      attr.getField("BOOL").cast(StringType))
    raw.cast(field.dataType).as(field.name)
  }

  /** T3+T4: project NewImage and unmarshal every attribute of `schema`. */
  def unmarshal(events: DataFrame, schema: StructType): DataFrame = {
    val img = col("dynamodb").getField("NewImage")
    events.select(schema.map(f => unmarshalAttr(img, f)): _*)
  }

  /** T5: derive `date`, `hour`, `minute` from epoch-ms `timestamp`
    * (lambda/transform/index.py:33-37). The reference guards on the
    * field's presence (`if "timestamp" in item`); a null timestamp
    * likewise leaves the derived columns null here. Timestamps are
    * interpreted in the session time zone (we standardize on UTC where
    * the reference used naive local time — SURVEY §1.2). */
  def deriveTimeColumns(df: DataFrame): DataFrame = {
    val ts = timestamp_millis(col("timestamp"))
    df.withColumn("date", to_date(ts))
      .withColumn("hour", hour(ts))
      .withColumn("minute", minute(ts))
  }

  // ---- type-generic unmarshal (nested schemas) -------------------------

  /**
   * T4, TYPE-GENERIC: unmarshal a DynamoDB attribute of any wire tag
   * into a value of Spark type `dt`. Mirrors the reference's
   * `list(v.values())[0]` (lambda/transform/index.py:30), which is
   * tag-agnostic — but recursively, so `L`-of-`M` shapes (the nested
   * orders `items` array, scripts/create_sample_orders.py:29-56) decode
   * into real array<struct> columns instead of failing like the
   * scalar-only round-2 form. An explicit `NULL: true` tag decodes to
   * SQL NULL (stricter than the reference, which would pass `True`
   * through).
   */
  def unmarshalValue(attr: Column, dt: DataType): Column = {
    val decoded: Column = dt match {
      case ArrayType(elem, _) =>
        val fromL = transform(attr.getField("L"), e => unmarshalValue(e, elem))
        elem match {
          case StringType =>
            coalesce(fromL, attr.getField("SS").cast(ArrayType(StringType)))
          case n: NumericType =>
            coalesce(fromL,
              transform(attr.getField("NS"), x => x.cast(n)))
          case _ => fromL
        }
      case st: StructType =>
        val m = attr.getField("M")
        when(m.isNotNull,
          struct(st.map(f =>
            unmarshalValue(m.getField(f.name), f.dataType).as(f.name)): _*))
      case MapType(StringType, v, _) =>
        transform_values(attr.getField("M"), (_, a) => unmarshalValue(a, v))
      case BinaryType => unbase64(attr.getField("B"))
      case _ =>
        coalesce(attr.getField("S"), attr.getField("N"),
          attr.getField("BOOL").cast(StringType)).cast(dt)
    }
    when(attr.getField("NULL") === true, lit(null).cast(dt)).otherwise(decoded)
  }

  /** T3+T4 for a struct-keyed NewImage (see [[Schemas.dynamoImageFor]]):
    * project and unmarshal every attribute of `schema`, nested shapes
    * included. */
  def unmarshalNested(events: DataFrame, schema: StructType): DataFrame = {
    val img = col("dynamodb").getField("NewImage")
    events.select(schema.map(f =>
      unmarshalValue(img.getField(f.name), f.dataType).as(f.name)): _*)
  }

  /** T1 parameterized by target schema — parses NewImage as a typed
    * struct tree instead of the flat path's homogeneous map. */
  def decodeKinesisFramesAs(frames: DataFrame, schema: StructType): DataFrame =
    frames.select(
      from_json(unbase64(col("data")).cast(StringType),
        Schemas.cdcEnvelopeSlimFor(schema)).as("event"))
      .select("event.*")

  /** Full transform-Lambda dataflow for ANY target schema (nested
    * arrays-of-structs included): frames in, typed rows out, time
    * columns derived when the schema carries an epoch-ms `timestamp`
    * (the reference's `if "timestamp" in item` guard). */
  def kinesisPathAs(frames: DataFrame, schema: StructType): DataFrame = {
    val typed = unmarshalNested(filterEvents(decodeKinesisFramesAs(frames, schema)), schema)
    if (schema.fieldNames.contains("timestamp")) deriveTimeColumns(typed) else typed
  }

  /** Full transform-Lambda dataflow (Kinesis path, §3.2): frames in,
    * typed flat transaction rows out. One codegen stage end-to-end. */
  def kinesisPath(frames: DataFrame): DataFrame =
    deriveTimeColumns(unmarshal(filterEvents(decodeKinesisFrames(frames)),
      Schemas.transactions))

  /**
   * DELETE-PROPAGATING Kinesis dataflow: where the reference's Lambda
   * silently drops REMOVE events (lambda/transform/index.py:25 — its
   * lake can only grow), this path forwards them as flagged rows so
   * `TxTable.merge(deleteCol = Some("_deleted"))` can apply
   * MERGE-WHEN-MATCHED-DELETE semantics. A REMOVE record carries no
   * post-image; its row content (key and, crucially, the partition
   * columns that keep the merge partition-pruned) is unmarshalled from
   * the pre-image instead (NEW_AND_OLD_IMAGES stream view). Still one
   * codegen'd project+filter — the image choice is a per-row `when`.
   */
  def kinesisPathWithDeletes(frames: DataFrame): DataFrame = {
    val events = frames.select(
        from_json(unbase64(col("data")).cast(StringType),
          Schemas.cdcEnvelopeSlimWithOld).as("event"))
      .select("event.*")
      .filter(col("eventName").isin("INSERT", "MODIFY", "REMOVE"))
    val img = when(col("eventName") === "REMOVE",
        col("dynamodb").getField("OldImage"))
      .otherwise(col("dynamodb").getField("NewImage"))
    val typed = events.select(Schemas.transactions.map(f =>
      unmarshalAttr(img, f)) :+
      (col("eventName") === "REMOVE").as("_deleted"): _*)
    deriveTimeColumns(typed)
  }

  /** Firehose-Lambda dataflow (DynamoDB Streams path, §3.1): parsed
    * envelopes in, typed rows out. This path does NOT derive time
    * columns — the seed generator pre-computes them
    * (scripts/create_sample_data.py:57-59); they arrive in the image. */
  def dynamoStreamsPath(events: DataFrame): DataFrame =
    unmarshal(filterEvents(events), Schemas.transactions)

  /** Delete-propagating DynamoDB Streams dataflow: like
    * [[kinesisPathWithDeletes]] but over parsed full envelopes — REMOVE
    * rows unmarshal from the pre-image and carry `_deleted = true` for
    * `TxTable.merge(deleteCol = ...)`. */
  def dynamoStreamsPathWithDeletes(events: DataFrame): DataFrame = {
    val filtered = events.filter(col("eventName").isin("INSERT", "MODIFY", "REMOVE"))
    val img = when(col("eventName") === "REMOVE",
        col("dynamodb").getField("OldImage"))
      .otherwise(col("dynamodb").getField("NewImage"))
    filtered.select(Schemas.transactions.map(f =>
      unmarshalAttr(img, f)) :+
      (col("eventName") === "REMOVE").as("_deleted"): _*)
  }
}
