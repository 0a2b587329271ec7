package graft.model

import org.apache.spark.sql.types._

/**
 * Core data model of the engine, derived from the reference's declared
 * schemas (see SURVEY.md §1):
 *  - the 21-column flat `transactions` schema
 *    (kinesis-firehose-stream/tabledefinition.json:9-99, identically in
 *    kinesis-firehose-stream/lambda/custom_resource/index.py:92-124);
 *  - the nested Athena-DDL variant with two STRUCT columns
 *    (kinesis-firehose-stream/scripts/update_metadata.py:78-117);
 *  - the DynamoDB Streams CDC envelope consumed by the Lambdas
 *    (kinesis-firehose-stream/lambda/transform/index.py:20-30,
 *     kinesis-firehose-stream/lambda/firehose/index.py:11-17);
 *  - the `orders` schema with an array-of-struct `items` column
 *    (kinesis-firehose-stream/scripts/create_sample_orders.py:29-57).
 */
object Schemas {

  /** Flat 21-column transactions schema (tabledefinition.json:9-99).
    * `transaction_id` is the upsert unique key and NOT NULL
    * (stack/firehose.py:99, tabledefinition.json:10-14). */
  val transactions: StructType = StructType(Seq(
    StructField("transaction_id", StringType, nullable = false),
    StructField("timestamp", LongType),               // epoch millis
    StructField("customer_id", StringType),
    StructField("date", DateType),
    StructField("hour", IntegerType),
    StructField("minute", IntegerType),
    StructField("transaction_type", StringType),
    StructField("amount", DecimalType(12, 2)),
    StructField("currency", StringType),
    StructField("merchant_category", StringType),
    StructField("payment_method", StringType),
    StructField("region", StringType),
    StructField("risk_score", StringType),
    StructField("status", StringType),
    StructField("processing_timestamp", LongType),    // epoch millis
    StructField("device_type", StringType),
    StructField("authentication_method", StringType),
    StructField("merchant_id", StringType),
    StructField("velocity_check", StringType),
    StructField("amount_threshold", StringType),
    StructField("location_risk", StringType),
    StructField("pattern_match", StringType)
  ))

  /** Nested variant (scripts/update_metadata.py:100-112): the last seven
    * columns fold into two struct columns; `PARTITIONED BY (date)`. */
  val transactionsNested: StructType = StructType(Seq(
    StructField("transaction_id", StringType, nullable = false),
    StructField("timestamp", LongType),
    StructField("customer_id", StringType),
    StructField("date", DateType),
    StructField("hour", IntegerType),
    StructField("minute", IntegerType),
    StructField("transaction_type", StringType),
    StructField("amount", DecimalType(12, 2)),
    StructField("currency", StringType),
    StructField("merchant_category", StringType),
    StructField("payment_method", StringType),
    StructField("region", StringType),
    StructField("risk_score", StringType),
    StructField("status", StringType),
    StructField("processing_timestamp", LongType),
    StructField("transaction_metadata", StructType(Seq(
      StructField("device_type", StringType),
      StructField("authentication_method", StringType),
      StructField("merchant_id", StringType)))),
    StructField("fraud_indicators", StructType(Seq(
      StructField("velocity_check", StringType),
      StructField("amount_threshold", StringType),
      StructField("location_risk", StringType),
      StructField("pattern_match", StringType))))
  ))

  /** A DynamoDB typed attribute value: exactly one of the type tags is
    * set (`{"S": "x"}` / `{"N": "1.5"}` / `{"BOOL": true}` ...). The
    * reference unmarshals by taking the sole value
    * (lambda/transform/index.py:30). We model the common scalar tags. */
  val dynamoAttr: StructType = StructType(Seq(
    StructField("S", StringType),
    StructField("N", StringType),
    StructField("BOOL", BooleanType),
    StructField("NULL", BooleanType)
  ))

  /** DynamoDB Streams change-record envelope
    * (lambda/firehose/index.py:11-17): `eventName` ∈ INSERT|MODIFY|REMOVE,
    * post-image under `dynamodb.NewImage`, pre-image under `OldImage`
    * (stream is NEW_AND_OLD_IMAGES, stack/pipeline.py:75). Each image is
    * a map attribute-name → typed value. */
  val cdcEnvelope: StructType = StructType(Seq(
    StructField("eventID", StringType),
    StructField("eventName", StringType),
    StructField("dynamodb", StructType(Seq(
      StructField("ApproximateCreationDateTime", LongType),
      StructField("Keys", MapType(StringType, dynamoAttr)),
      StructField("NewImage", MapType(StringType, dynamoAttr)),
      StructField("OldImage", MapType(StringType, dynamoAttr)),
      StructField("SequenceNumber", StringType)
    )))
  ))

  /**
   * Wire schema of a DynamoDB typed attribute holding a value of Spark
   * type `dt` — the TYPE-GENERIC form (transform/index.py:30 unmarshals
   * with `list(v.values())[0]`, which handles every tag; round 2 only
   * modeled the scalar S/N/BOOL tags, so nested orders envelopes could
   * not be CDC-ingested). The DynamoDB AttributeValue type is
   * recursive; Spark schemas can't be, so the wire schema is derived
   * from the TARGET schema: arrays admit L (and the SS/NS set forms),
   * structs/maps admit M, binaries admit B, scalars admit S/N/BOOL —
   * every shape also admits NULL.
   */
  def dynamoAttrFor(dt: DataType): StructType = dt match {
    case ArrayType(elem, _) =>
      val sets = elem match {
        case StringType => Seq(StructField("SS", ArrayType(StringType)))
        case _: NumericType => Seq(StructField("NS", ArrayType(StringType)))
        case _ => Nil
      }
      StructType(StructField("L", ArrayType(dynamoAttrFor(elem))) +: sets :+
        StructField("NULL", BooleanType))
    case st: StructType => StructType(Seq(
      StructField("M", StructType(st.map(f =>
        StructField(f.name, dynamoAttrFor(f.dataType))))),
      StructField("NULL", BooleanType)))
    case MapType(StringType, v, _) => StructType(Seq(
      StructField("M", MapType(StringType, dynamoAttrFor(v))),
      StructField("NULL", BooleanType)))
    case BinaryType => StructType(Seq(
      StructField("B", StringType),            // base64 on the wire
      StructField("NULL", BooleanType)))
    case _ => StructType(Seq(
      StructField("S", StringType),
      StructField("N", StringType),
      StructField("BOOL", BooleanType),
      StructField("NULL", BooleanType)))
  }

  /** NewImage wire schema for a target table schema: a STRUCT keyed by
    * attribute name (heterogeneous per-field attr types, unlike the
    * homogeneous map of the flat path). */
  def dynamoImageFor(schema: StructType): StructType =
    StructType(schema.map(f => StructField(f.name, dynamoAttrFor(f.dataType))))

  /** Slim CDC envelope parameterized by target schema (cf.
    * [[cdcEnvelopeSlim]] for the flat transactions path). */
  def cdcEnvelopeSlimFor(schema: StructType): StructType = StructType(Seq(
    StructField("eventName", StringType),
    StructField("dynamodb", StructType(Seq(
      StructField("NewImage", dynamoImageFor(schema)))))))

  /** Projection of [[cdcEnvelope]] to the fields the ingest dataflow
    * actually consumes (eventName + post-image). `from_json` skips
    * fields absent from its schema, so parsing with this instead of the
    * full envelope avoids materializing Keys/OldImage/sequence metadata
    * for every record — measurably faster on the JSON-decode hot path. */
  val cdcEnvelopeSlim: StructType = StructType(Seq(
    StructField("eventName", StringType),
    StructField("dynamodb", StructType(Seq(
      StructField("NewImage", MapType(StringType, dynamoAttr))
    )))))

  /** Slim envelope for the delete-propagating CDC path: REMOVE records
    * carry no NewImage — their row content (key AND partition columns,
    * needed for partition-pruned merge deletes) rides in the pre-image,
    * which NEW_AND_OLD_IMAGES streams populate (stack/pipeline.py:75). */
  val cdcEnvelopeSlimWithOld: StructType = StructType(Seq(
    StructField("eventName", StringType),
    StructField("dynamodb", StructType(Seq(
      StructField("NewImage", MapType(StringType, dynamoAttr)),
      StructField("OldImage", MapType(StringType, dynamoAttr))
    )))))

  /** Kinesis-framed record: the CDC envelope JSON is base64-encoded into
    * `data` (lambda/transform/index.py:22). */
  val kinesisFrame: StructType = StructType(Seq(
    StructField("recordId", StringType),
    StructField("data", StringType)
  ))

  /** orders schema (scripts/create_sample_orders.py:48-57) — array of
    * item structs, used for the explode/array surface. */
  val orders: StructType = StructType(Seq(
    StructField("orderId", StringType, nullable = false),
    StructField("timestamp", LongType),
    StructField("customerId", StringType),
    StructField("items", ArrayType(StructType(Seq(
      StructField("productId", StringType),
      StructField("category", StringType),
      StructField("price", DecimalType(10, 2)),
      StructField("quantity", IntegerType))))),
    StructField("totalAmount", DecimalType(12, 2)),
    StructField("region", StringType),
    StructField("paymentMethod", StringType)
  ))
}

/** Typed row for the transactions table (flat form). */
case class Transaction(
    transaction_id: String,
    timestamp: Long,
    customer_id: String,
    date: java.sql.Date,
    hour: Int,
    minute: Int,
    transaction_type: String,
    amount: java.math.BigDecimal,
    currency: String,
    merchant_category: String,
    payment_method: String,
    region: String,
    risk_score: String,
    status: String,
    processing_timestamp: Long,
    device_type: String,
    authentication_method: String,
    merchant_id: String,
    velocity_check: String,
    amount_threshold: String,
    location_risk: String,
    pattern_match: String)

case class OrderItem(productId: String, category: String,
    price: java.math.BigDecimal, quantity: Int)

case class Order(
    orderId: String,
    timestamp: Long,
    customerId: String,
    items: Seq[OrderItem],
    totalAmount: java.math.BigDecimal,
    region: String,
    paymentMethod: String)
