package graft.ingest

import graft.SparkSpec
import graft.model.Schemas
import graft.table.TxTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class CdcPipelineSpec extends SparkSpec {

  test("kinesis path: decode → filter → unmarshal → derive round-trips") {
    val txns = SampleData.transactions(spark, 50, seed = 1L)
    val frames = SampleData.toKinesisFrames(SampleData.toCdcEnvelopes(txns))
    val out = CdcPipeline.kinesisPath(frames)
    // unmarshal output is nullable (map access); compare names + types
    assert(out.schema.map(f => (f.name, f.dataType)) ===
      Schemas.transactions.map(f => (f.name, f.dataType)))
    // unmarshal(marshal(x)) == x (SURVEY §5.3 property)
    val a = txns.orderBy("transaction_id").collect().toSeq
    val b = out.orderBy("transaction_id").collect().toSeq
    assert(a === b)
  }

  test("REMOVE events are dropped; INSERT/MODIFY pass") {
    val txns = SampleData.transactions(spark, 30, seed = 2L)
    val tagged = SampleData.toCdcEnvelopes(txns,
      eventName = when(col("transaction_id").substr(5, 1).isin("0", "1", "2", "3"), "REMOVE")
        .otherwise("INSERT"))
    val kept = CdcPipeline.dynamoStreamsPath(tagged)
    val expectedKept = tagged.filter(col("eventName") =!= "REMOVE").count()
    assert(kept.count() === expectedKept)
    assert(kept.count() < 30)
  }

  test("missing timestamp leaves derived time columns null (conditional derive)") {
    val txns = SampleData.transactions(spark, 10, seed = 3L)
      .withColumn("timestamp", lit(null).cast("long"))
    val frames = SampleData.toKinesisFrames(SampleData.toCdcEnvelopes(txns))
    val out = CdcPipeline.kinesisPath(frames)
    assert(out.filter(col("date").isNull && col("hour").isNull &&
      col("minute").isNull).count() === 10)
  }

  test("streaming ingest: micro-batch replay equals the upsert fold") {
    val work = freshDir("stream_ingest")
    val txns = SampleData.transactions(spark, 60, seed = 4L)
    SampleData.toCdcEnvelopes(txns).toJSON
      .repartition(4).write.mode("overwrite").text(s"$work/in")
    val t = TxTable.create(spark, new Path(s"$work/table"), "t",
      Schemas.transactions, Seq("date"))
    val q = StreamingIngest.start(spark, s"$work/in", t,
      s"$work/ckpt", s"$work/errors",
      trigger = Trigger.AvailableNow(), maxFilesPerTrigger = 1)
    q.awaitTermination(120000)
    // multiple micro-batches committed, each a separate table version
    assert(t.currentVersion >= 2)
    assert(t.toDF.count() === 60)
    assert(t.toDF.select("transaction_id").distinct().count() === 60)
  }

  test("streaming ingest with propagateDeletes: REMOVE wave deletes its keys") {
    val work = freshDir("stream_ingest_del")
    val txns = SampleData.transactions(spark, 40, seed = 5L)
    // wave 1: all 40 insert; wave 2 (later files): REMOVE the HIGH-risk
    // rows, delete stamped after the insert's processing time
    val removes = txns.filter(col("risk_score") === "HIGH")
      .withColumn("processing_timestamp", col("processing_timestamp") + 1000L)
    SampleData.toCdcEnvelopes(txns).toJSON
      .repartition(2).write.mode("overwrite").text(s"$work/in")
    SampleData.toCdcRemoveEnvelopes(removes).toJSON
      .repartition(1).write.mode("append").text(s"$work/in")
    val t = TxTable.create(spark, new Path(s"$work/table"), "t",
      Schemas.transactions, Seq("date"))
    val q = StreamingIngest.start(spark, s"$work/in", t,
      s"$work/ckpt", s"$work/errors",
      trigger = Trigger.AvailableNow(), maxFilesPerTrigger = 1,
      propagateDeletes = true)
    q.awaitTermination(120000)
    val nHigh = removes.count()
    assert(t.toDF.count() === 40 - nHigh)
    assert(t.toDF.filter(col("risk_score") === "HIGH").count() === 0)
  }

  test("continuous ingest: ProcessingTime trigger keeps merging new files") {
    val work = freshDir("stream_pt")
    val t = TxTable.create(spark, new Path(s"$work/table"), "t",
      Schemas.transactions, Seq("date"))
    val wave1 = SampleData.transactions(spark, 40, seed = 8L)
    SampleData.toCdcEnvelopes(wave1).toJSON
      .repartition(2).write.mode("overwrite").text(s"$work/in")
    // the reference buffers 60 s between deliveries (firehose.py:92-94);
    // 500 ms here only shrinks the wall-clock of the same loop
    val q = StreamingIngest.start(spark, s"$work/in", t,
      s"$work/ckpt", s"$work/errors",
      trigger = Trigger.ProcessingTime("500 milliseconds"))
    def awaitCount(n: Long): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (t.toDF.count() != n && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      assert(t.toDF.count() === n)
    }
    try {
      awaitCount(40)
      // a second wave arriving while the query is live: the next tick
      // must pick it up without restart — the Firehose delivery loop
      val wave2 = SampleData.transactions(spark, 25, seed = 9L)
      SampleData.toCdcEnvelopes(wave2).toJSON
        .repartition(1).write.mode("append").text(s"$work/in")
      awaitCount(65)
      assert(t.toDF.select("transaction_id").distinct().count() === 65)
    } finally { q.stop(); q.awaitTermination(30000) }
  }

  test("poisoned micro-batch lands in the DLQ, stream-side state intact") {
    val work = freshDir("dlq")
    val t = TxTable.create(spark, new Path(s"$work/table"), "t",
      Schemas.transactions, Seq("date"))
    // batch missing the upsert key column → merge rejects it
    import spark.implicits._
    val poisoned = Seq((1L, "oops")).toDF("timestamp", "junk")
    StreamingIngest.mergeBatch(t, poisoned, batchId = 7, errorsDir = s"$work/errors")
    // rejected batch replayable from errors/ (Firehose errors/ prefix)
    val dlq = spark.read.json(s"$work/errors/batch=7")
    assert(dlq.count() === 1)
    assert(t.currentVersion === 0) // no partial commit
  }

  test("generator is deterministic for a fixed seed") {
    val a = SampleData.transactions(spark, 20, seed = 7L).collect().toSeq
    val b = SampleData.transactions(spark, 20, seed = 7L).collect().toSeq
    assert(a === b)
  }

  test("nested orders round-trip the generic marshal/unmarshal (L-of-M)") {
    val orders = SampleData.orders(spark, 30, seed = 13L)
    val frames = SampleData.toKinesisFrames(
      SampleData.toCdcEnvelopesOf(orders, Schemas.orders, keyCol = "orderId"))
    val back = CdcPipeline.kinesisPathAs(frames, Schemas.orders)
      .select(Schemas.orders.fieldNames.map(org.apache.spark.sql.functions.col): _*)
    val orig = orders.orderBy("orderId").collect().toSeq
    val got = back.orderBy("orderId").collect().toSeq
    assert(got === orig) // items array-of-struct, decimals, ints — exact
  }

  test("generic unmarshal: NULL tag, BOOL, binary, string-set shapes") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("flag", BooleanType),
      StructField("blob", BinaryType),
      StructField("tags", ArrayType(StringType)),
      StructField("gone", StringType)))
    val json =
      """{"eventName":"INSERT","dynamodb":{"NewImage":{
        |"id":{"S":"a"},"flag":{"BOOL":true},"blob":{"B":"aGk="},
        |"tags":{"SS":["x","y"]},"gone":{"NULL":true}}}}""".stripMargin.replace("\n", "")
    import spark.implicits._
    val events = spark.read.schema(Schemas.cdcEnvelopeSlimFor(schema))
      .json(Seq(json).toDS)
    val row = CdcPipeline.unmarshalNested(events, schema).collect()(0)
    assert(row.getString(0) === "a")
    assert(row.getBoolean(1) === true)
    assert(new String(row.getAs[Array[Byte]](2), "UTF-8") === "hi")
    assert(row.getSeq[String](3) === Seq("x", "y"))
    assert(row.isNullAt(4))
  }
}
