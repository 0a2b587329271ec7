package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column handling: images/audio/video ride through the lake
 * as opaque `binary` columns with a typed metadata struct, processed by
 * per-partition batch operators.
 *
 * The actual codec step is STUBBED (this environment ships no
 * image/audio libraries): [[FakeCodec]] synthesizes deterministic
 * pseudo-media whose "decode" parses a self-describing header. All the
 * Spark-side plumbing — schema, binary payloads, partition-batched
 * processing, feature extraction shape — is real and tested; swapping
 * [[FakeCodec.decodeDims]]/[[FakeCodec.decodePixels]] for a JNI/library
 * call is the only change needed for real media.
 */
object Multimodal {

  /** media metadata carried alongside every binary payload */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("size_bytes", LongType)))

  /**
   * Synthesize a deterministic fake "image" per document: payload =
   * `GFTI|<w>|<h>|<c>|<body>` as bytes. Dimensions derive from a hash
   * of the id, so decode is verifiable end-to-end.
   */
  def synthesizeImages(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val w = (pmod(xxhash64(lit("w"), col(idCol)), lit(1024L)) + 32L).cast(IntegerType)
    val h = (pmod(xxhash64(lit("h"), col(idCol)), lit(768L)) + 32L).cast(IntegerType)
    val c = (pmod(xxhash64(lit("c"), col(idCol)), lit(3L)) + 1L).cast(IntegerType)
    docs.select(col(idCol),
      concat_ws("|", lit("GFTI"), w.cast(StringType), h.cast(StringType),
        c.cast(StringType), col(textCol)).cast(BinaryType).as("media"))
  }

  /** "Decode" the stub header into the typed metadata struct — pure
    * column ops (no UDF): the header is parsed with split on the
    * string view of the payload prefix. */
  def decodeMeta(media: DataFrame, binCol: String = "media"): DataFrame = {
    val s = col(binCol).cast(StringType)
    val parts = split(s, "\\|", 5)
    media.withColumn("meta", struct(
      lit("image").as("media_type"),
      element_at(parts, 2).cast(IntegerType).as("width"),
      element_at(parts, 3).cast(IntegerType).as("height"),
      element_at(parts, 4).cast(IntegerType).as("channels"),
      octet_length(col(binCol)).cast(LongType).as("size_bytes")))
  }

  private object FakeCodec {
    /** stand-in for a real image decode: header fields */
    def decodeDims(bytes: Array[Byte]): (Int, Int, Int) = {
      val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      val p = s.split("\\|", 5)
      if (p.length >= 4 && p(0) == "GFTI") (p(1).toInt, p(2).toInt, p(3).toInt)
      else (0, 0, 0)
    }
    /** stand-in for pixel access: the payload body bytes */
    def decodePixels(bytes: Array[Byte]): Array[Byte] = {
      val idx = {
        var seen = 0; var i = 0
        while (i < bytes.length && seen < 4) { if (bytes(i) == '|') seen += 1; i += 1 }
        i
      }
      java.util.Arrays.copyOfRange(bytes, idx, bytes.length)
    }
  }

  /**
   * Batch feature extraction over partitions — the Scala analogue of a
   * `mapInPandas` batch UDF: one decoder instantiation per partition
   * (where a real codec would amortize model/library init), rows
   * streamed through it. Emits an 8-bin byte histogram as the "feature
   * vector" (deterministic stand-in for an embedding model).
   */
  def extractFeatures(media: DataFrame, idCol: String = "doc_id",
      binCol: String = "media"): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("feature", ArrayType(DoubleType))))
    val idIdx = media.schema.fieldIndex(idCol)
    val binIdx = media.schema.fieldIndex(binCol)
    val rdd = media.queryExecution.toRdd.mapPartitions { iter =>
      // per-partition "codec init" happens here in a real pipeline
      iter.map { internal =>
        val id = internal.getLong(idIdx)
        val bytes = internal.getBinary(binIdx)
        val (w, h, c) = FakeCodec.decodeDims(bytes)
        val pixels = FakeCodec.decodePixels(bytes)
        val hist = new Array[Double](8)
        var i = 0
        while (i < pixels.length) { hist((pixels(i) & 0xFF) >> 5) += 1.0; i += 1 }
        val total = math.max(1.0, pixels.length.toDouble)
        Row(id, w, h, c, hist.map(_ / total).toSeq)
      }
    }
    spark.createDataFrame(rdd.map(identity), outSchema)
  }

  /** "Video" frame sampling stub: split the payload into fixed-size
    * frame chunks and keep every `stride`-th — the partition/batch shape
    * of real frame sampling, with substring standing in for the codec. */
  def sampleFrames(media: DataFrame, idCol: String = "doc_id",
      binCol: String = "media", frameSize: Int = 64, stride: Int = 4): DataFrame = {
    val body = col(binCol).cast(StringType)
    val nFrames = floor(octet_length(col(binCol)) / frameSize).cast(IntegerType)
    // payloads shorter than one frame yield an EMPTY frames array
    // (a bare sequence(0, max(nFrames-1, 0)) would emit one phantom
    // truncated frame when nFrames = 0)
    val frames = when(nFrames <= 0, array().cast(ArrayType(StringType)))
      .otherwise(transform(sequence(lit(0), nFrames - 1, lit(stride)),
        i => body.substr(i * frameSize + 1, lit(frameSize))))
    media.select(col(idCol), nFrames.as("n_frames"), frames.as("frames"))
      .withColumn("n_sampled", size(col("frames")))
  }
}
