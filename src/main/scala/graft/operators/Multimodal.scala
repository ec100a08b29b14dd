package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: media (image/audio/video) travels as an
 * opaque `binary` column plus a typed metadata struct; decode /
 * feature-extraction runs batched per partition so a real decoder
 * would amortize model/codec setup per-batch, exactly like a Pandas-
 * UDF/`mapInPandas` pipeline does in Python.
 *
 * The decoders themselves are STUBS (this environment ships no image/
 * audio codecs): `stubDecode` derives deterministic pseudo-features
 * from the bytes. The Spark-side contract — schema, batch iteration,
 * partitioning, output shape — is real and tested; swap `stubDecode`
 * for a JNI/ONNX call and nothing else changes.
 */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("source", StringType, nullable = true))), nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = true),
    StructField("header_hex", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = true)))

  /** Wrap a text/id frame as a media frame (bytes = utf-8 of the text
   * stands in for real image/audio payloads). */
  def asMedia(df: DataFrame, id: String, payload: String, source: String): DataFrame =
    df.select(col(id).cast(LongType).as("media_id"),
      encode(col(payload), "UTF-8").as("bytes"),
      struct(lit("application/octet-stream").as("mime"),
        col(source).as("source")).as("meta"))

  /** STUB decoder — deterministic pseudo-features from raw bytes.
   * Replace with a real codec (???) for production use; signature and
   * batch shape are the real contract. */
  private[operators] def stubDecode(id: Long, bytes: Array[Byte]): Row = {
    val n = bytes.length
    val header = bytes.take(4).map(b => f"${b & 0xff}%02x").mkString
    // fake dimensions and an 8-dim feature from a rolling byte hash
    val w = 16 + (math.abs(n * 2654435761L % 1024L)).toInt
    val h = 16 + (math.abs((n + 7) * 1013904223L % 1024L)).toInt
    var acc = 1469598103934665603L // FNV-64 offset basis
    val feat = new Array[Float](8)
    var i = 0
    while (i < n) {
      acc = (acc ^ (bytes(i) & 0xffL)) * 1099511628211L
      feat(i % 8) += ((acc >>> 40) & 0xffff).toFloat / 65536f
      i += 1
    }
    Row(id, n.toLong, header, w, h, feat.toSeq)
  }

  /** Batched decode/feature-extract: one pass per partition, rows
   * processed in deterministic order within the partition. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "bytes").rdd.mapPartitions { it =>
      // per-batch setup would open the codec/model exactly here
      it.map { r =>
        // null payload → null features (a decoder has nothing to say)
        if (r.isNullAt(1)) Row(r.getLong(0), null, null, null, null, null)
        else stubDecode(r.getLong(0), r.getAs[Array[Byte]](1))
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Frame sampling stub for video-shaped payloads: every `stride`-th
   * fixed-size window of the hex-encoded byte stream becomes one
   * "frame" row — the explode/partition plumbing a real frame sampler
   * needs. Windows are explicit substrings (a `\G`-lookbehind split
   * chunker silently fails to split under Spark's regex split, and
   * Spark's base64 is MIME-chunked with CRLFs — hex is stable across
   * engines). Empty payloads yield no frames; the last window may be
   * short. `frameChars` counts hex chars, i.e. frameChars/2 bytes. */
  def sampleFrames(media: DataFrame, frameChars: Int, stride: Int): DataFrame =
    media.select(col("media_id"), lower(hex(col("bytes"))).as("__hex"))
      .filter(length(col("__hex")) > 0)
      .select(col("media_id"),
        posexplode(transform(
          sequence(lit(0),
            floor((length(col("__hex")) - 1) / lit(frameChars)).cast("int")),
          i => col("__hex").substr(i * frameChars + 1, lit(frameChars)))))
      .toDF("media_id", "frame_no", "frame_hex")
      .filter(pmod(col("frame_no"), lit(stride)) === 0)
      .select(col("media_id"), col("frame_no").cast("long").as("frame_no"),
        col("frame_hex"))
}
