package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq((1L, "hello world", "srcA"), (2L, "xyz", "srcB"))
    .toDF("doc_id", "text", "source")

  test("asMedia wraps payloads as binary + typed metadata") {
    val m = Multimodal.asMedia(docs, "doc_id", "text", "source")
    assert(m.schema.fieldNames.toSeq == Seq("media_id", "bytes", "meta"))
    val r = m.orderBy("media_id").head()
    assert(new String(r.getAs[Array[Byte]]("bytes"), "UTF-8") == "hello world")
    assert(r.getStruct(2).getString(1) == "srcA")
  }

  test("extractFeatures runs the batched stub decode with real schema") {
    val f = Multimodal.extractFeatures(
      Multimodal.asMedia(docs, "doc_id", "text", "source"))
    val rows = f.orderBy("media_id").collect()
    assert(rows.length == 2)
    val r = rows.head
    assert(r.getLong(1) == 11L) // "hello world" bytes
    assert(r.getString(2) == "68656c6c") // 'hell' in hex
    assert(r.getSeq[Float](5).length == 8)
    // determinism: same input → same features
    val again = Multimodal.extractFeatures(
      Multimodal.asMedia(docs, "doc_id", "text", "source"))
      .orderBy("media_id").collect()
    assert(again.head.getSeq[Float](5) == r.getSeq[Float](5))
  }

  test("sampleFrames explodes hex windows with stride") {
    val media = Multimodal.asMedia(docs, "doc_id", "text", "source")
    val frames = Multimodal.sampleFrames(media, frameChars = 4, stride = 2)
    assert(frames.columns.toSeq == Seq("media_id", "frame_no", "frame_hex"))
    // "hello world" = 11 bytes = 22 hex chars = 6 windows of 4 (last
    // short); stride 2 keeps frames 0, 2, 4
    val f1 = frames.filter($"media_id" === 1L).orderBy("frame_no").collect()
    assert(f1.map(_.getLong(1)).toSeq == Seq(0L, 2L, 4L))
    assert(f1.map(_.getString(2)).toSeq == Seq("6865", "6f20", "726c"))
    // "xyz" = 6 hex chars = exactly 2 windows of 4? no: 2 windows (4+2)
    val f2 = frames.filter($"media_id" === 2L).orderBy("frame_no").collect()
    assert(f2.map(_.getString(2)).toSeq == Seq("78797a".take(4)))
  }
}
