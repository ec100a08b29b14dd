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

  test("extractFeatures runs the batched decode with real schema") {
    val f = Multimodal.extractFeatures(
      Multimodal.asMedia(docs, "doc_id", "text", "source"))
    val rows = f.orderBy("media_id").collect()
    assert(rows.length == 2)
    val r = rows.head
    assert(r.getLong(1) == 11L) // "hello world" bytes
    assert(r.getString(2) == "68656c6c") // 'hell' in hex
    // text payloads are no recognized container: dims/mime stay null,
    // they are not faked
    assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
    assert(r.getSeq[Float](7).length == 8)
    // determinism: same input → same features
    val again = Multimodal.extractFeatures(
      Multimodal.asMedia(docs, "doc_id", "text", "source"))
      .orderBy("media_id").collect()
    assert(again.head.getSeq[Float](7) == r.getSeq[Float](7))
  }

  // -- real fixture bytes, built from the formats' public layouts --

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val sig = Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)
    val ihdr = Array[Byte](0, 0, 0, 13) ++ "IHDR".getBytes ++
      Array((w >> 24).toByte, (w >> 16).toByte, (w >> 8).toByte, w.toByte,
        (h >> 24).toByte, (h >> 16).toByte, (h >> 8).toByte, h.toByte)
    sig ++ ihdr
  }

  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val soi = Array(0xff, 0xd8).map(_.toByte)
    // APP0 before the frame header: the walker must skip it by length
    val app0 = Array(0xff, 0xe0, 0x00, 0x10).map(_.toByte) ++
      "JFIF".getBytes ++ new Array[Byte](10)
    val sof0 = Array(0xff, 0xc0, 0x00, 0x11, 0x08,
      (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff).map(_.toByte) ++
      new Array[Byte](10)
    soi ++ app0 ++ sof0
  }

  private def wavBytes(byteRate: Int, dataSize: Int): Array[Byte] = {
    def le32(v: Int) = Array(v, v >> 8, v >> 16, v >> 24).map(_.toByte)
    def le16(v: Int) = Array(v, v >> 8).map(_.toByte)
    "RIFF".getBytes ++ le32(36 + dataSize) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(8000) ++ le32(byteRate) ++
      le16(2) ++ le16(16) ++
      "data".getBytes ++ le32(dataSize) // payload truncated: header-only
  }

  test("sniff reads real PNG/JPEG/GIF/BMP dims and WAV duration") {
    assert(Multimodal.sniff(pngBytes(640, 480)) ==
      Multimodal.MediaInfo("image/png", 640, 480))
    assert(Multimodal.sniff(jpegBytes(1920, 1080)) ==
      Multimodal.MediaInfo("image/jpeg", 1920, 1080))
    val gif = "GIF89a".getBytes ++
      Array[Byte](0x40, 0x01, 0xf0.toByte, 0x00, 0, 0) // 320 x 240 LE
    assert(Multimodal.sniff(gif) == Multimodal.MediaInfo("image/gif", 320, 240))
    val bmp = "BM".getBytes ++ new Array[Byte](16) ++
      Array[Byte](100, 0, 0, 0) ++
      Array[Byte](56, -1, -1, -1) ++ // height -200 LE: top-down rows
      new Array[Byte](4)
    assert(Multimodal.sniff(bmp) == Multimodal.MediaInfo("image/bmp", 100, 200))
    // 32000 data bytes at 16000 B/s = 2 s
    assert(Multimodal.sniff(wavBytes(16000, 32000)) ==
      Multimodal.MediaInfo("audio/wav", durationMs = 2000L))
    assert(Multimodal.sniff("not a container".getBytes) ==
      Multimodal.MediaInfo())
  }

  test("decode surfaces sniffed dims through the frame") {
    val media = Seq((7L, pngBytes(32, 16)), (8L, wavBytes(16000, 48000)))
      .toDF("media_id", "bytes")
      .withColumn("meta", struct(lit("x").as("mime"), lit("y").as("source")))
    val out = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    assert(out(0).getAs[Int]("width") == 32 &&
      out(0).getAs[Int]("height") == 16 &&
      out(0).getAs[String]("mime") == "image/png")
    assert(out(1).getAs[Long]("duration_ms") == 3000L &&
      out(1).getAs[String]("mime") == "audio/wav")
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

  test("frameNearDupPairs: shared frames pair media; threshold filters") {
    import spark.implicits._
    // 10 and 11 share a long aligned prefix (3 sampled 8-byte frames);
    // 12 shares only the first frame with them; 13 is disjoint
    val common = "0123456789abcdefghijklmnopqrstuv" // 32 bytes = 2 DISTINCT 16-byte frames
    val m = Multimodal.asMedia(Seq(
      (10L, common + "AAAAAAAAAAAAAAAA", "s"),
      (11L, common + "BBBBBBBBBBBBBBBB", "s"),
      (12L, common.take(16) + "CCCCCCCCCCCCCCCCCCCCCCCCCCCCCCCC", "s"),
      (13L, "entirely different payload bytes", "s"))
      .toDF("doc_id", "text", "source"), "doc_id", "text", "source")
    // frameChars 32 = 16-byte windows; stride 1 samples every window
    val pairs = Multimodal.frameNearDupPairs(m, frameChars = 32, stride = 1,
        minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // only (10, 11): frames 0 and 1 match; 12 shares just one with them
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((10L, 11L)))
    assert(pairs.head._3 == 2L && pairs.head._4 == 0.666667) // 2/3 @ 6 dp
  }

  test("frameNearDupPairs: maxDf drops boilerplate frames but keeps " +
      "the containment denominator whole") {
    import spark.implicits._
    // frames: B = boilerplate (in ALL four media), u1/u2 = genuinely
    // shared by 20/21 only; frameChars 32 / stride 1 → 16-byte windows
    val boiler = "BBBBBBBBBBBBBBBB"
    val u1 = "1111111111111111"; val u2 = "2222222222222222"
    val m = Multimodal.asMedia(Seq(
      (20L, boiler + u1 + u2, "s"),
      (21L, boiler + u1 + u2, "s"),
      (22L, boiler + "CCCCCCCCCCCCCCCC", "s"),
      (23L, boiler + "DDDDDDDDDDDDDDDD", "s"))
      .toDF("doc_id", "text", "source"), "doc_id", "text", "source")
    def run(maxDf: Int) = Multimodal.frameNearDupPairs(m, frameChars = 32,
        stride = 1, minShared = 2, maxDf = maxDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(p => (p._1, p._2))
    // unbounded: (20,21) share 3 frames (B,u1,u2) → containment 1.0
    assert(run(Int.MaxValue).toSeq ==
      Seq((20L, 21L, 3L, 1.0)))
    // maxDf = 3 cuts B (df = 4): (20,21) keep u1+u2 = 2 shared, but
    // nf stays 3 (pre-cut) → containment 2/3; boilerplate-only pairs
    // (22, 23 vs anyone) never appear
    assert(run(3).toSeq == Seq((20L, 21L, 2L, 0.666667)))
  }

  test("frameStats: dup ratio flags the static media item") {
    import spark.implicits._
    // media 1 repeats one frame 4x (dup_ppm 750000); media 2 all-distinct
    val frames = Seq(
      (1L, 0L, "aa"), (1L, 1L, "aa"), (1L, 2L, "aa"), (1L, 3L, "aa"),
      (2L, 0L, "bb"), (2L, 1L, "cc"))
      .toDF("media_id", "frame_no", "frame_hex")
    val got = Multimodal.frameStats(frames).orderBy("media_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 4L, 1L, 750000L), (2L, 2L, 2L, 0L)))
  }

  test("perceptualDupPairs: a bit-jittered re-encode still pairs; " +
      "unrelated media do not") {
    import spark.implicits._
    // payloads with SIGNAL STRUCTURE (a triangle wave over printable
    // bytes — the stand-in for an image's luminance profile): the
    // pooled-grid hash keys on that structure, which is exactly what
    // survives a re-encode. Flat payloads (uniform text) have
    // near-tied cells everywhere and only carry the guaranteed
    // single-byte-substitution bound — see the jitter case below.
    def wave(n: Int, periods: Double, phase: Double): String = {
      val sb = new StringBuilder
      (0 until n).foreach { i =>
        val t = (i.toDouble / n * periods + phase) % 1.0
        val v = if (t < 0.5) 2 * t else 2 * (1 - t)
        sb.append((33 + (v * 93).toInt).toChar)
      }
      sb.toString
    }
    val payload = wave(2400, 4, 0)
    // bit-jitter: ONE byte changed mid-payload (what a transmission
    // flip does) — an exact content hash scatters, the dHash moves at
    // most 2 bits (guaranteed: one cell's sum)
    val jitter = payload.updated(payload.length / 2, 'x')
    // trailing padding (re-encode metadata): every pooling boundary
    // drifts by < 1 byte of a ~36-byte cell — the structure's bits
    // stay put
    val padded = payload + "!"
    val other = wave(2400, 5, 0.37)
    val media = Multimodal.asMedia(
      Seq((1L, payload, "s"), (2L, jitter, "s"), (3L, other, "s"),
        (4L, padded, "s")).toDF("id", "text", "src"),
      "id", "text", "src")
    val pairs = Multimodal.perceptualDupPairs(media, maxDist = 3)
      .as[(Long, Long, Int)].collect().toSeq.sortBy(p => (p._1, p._2))
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    assert(pairSet.contains((1L, 2L)), s"jittered copy must pair: $pairs")
    assert(pairs.find(p => p._1 == 1L && p._2 == 2L).get._3 <= 2)
    assert(pairSet.contains((1L, 4L)), s"padded copy must pair: $pairs")
    assert(!pairSet.contains((1L, 3L)) && !pairSet.contains((2L, 3L)),
      s"unrelated media must not pair: $pairs")
    // exact content hashes CANNOT pair the jittered copy (the gap
    // this operator closes): whole-payload hash60s differ
    val exact = media.select(
        graft.operators.TextOps.hash60(col("bytes").cast("string")))
      .as[Long].collect()
    assert(exact.distinct.length == 4)
  }

  test("perceptualHashes: empty and null payloads drop") {
    import spark.implicits._
    val media = Multimodal.asMedia(
      Seq((1L, "", "s"), (3L, "some real content here", "s"))
        .toDF("id", "text", "src"), "id", "text", "src")
      .unionByName(Seq((2L, null.asInstanceOf[Array[Byte]]))
        .toDF("media_id", "bytes")
        .select(col("media_id"), col("bytes"),
          struct(lit("m").as("mime"), lit("s").as("source")).as("meta")))
    val ph = Multimodal.perceptualHashes(media).collect()
    assert(ph.map(_.getLong(0)).toSet == Set(3L))
  }
}
