package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: media (image/audio/video) travels as an
 * opaque `binary` column plus a typed metadata struct; decode /
 * feature-extraction runs batched per partition so a real decoder
 * would amortize model/codec setup per-batch, exactly like a Pandas-
 * UDF/`mapInPandas` pipeline does in Python.
 *
 * Container sniffing and dimension/duration extraction are REAL
 * header parsers for the public formats (PNG, JPEG, GIF, BMP, WAV) —
 * no native codec needed to read an IHDR or a RIFF chunk list. Only
 * the `feature` embedding vector remains a deterministic byte-hash
 * STAND-IN (this environment ships no image/audio models); swap
 * [[Multimodal.pseudoFeature]] for a JNI/ONNX call and nothing else
 * changes.
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
    StructField("mime", StringType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = true)))

  /** Wrap a text/id frame as a media frame (bytes = utf-8 of the text
   * stands in for real image/audio payloads). */
  def asMedia(df: DataFrame, id: String, payload: String, source: String): DataFrame =
    df.select(col(id).cast(LongType).as("media_id"),
      encode(col(payload), "UTF-8").as("bytes"),
      struct(lit("application/octet-stream").as("mime"),
        col(source).as("source")).as("meta"))

  /** Sniffed container facts: detected mime, pixel dims for images,
   * duration for audio. All-null for unrecognized payloads. */
  private[operators] final case class MediaInfo(
      mime: String = null, width: Integer = null, height: Integer = null,
      durationMs: java.lang.Long = null)

  private def beU16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def beU32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def leU16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def leU32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def ascii(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length &&
      s.indices.forall(j => (b(i + j) & 0xff) == s.charAt(j))

  /** REAL container sniffing from header bytes — the public formats'
   * own layouts, no codec libraries:
   *  - PNG: 8-byte signature, then the IHDR chunk's big-endian
   *    width/height (PNG spec §11.2.2).
   *  - JPEG: walk FF-marker segments to the first SOFn (C0-CF minus
   *    C4/C8/CC); frame height/width are big-endian at +5/+7
   *    (ITU T.81 §B.2.2).
   *  - GIF: "GIF87a"/"GIF89a", little-endian logical-screen dims.
   *  - BMP: "BM", BITMAPINFOHEADER little-endian dims (height may be
   *    negative for top-down rows — absolute value).
   *  - WAV: RIFF/WAVE chunk walk; duration = data-chunk bytes over
   *    the fmt chunk's byte rate.
   * Unknown containers (including this repo's text stand-in payloads)
   * sniff to all-null, they do not fake dimensions. */
  private[operators] def sniff(b: Array[Byte]): MediaInfo = {
    val n = b.length
    if (n >= 24 && (b(0) & 0xff) == 0x89 && ascii(b, 1, "PNG") &&
        ascii(b, 12, "IHDR"))
      MediaInfo("image/png", beU32(b, 16).toInt, beU32(b, 20).toInt)
    else if (n >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      var out = MediaInfo("image/jpeg")
      while (out.width == null && i + 3 < n) {
        if ((b(i) & 0xff) != 0xff) i = n // desync: stop, keep mime only
        else {
          var j = i
          while (j + 1 < n && (b(j + 1) & 0xff) == 0xff) j += 1 // fill bytes
          val m = if (j + 1 < n) b(j + 1) & 0xff else 0
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
            if (j + 8 < n)
              out = MediaInfo("image/jpeg", beU16(b, j + 7), beU16(b, j + 5))
            i = n
          } else if (m == 0xd8 || m == 0xd9 || m == 0x01 ||
              (m >= 0xd0 && m <= 0xd7)) {
            i = j + 2 // standalone marker, no length field
          } else if (j + 3 < n) {
            i = j + 2 + beU16(b, j + 2) // segment length includes itself
          } else i = n
        }
      }
      out
    } else if (n >= 10 && (ascii(b, 0, "GIF87a") || ascii(b, 0, "GIF89a")))
      MediaInfo("image/gif", leU16(b, 6), leU16(b, 8))
    else if (n >= 26 && ascii(b, 0, "BM"))
      MediaInfo("image/bmp", leU32(b, 18).toInt,
        math.abs(leU32(b, 22).toInt))
    else if (n >= 12 && ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE")) {
      var i = 12
      var byteRate = 0L
      var dataBytes = -1L
      while (i + 8 <= n) {
        val size = leU32(b, i + 4)
        if (ascii(b, i, "fmt ") && i + 16 <= n) byteRate = leU32(b, i + 8 + 8)
        else if (ascii(b, i, "data")) dataBytes = size
        // a size past the buffer (truncated or malformed file) ends the
        // walk — never let the cursor wrap
        if (size > n - i - 8) i = n
        else i += 8 + size.toInt + (size.toInt & 1) // chunks word-align
      }
      if (byteRate > 0 && dataBytes >= 0)
        MediaInfo("audio/wav", durationMs = dataBytes * 1000L / byteRate)
      else MediaInfo("audio/wav")
    } else MediaInfo()
  }

  /** Deterministic byte-hash STAND-IN for a real embedding model —
   * the one remaining stub (this environment ships no image/audio
   * models). Swap for a JNI/ONNX call; the batch shape is the
   * contract. */
  private[operators] def pseudoFeature(bytes: Array[Byte]): Array[Float] = {
    var acc = 1469598103934665603L // FNV-64 offset basis
    val feat = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      acc = (acc ^ (bytes(i) & 0xffL)) * 1099511628211L
      feat(i % 8) += ((acc >>> 40) & 0xffff).toFloat / 65536f
      i += 1
    }
    feat
  }

  private[operators] def decode(id: Long, bytes: Array[Byte]): Row = {
    val n = bytes.length
    val header = bytes.take(4).map(b => f"${b & 0xff}%02x").mkString
    val info = sniff(bytes)
    Row(id, n.toLong, header, info.width, info.height, info.mime,
      info.durationMs, pseudoFeature(bytes).toSeq)
  }

  /** Batched decode/feature-extract: one pass per partition, rows
   * processed in deterministic order within the partition. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "bytes").rdd.mapPartitions { it =>
      // per-batch setup would open the codec/model exactly here
      it.map { r =>
        // null payload → null features (a decoder has nothing to say)
        if (r.isNullAt(1))
          Row(r.getLong(0), null, null, null, null, null, null, null)
        else decode(r.getLong(0), r.getAs[Array[Byte]](1))
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /**
   * Media near-duplicate pairs by SHARED SAMPLED FRAMES — the
   * fingerprint-frame construction video dedup uses (sample frames,
   * hash each, pair media that share ≥ `minShared` frame hashes;
   * containment = shared / min(frame counts) grades the overlap).
   * Catches re-encodes-with-trims and clipped copies that a
   * whole-payload hash misses. Frames come from [[sampleFrames]];
   * with a real decoder the hash input would be the decoded
   * thumbnail — the plumbing is identical.
   *
   * Scale shape: frame hashes are 8-byte longs; the self-join is
   * equi-keyed on the hash (each distinct frame is its own bucket —
   * no all-pairs stage), and the pair rollup is a map-side-combined
   * count. `maxDf` BOUNDS the bucket: a frame hash present in more
   * than `maxDf` media is dropped from the pair join — a black frame
   * or silence window shared by thousands of unrelated media is
   * boilerplate, not a duplication signal, and its bucket is the one
   * quadratic term in the plan (per-bucket work ≤ maxDf², exactly
   * the df-cut an inverted-index near-dup search applies). Size it
   * ABOVE the expected true-duplicate multiplicity so genuine copy
   * cliques keep their frames. Per-media frame counts (`nf`, the
   * containment denominator) stay PRE-cut: containment grades shared
   * distinctive frames against the whole media, and two media
   * sharing only boilerplate emit no pair at all. The cut is an
   * ANTI-JOIN against the materialized HOT-hash set — which holds at
   * most |frame rows|/maxDf entries by construction, so it stays
   * broadcast-sized (AQE picks the broadcast) instead of sorting the
   * whole frame table under a window count.
   */
  def frameNearDupPairs(media: DataFrame, frameChars: Int, stride: Int,
      minShared: Long = 2, maxDf: Int = Int.MaxValue): DataFrame = {
    require(minShared >= 1, "minShared must be >= 1")
    require(maxDf >= 1, "maxDf must be >= 1")
    val fh = sampleFrames(media, frameChars, stride)
      .select(col("media_id"), TextOps.hash60(col("frame_hex")).as("fh"))
      .distinct()
      .localCheckpoint() // consumed by both join sides + the counts
    val nf = fh.groupBy(col("media_id")).agg(count(lit(1)).as("nf"))
    val joinable =
      if (maxDf == Int.MaxValue) fh
      else {
        val hot = fh.groupBy(col("fh")).agg(count(lit(1)).as("__df"))
          .filter(col("__df") > maxDf).select(col("fh"))
          .localCheckpoint() // tiny; consumed by both join sides
        fh.join(hot, Seq("fh"), "left_anti")
      }
    joinable.alias("a")
      .join(joinable.alias("b"),
        col("a.fh") === col("b.fh") && col("a.media_id") < col("b.media_id"))
      .groupBy(col("a.media_id").as("id1"), col("b.media_id").as("id2"))
      .agg(count(lit(1)).as("shared_frames"))
      .filter(col("shared_frames") >= minShared)
      .join(nf.select(col("media_id").as("id1"), col("nf").as("nf1")), "id1")
      .join(nf.select(col("media_id").as("id2"), col("nf").as("nf2")), "id2")
      .select(col("id1"), col("id2"), col("shared_frames"),
        // integer-ratio emit: engines' round(double, 6) conventions
        // diverge exactly at the 5e-7 ties an int ratio routinely hits
        graft.functions.ratio6(col("shared_frames"),
          least(col("nf1"), col("nf2"))).as("containment"))
  }

  /** Per-media 60-bit PERCEPTUAL hash
   * ([[graft.functions.DHash60Expr]]): average-pooled 6×11 grid over
   * the payload bytes, horizontal-difference bits — the dHash
   * construction, integer-exact. Null/empty payloads drop. */
  def perceptualHashes(media: DataFrame): DataFrame =
    media.select(col("media_id"),
        graft.functions.DHash60Expr.dhash60(col("bytes")).as("phash"))
      .filter(col("phash").isNotNull)

  /**
   * Perceptual near-duplicate media pairs — the RE-ENCODE detector
   * [[frameNearDupPairs]]' exact content hashes cannot be: a
   * resized/re-encoded/bit-jittered payload lands within a few dHash
   * bits of its source (one perturbed byte flips ≤ 2 bits — the
   * [[graft.functions.DHash60Expr]] argument), so near-identical
   * media pair at `hamming ≤ maxDist` where any md5-style hash
   * scatters. Blocking is [[Dedup.simhashPairs]]' 15-bit × 4-band
   * scheme verbatim (pigeonhole: recall guaranteed for maxDist ≤ 3);
   * pairs are generated inside (band, key) buckets after one
   * group-by shuffle — never an all-pairs join. Hamming is exact
   * (`bit_count(xor)`), so the oracle can mirror the whole
   * construction including every hash bit.
   */
  def perceptualDupPairs(media: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3,
      "4-band blocking guarantees recall only to hamming 3")
    val ph = perceptualHashes(media)
    val banded = ph.select(col("media_id"), col("phash"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("phash"), b * 15).bitwiseAND(lit(0x7fffL))): _*)))
      .toDF("media_id", "phash", "band", "key")
    val buckets = banded.groupBy(col("band"), col("key"))
      .agg(array_sort(collect_list(struct(col("media_id"), col("phash"))))
        .as("ids"))
      .filter(size(col("ids")) > 1)
    // the Dedup.explodedPairs shape: stream pairs out of each bucket
    buckets
      .select(col("ids"), posexplode(col("ids")))
      .toDF("ids", "i", "m1")
      .select(col("m1"),
        explode(slice(col("ids"), col("i") + lit(2),
          size(col("ids")) - col("i") - 1)).as("m2"))
      .select(col("m1.media_id").as("id1"), col("m2.media_id").as("id2"),
        bit_count(col("m1.phash").bitwiseXOR(col("m2.phash")))
          .as("hamming"))
      .filter(col("id1") =!= col("id2"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Frame sampling stub for video-shaped payloads: every `stride`-th
   * fixed-size window of the hex-encoded byte stream becomes one
   * "frame" row — the explode/partition plumbing a real frame sampler
   * needs. Windows are explicit substrings (a `\G`-lookbehind split
   * chunker silently fails to split under Spark's regex split, and
   * Spark's base64 is MIME-chunked with CRLFs — hex is stable across
   * engines). Empty payloads yield no frames; the last window may be
   * short. `frameChars` counts hex chars, i.e. frameChars/2 bytes. */
  /**
   * Per-media frame statistics — the "static/looping video" and
   * "padded junk" detector a media-curation pass runs right after
   * [[sampleFrames]]: how many sampled frames, how many DISTINCT
   * (by content hash), and the duplicate ratio as integer ppm
   * (truncating divide — rounding-free). A media item whose frames
   * are mostly one repeated frame (`dup_ppm` near 10⁶) is a station
   * logo, a stalled encode, or black padding; drop before expensive
   * downstream decode. Scale shape: one map-side pre-dedup of
   * (media, frame-hash) then one rollup — nothing unbounded, hashes
   * are 8-byte longs, not the hex payloads.
   */
  def frameStats(frames: DataFrame): DataFrame = {
    val n = frames.groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"))
    val d = frames
      .select(col("media_id"), TextOps.hash60(col("frame_hex")).as("__h"))
      .distinct()
      .groupBy(col("media_id")).agg(count(lit(1)).as("n_distinct"))
    n.join(d, "media_id")
      .withColumn("dup_ppm", graft.functions.ldiv(
        (col("n_frames") - col("n_distinct")) * lit(1000000L),
        col("n_frames")))
  }

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
