package graft.streaming

import graft.SparkSpec
import graft.operators.SeriesEngine.SeriesQuery
import graft.sources.SeriesStore
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import java.nio.file.Files

class SeriesStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming ingest lands batches; query matches batch semantics (S1-S3)") {
    val inDir = Files.createTempDirectory("graft-stream-in").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    val store = new SeriesStore(spark,
      Files.createTempDirectory("graft-stream-store").toString)

    // stage two "arrivals" of documents as parquet files
    val b = 1346189040L
    (0 until 6).map(i => ((b + i * 10) * 1000000000L, s"""{"v": ${i * 10}}"""))
      .toDF("ts", "doc").write.parquet(s"$inDir/batch0")

    val schema = StructType(Seq(
      StructField("ts", LongType), StructField("doc", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$inDir/*")
    val q = SeriesStream.ingest(store, "ev", stream, ckpt,
      trigger = Trigger.AvailableNow())
    q.awaitTermination(120000)

    assert(store.info("ev").docCount == 6)
    val rows = store.query("ev",
      SeriesQuery(60000, Seq("/v", "/v"), Seq("sum", "count"), names = Seq("s", "n")))
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq ==
      Seq((1346189040000L, 150.0, 6L)))

    // late data: a second streaming run with an old timestamp lands at
    // its key and is visible to subsequent queries (no watermark drop)
    Seq(((b + 5) * 1000000000L, """{"v": 1000}"""))
      .toDF("ts", "doc").write.parquet(s"$inDir/batch1")
    val q2 = SeriesStream.ingest(store, "ev", spark.readStream.schema(schema)
      .parquet(s"$inDir/*"), ckpt, trigger = Trigger.AvailableNow())
    q2.awaitTermination(120000)
    assert(store.info("ev").docCount == 7)
    val rows2 = store.query("ev",
      SeriesQuery(60000, Seq("/v"), Seq("sum"), names = Seq("s"))).collect()
    assert(rows2.head.getDouble(1) == 1150.0)
  }

  test("streaming bucketed aggregation: watermarked windows finalize in append mode") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.SeriesEngine
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val b = 1346189040L // divisible by the 10 s bucket
    val out = SeriesEngine.streamingQuery(mem.toDF().toDF("ts", "doc"),
      SeriesQuery(10000, Seq("/v", "/v"), Seq("sum", "count"),
        names = Seq("s", "n")),
      watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("sq")
      .outputMode("append").start()
    try {
      mem.addData(
        (b * 1000000000L, """{"v": "3"}"""),
        ((b + 4) * 1000000000L, """{"v": "4"}"""))
      q.processAllAvailable()
      // bucket not final until the watermark passes its end
      assert(spark.table("sq").count() == 0)
      mem.addData(((b + 60) * 1000000000L, """{"v": "9"}"""))
      q.processAllAvailable()
      val rows = spark.table("sq").collect()
      assert(rows.map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq ==
        Seq((b * 1000, 7.0, 2L)))
    } finally q.stop()
  }

  test("streaming hopping windows: overlap fan-out, watermark " +
      "finalization, batch-identical rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val base = 1346189040000L // on the 1 s slide grid
    def ts(ms: Long) = new java.sql.Timestamp(base + ms)
    val out = SeriesStream.hoppingAgg(
      mem.toDF().toDF("ts", "k", "v"), "ts", "v",
      windowMs = 2000L, slideMs = 1000L, keyCols = Seq("k"),
      watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("hop")
      .outputMode("append").start()
    try {
      mem.addData((ts(500), "a", 1.0), (ts(1500), "a", 2.0))
      q.processAllAvailable()
      // advance the watermark far past every open window
      mem.addData((ts(60000), "a", 9.0))
      q.processAllAvailable()
      val rows = spark.table("hop")
        .filter(col("window_ms") < base + 10000)
        .orderBy("window_ms").collect()
        .map(r => (r.getLong(1) - base, r.getLong(2), r.getDouble(3)))
      // event@500 covers windows −1000 and 0; event@1500 covers 0 and
      // 1000 — exactly the batch operator's fan-out
      assert(rows.toSeq == Seq((-1000L, 1L, 1.0), (0L, 2L, 3.0),
        (1000L, 1L, 2.0)))
      // batch operator over the same events emits the same rows
      val batch = graft.operators.SeriesStats.hopping(
        Seq((base + 500) * 1000000L -> 1.0, (base + 1500) * 1000000L -> 2.0)
          .toDF("ts_ns", "v"), col("ts_ns"), col("v"), 2000L, 1000L)
        .orderBy("window_ms").collect()
        .map(r => (r.getLong(0) - base, r.getLong(1), r.getDouble(2)))
      assert(batch.toSeq == rows.toSeq)
    } finally q.stop()
  }

  test("streaming quota: at most k per key per window, window rolls, " +
      "exact across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val base = 1346189040000L // on the 10 s window grid
    def ts(ms: Long) = new java.sql.Timestamp(base + ms)
    val out = SeriesStream.quotaStream(mem.toDF().toDF("ts", "k"),
      "k", "ts", windowMs = 10000L, quota = 2L)
    val q = out.writeStream.format("memory").queryName("quota")
      .outputMode("append").start()
    try {
      mem.addData((ts(0), "a"), (ts(100), "a"), (ts(200), "a"),
        (ts(0), "b"))
      q.processAllAvailable()
      // third 'a' row in the same window exceeds quota=2
      mem.addData((ts(300), "a"))       // still over, new micro-batch
      q.processAllAvailable()
      mem.addData((ts(10000), "a"))     // next window → resets
      q.processAllAvailable()
      val rows = spark.table("quota").orderBy("key", "ts_ms").collect()
        .map(r => (r.getString(0), r.getLong(1) - base, r.getBoolean(2)))
      assert(rows.toSeq == Seq(
        ("a", 0L, true), ("a", 100L, true), ("a", 200L, false),
        ("a", 300L, false), ("a", 10000L, true), ("b", 0L, true)))
    } finally q.stop()
  }

  test("streaming anomaly finalizes a quiet series bit-for-bit with batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val base = 1346189040000L
    def ts(ms: Long) = new java.sql.Timestamp(base + ms)
    // per-series hourly-ish buckets: 'a' has one clear spike; 'b' flat;
    // one null-valued bucket rides along. Fractional values exercise
    // the micro-quantization path.
    // 9 flat-ish points + one spike: a single outlier among n points
    // caps at z = (n-1)/sqrt(n), so n = 10 gives z ≈ 2.85 > 2
    val rowsA = (0 until 9).map(i =>
      i * 3600000L -> (10.0 + (i % 4) * 0.25)) :+ (9 * 3600000L -> 55.5)
    val rowsB = Seq(0L -> 7.0, 3600000L -> 7.0)
    val out = SeriesStream.anomalyStream(mem.toDF().toDF("ts", "k", "v"),
      "k", "ts", "v", threshold = 2.0, quietMs = 3600000L,
      watermark = "6 hours")
    val q = out.writeStream.format("memory").queryName("anom")
      .outputMode("append").start()
    try {
      mem.addData(rowsA.take(3).map { case (m, v) => (ts(m), "a", v) } ++
        rowsB.map { case (m, v) => (ts(m), "b", v) }: _*)
      q.processAllAvailable()
      mem.addData(rowsA.drop(3).map { case (m, v) => (ts(m), "a", v) }: _*)
      q.processAllAvailable()
      // 'a' is still live (watermark hasn't passed its quiet horizon);
      // 'b' may already have finalized — its last bucket is old
      assert(spark.table("anom").filter($"key" === "a").count() == 0)
      // a far-future sentinel pushes the watermark past every series'
      // quiet horizon → everything finalizes
      mem.addData((ts(200000000L), "zz", 1.0))
      q.processAllAvailable()
      val got = spark.table("anom").filter($"key" =!= "zz")
        .select("key", "bucket_ms", "v", "z", "is_anomaly")
        .orderBy("key", "bucket_ms").collect().toSeq
      // the batch reference over the same buckets, micro discipline
      val batch = (rowsA.map { case (m, v) => ("a", base + m, v) } ++
        rowsB.map { case (m, v) => ("b", base + m, v) })
        .toDF("key", "bucket_ms", "v")
      val expect = graft.operators.SeriesStats.anomaly(batch, $"v",
          threshold = 2.0, partitionBy = Seq("key"), quantizeMicro = true)
        .select($"key", $"bucket_ms", $"v", $"z", $"is_anomaly")
        .orderBy("key", "bucket_ms").collect().toSeq
      assert(got == expect)
      assert(got.count(_.getBoolean(4)) == 1) // exactly the spike
    } finally q.stop()
  }

  test("streaming changepoint finalizes the batch cusum walk exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val base = 1346189040000L
    def ts(ms: Long) = new java.sql.Timestamp(base + ms)
    // level shift at bucket 3: 5,5,5 → 20,20,20
    val rows = Seq(0L -> 5.0, 3600000L -> 5.0, 7200000L -> 5.0,
      10800000L -> 20.0, 14400000L -> 20.0, 18000000L -> 20.0)
    val out = SeriesStream.changepointStream(
      mem.toDF().toDF("ts", "k", "v"), "k", "ts", "v",
      quietMs = 3600000L, watermark = "6 hours")
    val q = out.writeStream.format("memory").queryName("cpt")
      .outputMode("append").start()
    try {
      // deliberately out-of-order arrival: finalize must re-sort
      mem.addData(rows.drop(3).map { case (m, v) => (ts(m), "s", v) }: _*)
      q.processAllAvailable()
      mem.addData(rows.take(3).map { case (m, v) => (ts(m), "s", v) }: _*)
      q.processAllAvailable()
      mem.addData((ts(200000000L), "zz", 1.0))
      q.processAllAvailable()
      val got = spark.table("cpt").filter($"key" =!= "zz")
        .select("key", "bucket_ms", "v", "cusum", "is_changepoint")
        .orderBy("bucket_ms").collect().toSeq
      val batch = rows.map { case (m, v) => ("s", base + m, v) }
        .toDF("key", "bucket_ms", "v")
      val expect = graft.operators.SeriesStats.changepoint(batch, $"v",
          partitionBy = Seq("key"))
        .select($"key", $"bucket_ms", $"v", $"cusum", $"is_changepoint")
        .orderBy("bucket_ms").collect().toSeq
      assert(got == expect)
      // the peak (deepest deviation) localizes the shift boundary
      assert(got.count(_.getBoolean(4)) == 1)
      assert(got.filter(_.getBoolean(4)).head.getLong(1) == base + 7200000L)
    } finally q.stop()
  }

  test("streaming exact dedup keeps first arrival per fingerprint") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val out = SeriesStream.dedupExact(
      mem.toDF().toDF("ts", "doc_id", "text"), "text", "ts",
      watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("dd")
      .outputMode("append").start()
    def ts(s: Long) = new java.sql.Timestamp(1346189040000L + s * 1000)
    try {
      mem.addData((ts(0), 0L, "the same doc"), (ts(1), 1L, "another doc"))
      q.processAllAvailable()
      // same fingerprint despite whitespace jitter → dropped, even
      // across micro-batches
      mem.addData((ts(2), 2L, "  the   same doc "), (ts(3), 3L, "third doc"))
      q.processAllAvailable()
      val kept = spark.table("dd").select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(kept == Set(0L, 1L, 3L))
    } finally q.stop()
  }

  test("streaming key dedup: first arrival per canonical URL; nulls pass") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val canon = graft.operators.TextOps.urlParts($"url")
      .toMap.apply("url_canon")
    val out = SeriesStream.dedupByKey(
      mem.toDF().toDF("ts", "doc_id", "url"), canon, "ts",
      watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("urldd")
      .outputMode("append").start()
    def ts(s: Long) = new java.sql.Timestamp(1346189040000L + s * 1000)
    try {
      mem.addData(
        (ts(0), 0L, "https://A.com/x?utm_source=a"),
        (ts(1), 1L, "https://b.com/y"),
        (ts(2), 2L, "not a url"))
      q.processAllAvailable()
      // same canonical URL despite case/tracking-param jitter →
      // dropped across micro-batches; null keys always pass
      mem.addData(
        (ts(3), 3L, "https://a.com/x/"),
        (ts(4), 4L, "also not a url"),
        (ts(5), 5L, "https://c.com/z"))
      q.processAllAvailable()
      val kept = spark.table("urldd").select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(kept == Set(0L, 1L, 2L, 4L, 5L))
    } finally q.stop()
  }

  test("streaming admission filter drops exact AND near corpus dups") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"))
      .toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val admitted = scala.collection.mutable.ArrayBuffer[Long]()
    val q = SeriesStream.admitStream(
      mem.toDF().toDF("doc_id", "text"), corpus, "doc_id", "text",
      checkpoint = java.nio.file.Files
        .createTempDirectory("graft-admit").toString,
      sink = b => admitted.synchronized {
        admitted ++= b.select("doc_id").collect().map(_.getLong(0))
      },
      threshold = 0.5)
    try {
      mem.addData(
        // exact duplicate of the corpus doc (whitespace-normalized)
        (1L, "alpha  beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
        // near duplicate: one word changed out of 12
        (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"),
        // novel
        (3L, "a completely different document about entirely other things"))
      q.processAllAvailable()
      // later micro-batch: still screened against the same corpus
      mem.addData((4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"))
      q.processAllAvailable()
      assert(admitted.toSet == Set(3L))
    } finally q.stop()
  }

  test("self-maintaining admission: the standing index absorbs what it admits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idxPath = Files.createTempDirectory("graft-admit-idx")
      .resolve("index").toString
    val corpusPath = Files.createTempDirectory("graft-admit-corpus").toString
    val docA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docB = "one two three four five six seven eight nine ten eleven twelve"
    val docC = "red orange yellow green blue indigo violet cyan magenta umber ochre teal"
    val mem = MemoryStream[(Long, String)]
    val admitted = scala.collection.mutable.ArrayBuffer[Long]()
    val q = SeriesStream.admitIndexedStream(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      idxPath, corpusPath,
      checkpoint = Files.createTempDirectory("graft-admit-idx-ck").toString,
      sink = b => admitted.synchronized {
        admitted ++= b.select("doc_id").collect().map(_.getLong(0))
      },
      threshold = 0.5)
    try {
      // batch 1: empty standing artifacts → both novel docs admitted
      mem.addData((1L, docA), (2L, docB))
      q.processAllAvailable()
      // batch 2: exact dup of doc 1 and a near dup of doc 2 — both
      // admitted only LAST batch, never part of any seed corpus: the
      // screen must see them because the index absorbed the batch
      mem.addData(
        (3L, docA),
        (4L, docB.replace("twelve", "thirteen")),
        (5L, docC))
      q.processAllAvailable()
      // batch 3: near dup of doc 5 (admitted one batch ago) → blocked
      mem.addData((6L, docC.replace("teal", "plaid")))
      q.processAllAvailable()
      assert(admitted.toSet == Set(1L, 2L, 5L))
      // the standing index equals a from-scratch corpusIndex over the
      // admitted corpus store (band-key SETS — collect_list order is
      // plan-dependent)
      val corpus = spark.read.option("recursiveFileLookup", "true")
        .parquet(corpusPath)
      assert(corpus.select("doc_id").as[Long].collect().toSet ==
        Set(1L, 2L, 5L))
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select(col("doc_id"), col("fp"), col("sz"),
            array_sort(col("bkeys")).cast("string").as("bk"),
            col("idx_params"))
          .collect().map(_.toSeq)
          .sortBy(_.head.asInstanceOf[Long].toString).toSeq
      val standing = spark.read.parquet(idxPath).drop("batch_id")
      val scratch = graft.operators.Dedup.corpusIndex(corpus,
        col("doc_id"), col("text"))
      assert(rows(standing) == rows(scratch))
    } finally q.stop()
  }

  test("standing word histogram equals a from-scratch build; trainers read it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.CorpusStats
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = Files.createTempDirectory("graft-whist")
      .resolve("hist").toString
    val docs = Seq(
      (1L, "low low lower"), (2L, "newest widest low"),
      (3L, "newest newest lowest"), (4L, "widest low newest"))
    val mem = MemoryStream[(Long, String)]
    val q = SeriesStream.wordHistStream(
      mem.toDF().toDF("doc_id", "text"), "text", store,
      Files.createTempDirectory("graft-whist-ck").toString)
    try {
      // out-of-order replay across three micro-batches
      mem.addData(docs(2)); q.processAllAvailable()
      mem.addData(docs(0), docs(3)); q.processAllAvailable()
      mem.addData(docs(1)); q.processAllAvailable()
    } finally q.stop()
    val standing = spark.read.parquet(store).drop("batch_id")
    val batch = CorpusStats.wordTypeHistogram(
      docs.toDF("doc_id", "text"), col("text"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("w").collect().map(_.toSeq).toSeq
    assert(rows(standing) == rows(batch))
    // the whole point: a trainer reads the artifact, no corpus scan
    val fromArtifact = CorpusStats.wordpieceTrainFromHist(standing, 2)
      .orderBy("merge_rank").collect().map(_.toSeq).toSeq
    val fromCorpus = CorpusStats.wordpieceTrain(
        docs.toDF("doc_id", "text"), col("text"), 2)
      .orderBy("merge_rank").collect().map(_.toSeq).toSeq
    assert(fromArtifact == fromCorpus)
  }

  test("standing n-gram counts equal a from-scratch build; the LM reads them") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.CorpusStats
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dirs = (1 to 3).map(n => Files.createTempDirectory("graft-ngram")
      .resolve(s"h$n").toString)
    val docs = Seq(
      (1L, "a b c a b"), (2L, "a b c"), (3L, "b c a b c"))
    val mem = MemoryStream[(Long, String)]
    val qs = (1 to 3).map(n => SeriesStream.ngramHistStream(
      mem.toDF().toDF("doc_id", "text"), "text", n, dirs(n - 1),
      Files.createTempDirectory(s"graft-ngram-ck$n").toString))
    try {
      mem.addData(docs(1)); qs.foreach(_.processAllAvailable())
      mem.addData(docs(0), docs(2)); qs.foreach(_.processAllAvailable())
    } finally qs.foreach(_.stop())
    val batchDf = docs.toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("g").collect().map(_.toSeq).toSeq
    (1 to 3).foreach { n =>
      val standing = spark.read.parquet(dirs(n - 1)).drop("batch_id")
      assert(rows(standing) ==
        rows(CorpusStats.ngramHistogram(batchDf, col("text"), n)),
        s"n=$n standing artifact diverged")
    }
    // scoring off the standing artifacts ≡ scoring from the corpus
    val fromArtifacts = CorpusStats.trigramNllFromHists(batchDf,
        col("doc_id"), col("text"),
        spark.read.parquet(dirs(0)).drop("batch_id"),
        spark.read.parquet(dirs(1)).drop("batch_id"),
        spark.read.parquet(dirs(2)).drop("batch_id"),
        vocabK = 8, bigramK = 8, trigramK = 8)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val direct = CorpusStats.trigramNll(batchDf, col("doc_id"),
        col("text"), vocabK = 8, bigramK = 8, trigramK = 8)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(fromArtifacts == direct)
  }

  test("streaming semantic admission equals the batch PQ screen on a replayed stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val standing = Seq(
      (100L, Array(1f, 0f, 0f, 0f)),
      (101L, Array(0f, 1f, 0f, 0f)),
      (102L, Array(0f, 0f, 1f, 1f))).toDF("vec_id", "embedding")
    val cb = standing // codewords = the standing vectors (K = 3)
    val codes = graft.operators.Similarity.pqEncode(standing, cb, m = 2)
      .localCheckpoint()
    val feed = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), // exact dup of 100 → blocked
      (2L, Array(0.9f, 0.05f, 0f, 0f)), // near 100 → blocked
      (3L, Array(5f, 5f, 5f, 5f)), // far from everything → admitted
      (4L, Array(0f, 1f, 0f, 0f)), // exact dup of 101 → blocked
      (5L, Array(-3f, 0f, 0f, 2f))) // novel → admitted
    val maxD2Micro = 100000L // 0.1 squared-L2
    val mem = MemoryStream[(Long, Array[Float])]
    val admitted = scala.collection.mutable.ArrayBuffer[Long]()
    val q = SeriesStream.admitSemanticStream(
      mem.toDF().toDF("vec_id", "embedding"), codes, cb, m = 2,
      maxD2Micro = maxD2Micro,
      checkpoint = java.nio.file.Files
        .createTempDirectory("graft-admit-sem").toString,
      sink = b => admitted.synchronized {
        admitted ++= b.select("vec_id").collect().map(_.getLong(0))
      })
    try {
      // out-of-order replay across two micro-batches
      mem.addData(feed(3), feed(0), feed(2))
      q.processAllAvailable()
      mem.addData(feed(4), feed(1))
      q.processAllAvailable()
    } finally q.stop()
    val batchVerdict = graft.operators.Similarity.admitSemantic(
      feed.toDF("vec_id", "embedding"), codes, cb, m = 2,
      maxD2Micro = maxD2Micro)
    val batchAdmitted = batchVerdict.filter($"admit")
      .select("vec_id").as[Long].collect().toSet
    assert(admitted.toSet == batchAdmitted)
    assert(batchAdmitted == Set(3L, 5L))
    // empty standing set admits everything (left join null branch)
    val none = graft.operators.Similarity.admitSemantic(
      feed.toDF("vec_id", "embedding"), codes.limit(0), cb, m = 2,
      maxD2Micro = maxD2Micro)
    assert(none.filter($"admit").count() == 5)
  }

  test("streaming ANN index: standing IVF/PQ equal from-scratch builds; " +
      "screening uses the CURRENT index; replay is a no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cents = Seq((0L, Array(1f, 0f, 0f, 0f)), (1L, Array(0f, 0f, 1f, 1f)))
      .toDF("vec_id", "embedding")
    val cb = Seq((0L, Array(1f, 0f, 0f, 0f)), (1L, Array(0f, 1f, 0f, 0f)),
      (2L, Array(0f, 0f, 1f, 1f))).toDF("vec_id", "embedding")
    val root = Files.createTempDirectory("graft-ann-stream")
    val ivfPath = root.resolve("ivf").toString
    val pqPath = root.resolve("pq").toString
    val mem = MemoryStream[(Long, Array[Float])]
    val admitted = scala.collection.mutable.ArrayBuffer[Long]()
    val q = SeriesStream.annIndexStream(
      mem.toDF().toDF("vec_id", "embedding"), cents, cb, m = 2,
      ivfPath, pqPath,
      checkpoint = root.resolve("ck").toString,
      sink = b => admitted.synchronized {
        admitted ++= b.select("vec_id").collect().map(_.getLong(0))
      },
      screenMaxD2Micro = Some(100000L))
    try {
      // batch 0: empty standing artifacts → both admitted
      mem.addData((10L, Array(1f, 0f, 0f, 0f)), (11L, Array(0f, 0f, 1f, 1f)))
      q.processAllAvailable()
      // batch 1: 12 duplicates 10 (ingested last batch — the screen
      // must read the CURRENT code artifact) → blocked; 13 novel
      mem.addData((12L, Array(1f, 0f, 0f, 0f)), (13L, Array(0f, 1f, 0f, 0f)))
      q.processAllAvailable()
      // batch 2: 14 duplicates 13 (admitted ONE batch ago) → blocked
      mem.addData((14L, Array(0f, 1f, 0f, 0f)))
      q.processAllAvailable()
    } finally q.stop()
    assert(admitted.toSet == Set(10L, 11L, 13L), admitted.toSeq.toString)
    val corpus = Seq((10L, Array(1f, 0f, 0f, 0f)),
      (11L, Array(0f, 0f, 1f, 1f)), (13L, Array(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.head).toSeq
    val ivfStanding = spark.read.parquet(ivfPath).drop("batch_id")
    val pqStanding = spark.read.parquet(pqPath).drop("batch_id")
    assert(rows(ivfStanding) ==
      rows(graft.operators.Similarity.ivfIndex(corpus, cents)))
    assert(rows(pqStanding) ==
      rows(graft.operators.Similarity.pqEncode(corpus, cb, m = 2)))
    // re-delivered batch id: the durable markers skip both folds —
    // artifacts unchanged even with a would-be-novel payload
    SeriesStream.annIndexBatch(
      Seq((99L, Array(9f, 9f, 9f, 9f))).toDF("vec_id", "embedding"),
      cents, cb, m = 2, ivfPath, pqPath, batchId = 1L,
      sink = _ => fail("replayed batch must not re-fire the sink"),
      screenMaxD2Micro = Some(100000L))
    assert(rows(spark.read.parquet(ivfPath).drop("batch_id")) ==
      rows(ivfStanding))
    assert(rows(spark.read.parquet(pqPath).drop("batch_id")) ==
      rows(pqStanding))
  }

  test("standing quantile sketch: stream-merged artifact equals the batch build") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rng = new scala.util.Random(7)
    val rows = (0 until 500).map(i =>
      ("g" + (i % 3), rng.nextDouble() * 800 - 100))
    val store = java.nio.file.Files
      .createTempDirectory("graft-qsketch").toString + "/sk"
    val mem = MemoryStream[(String, Double)]
    val q = SeriesStream.quantileSketchStream(
      mem.toDF().toDF("source", "v"), "source", "v", k = 64,
      storePath = store,
      checkpoint = java.nio.file.Files
        .createTempDirectory("graft-qsketch-ck").toString)
    try {
      // arbitrary chopping: 3 uneven micro-batches
      mem.addData(rows.take(100))
      q.processAllAvailable()
      mem.addData(rows.slice(100, 150))
      q.processAllAvailable()
      mem.addData(rows.drop(150))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(store).drop("batch_id")
    val direct = graft.operators.CorpusStats.quantileSketch(
      rows.toDF("source", "v"), $"source", $"v", 64)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("source", "sk_w", "sk_min", "sk_max", "cell", "n")
        .as[(String, Long, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(norm(streamed) == norm(direct)) // the merge homomorphism
    // re-delivered batch id is a no-op (restart replay idempotence)
    SeriesStream.sketchMergeBatch(rows.take(100).toDF("source", "v"),
      "source", "v", 64, store, batchId = 0L)
    assert(norm(spark.read.parquet(store).drop("batch_id")) == norm(direct))
  }

  test("standing eval-gram artifact ≡ batch grams; scoring against it ≡ batch decontamination") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.TextOps
    val bench = (0 until 40).map(i =>
      (i.toLong, (0 until 12).map(j => s"e${(i * 7 + j) % 23}").mkString(" ")))
    val store = java.nio.file.Files
      .createTempDirectory("graft-eg").toString + "/grams"
    val mem = MemoryStream[(Long, String)]
    val q = SeriesStream.evalGramStream(
      mem.toDF().toDF("bid", "text"), "text", n = 4,
      storePath = store,
      checkpoint = java.nio.file.Files
        .createTempDirectory("graft-eg-ck").toString)
    try {
      mem.addData(bench.take(15)); q.processAllAvailable()
      mem.addData(bench.drop(15)); q.processAllAvailable()
    } finally q.stop()
    val benchDf = bench.toDF("bid", "text")
    val standing = spark.read.parquet(store).select("gram")
      .as[String].collect().sorted.toSeq
    val direct = TextOps.evalGrams(benchDf, $"text", 4)
      .as[String].collect().sorted.toSeq
    assert(standing == direct) // distinct-union homomorphism
    // scoring a corpus against the artifact ≡ the batch operator
    val docs = Seq((1L, bench(3)._2 + " tail tail"), (2L, "w1 w2 w3 w4 w5"))
      .toDF("doc_id", "text")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Boolean)].collect().sorted.toSeq
    assert(norm(TextOps.decontaminateFromGrams(docs, $"doc_id", $"text",
        spark.read.parquet(store), n = 4)) ==
      norm(TextOps.decontaminateBloom(docs, $"doc_id", $"text", benchDf,
        $"text", n = 4)))
  }

  test("streaming exact-substring cleaning ≡ batch dedup of everything ingested") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.Dedup
    val p = (1 to 8).map("p" + _).mkString(" ")
    val q = (1 to 8).map("q" + _).mkString(" ")
    // doc order follows batch order (the streaming keep-first premise)
    val corpus = Seq(
      (0L, s"a1 $p a2"), (1L, s"b1 b2 $q"), // batch 1
      (2L, s"$p c1 c2"), (3L, "d1 d2 d3"), // batch 2: repeats p
      (4L, s"$q $p e1")) // batch 3: repeats both
    val store = java.nio.file.Files
      .createTempDirectory("graft-substr").toString + "/gidx"
    val cleaned = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val mem = MemoryStream[(Long, String)]
    val qr = SeriesStream.admitSubstringStream(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", l = 4,
      indexPath = store,
      checkpoint = java.nio.file.Files
        .createTempDirectory("graft-substr-ck").toString,
      sink = df => cleaned.synchronized {
        cleaned ++= df.select("doc_id", "text")
          .as[(Long, String)].collect()
      })
    try {
      mem.addData(corpus.take(2)); qr.processAllAvailable()
      mem.addData(corpus.slice(2, 4)); qr.processAllAvailable()
      mem.addData(corpus.drop(4)); qr.processAllAvailable()
    } finally qr.stop()
    val batchOut = Dedup.exactSubstringDedup(
        corpus.toDF("doc_id", "text"), $"doc_id", $"text", l = 4)
      .select("doc_id", "text").as[(Long, String)].collect().sorted.toSeq
    assert(cleaned.sorted.toSeq == batchOut)
    // the folded index ≡ a from-scratch build of everything ingested
    val standing = spark.read.parquet(store).drop("batch_id")
      .collect().map(_.toString).sorted.toSeq
    val direct = Dedup.gramIndex(corpus.toDF("doc_id", "text"),
        $"doc_id", $"text", l = 4)
      .collect().map(_.toString).sorted.toSeq
    assert(standing == direct)
    // replayed batch id: fold skipped, index unchanged (idempotent)
    SeriesStream.substringAdmitBatch(corpus.take(2).toDF("doc_id", "text"),
      "doc_id", "text", 4, store, batchId = 0L, _ => ())
    assert(spark.read.parquet(store).drop("batch_id")
      .collect().map(_.toString).sorted.toSeq == direct)
  }

  test("streaming mixture executor: standing plan ≡ batch plan; replay admits the batch apply") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.Sampling
    val rng = new scala.util.Random(11)
    // 3 sources with lopsided availability so rates straddle 1.0
    val corpus = (0 until 240).map { i =>
      val src = if (i % 8 < 5) "web" else if (i % 8 < 7) "books" else "code"
      (i.toLong, src, (0 to rng.nextInt(9)).map(j => s"w${i % 17}$j")
        .mkString(" "))
    }
    val weights = Map("web" -> 200000L, "books" -> 300000L,
      "code" -> 500000L)
    val budget = 900L
    val store = java.nio.file.Files
      .createTempDirectory("graft-mix").toString + "/inv"
    val admitted = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long)]
    val mem = MemoryStream[(Long, String, String)]
    val q = SeriesStream.admitMixtureStream(
      mem.toDF().toDF("doc_id", "source", "text"),
      "doc_id", "source", "text", weights, budget,
      storePath = store,
      checkpoint = java.nio.file.Files
        .createTempDirectory("graft-mix-ck").toString,
      sink = df => admitted.synchronized {
        admitted ++= df.select("doc_id", "source", "text", "epoch")
          .as[(Long, String, String, Long)].collect()
      })
    try {
      mem.addData(corpus.take(50))
      q.processAllAvailable()
      mem.addData(corpus.slice(50, 90))
      q.processAllAvailable()
      mem.addData(corpus.drop(90))
      q.processAllAvailable()
    } finally q.stop()
    assert(admitted.nonEmpty)
    val corpusDf = corpus.toDF("doc_id", "source", "text")
    // the standing inventory yields EXACTLY the batch plan
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("source", "avail_tokens", "weight_ppm", "target_tokens",
          "plan_tokens", "rate_ppm", "shortfall_tokens")
        .as[(String, Long, Long, Long, Long, Long, Long)]
        .collect().sorted.toSeq
    val batchPlan = Sampling.mixturePlan(corpusDf, $"source", $"text",
      weights, budget)
    assert(norm(SeriesStream.standingMixturePlan(spark, store, weights,
      budget)) == norm(batchPlan))
    // restart replay: re-deliver every batch id — inventory folds are
    // skipped (idempotent), each batch admits under the now-complete
    // standing plan, so the replayed stream's admitted rows equal the
    // batch apply of the full corpus, row for row and epoch for epoch
    val replayed = Seq(corpus.take(50), corpus.slice(50, 90),
      corpus.drop(90)).zipWithIndex.map { case (b, i) =>
      SeriesStream.mixtureAdmitBatch(b.toDF("doc_id", "source", "text"),
        "doc_id", "source", "text", weights, budget, store, i.toLong)
    }.reduce(_ unionByName _)
    def admits(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "source", "epoch")
        .as[(Long, String, Long)].collect().sorted.toSeq
    val batchApply = Sampling.applyMixture(corpusDf, $"doc_id",
      $"source", batchPlan)
    assert(admits(replayed) == admits(batchApply))
    // the inventory is unchanged by the replay (still the batch avail)
    assert(norm(SeriesStream.standingMixturePlan(spark, store, weights,
      budget)) == norm(batchPlan))
    // per-source admitted token totals ≡ the batch plan's apply
    def totals(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("source")
        .agg(sum(size(graft.operators.TextOps.tokens($"text"))
          .cast("long")).as("t"))
        .as[(String, Long)].collect().sorted.toSeq
    assert(totals(replayed) == totals(batchApply))
  }

  test("pre-r13 int-sid MG artifacts migrate on read (cast to string sid)") {
    import spark.implicits._
    import graft.operators.CorpusStats
    val store = java.nio.file.Files
      .createTempDirectory("graft-mg-mig").toString + "/sk"
    // old-format standing artifact: sid was int (partition id / -1)
    Seq((0, "hot", 40L, 2L), (1, "warm", 9L, 1L), (-1, "hot", 7L, 0L))
      .toDF("sid", "v", "c", "err")
      .withColumn("batch_id", lit(0L))
      .write.parquet(store)
    val batch = (Seq.fill(25)("hot") ++ Seq.fill(6)("cold")).toDF("w")
    SeriesStream.artifactMergeBatch(batch,
      b => CorpusStats.mgSketch(b, $"w", 8),
      u => CorpusStats.mgMerge(u, 8), store, batchId = 1L)
    val out = spark.read.parquet(store)
      .select("v", "c").as[(String, Long)].collect().toMap
    // hot: 40+7 standing + 25 fresh = 72 (within err of exact); the
    // old int sids merged as "0"/"1"/"-1" — disjoint from "p*"/"m"
    assert(out.contains("hot") && out("hot") <= 72 && out("hot") >= 72 - 4)
    assert(spark.read.parquet(store).schema("sid").dataType ==
      org.apache.spark.sql.types.StringType)
  }

  test("takedownStream retires ids from every configured standing artifact") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.{Dedup, Similarity}
    val base = Files.createTempDirectory("graft-takedown").toString
    val (idxPath, ivfPath, pqPath, winPath) =
      (s"$base/idx", s"$base/ivf", s"$base/pq", s"$base/win")
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "some corpus document about distributed query engines"),
      (3L, "a document scheduled for takedown with enough words"),
      (4L, "another takedown target arriving in the second batch"))
      .toDF("doc_id", "text")
    val emb = Seq(
      1L -> Seq(10f, 0f, 0f), 2L -> Seq(9f, 1f, 0f),
      3L -> Seq(0f, 10f, 0f), 4L -> Seq(1f, 9f, 0f))
      .toDF("vec_id", "embedding")
    val cents = emb.filter($"vec_id" === 1L || $"vec_id" === 3L)
    // batch-built artifacts handed to the stream via seedArtifact
    // (marker -1: a bare batch_id=0 seed would alias the stream's
    // first micro-batch and silently skip the first takedown)
    SeriesStream.seedArtifact(
      Dedup.corpusIndex(corpus, col("doc_id"), col("text")), idxPath)
    SeriesStream.seedArtifact(Similarity.ivfIndex(emb, cents), ivfPath)
    SeriesStream.seedArtifact(Similarity.pqEncode(emb, cents, m = 3), pqPath)
    // packed windows with the doc_spans takedown trace (small seqLen
    // so docs straddle windows): windowsTakedown's streaming member
    val toked = corpus.withColumn("toks",
      transform(split($"text", " "),
        (_, i) => $"doc_id" * 100L + i.cast("long")))
    val wins0 = graft.operators.Packing.materializeWindows(
      graft.operators.Packing.packSequences(
        toked, $"doc_id", size($"toks").cast("long"), seqLen = 6L),
      $"doc_id", $"toks", seqLen = 6L)
    SeriesStream.seedArtifact(wins0, winPath)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Long]
    val q = SeriesStream.takedownStream(
      mem.toDF().toDF("doc_id"), "doc_id",
      checkpoint = Files.createTempDirectory("graft-td-ck").toString,
      corpusIndexPath = Some(idxPath), ivfIndexPath = Some(ivfPath),
      pqCodesPath = Some(pqPath), windowsPath = Some(winPath))
    try {
      mem.addData(3L)
      q.processAllAvailable()
      mem.addData(4L, 99L) // 99 never existed: a no-op inside the batch
      q.processAllAvailable()
    } finally q.stop()

    val remainingDocs = corpus.filter(!$"doc_id".isin(3L, 4L))
    val remainingEmb = emb.filter(!$"vec_id".isin(3L, 4L))
    def idxRows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("fp"), col("sz"),
          array_sort(col("bkeys")).cast("string").as("bk"))
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long]).toSeq
    assert(idxRows(spark.read.parquet(idxPath).drop("batch_id")) ==
      idxRows(Dedup.corpusIndex(remainingDocs, col("doc_id"), col("text"))))
    assert(spark.read.parquet(ivfPath).drop("batch_id", "idx_params")
        .orderBy("vec_id").collect().toSeq ==
      Similarity.ivfIndex(remainingEmb, cents).drop("idx_params")
        .orderBy("vec_id").collect().toSeq)
    assert(spark.read.parquet(pqPath).drop("batch_id")
        .orderBy("vec_id").collect().toSeq ==
      Similarity.pqEncode(remainingEmb, cents, m = 3)
        .orderBy("vec_id").collect().toSeq)
    // packed windows ≡ the batch windowsTakedown of the seeded frame
    // with the same ids: survivors byte-identical, intersecting
    // windows gone
    val winAfter = spark.read.parquet(winPath).drop("batch_id")
      .orderBy("seq").collect().toSeq
    val winExpect = graft.operators.Packing.windowsTakedown(wins0,
        Seq(3L, 4L).toDF("doc_id"), col("doc_id"))
      .orderBy("seq").collect().toSeq
    assert(winAfter == winExpect)
    assert(winAfter.size < wins0.count(),
      "fixture must actually drop some windows")
    // replay idempotence: the artifacts recorded batch 1 as their
    // marker; re-delivering batch ids 0/1 must change nothing
    SeriesStream.artifactUpdateBatch(spark, idxPath, 1L,
      _ => sys.error("replayed batch must skip"))
  }

  test("takedownStream skips artifacts that do not exist yet") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = Files.createTempDirectory("graft-takedown-abs").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Long]
    val q = SeriesStream.takedownStream(
      mem.toDF().toDF("doc_id"), "doc_id",
      checkpoint = Files.createTempDirectory("graft-td-ck2").toString,
      corpusIndexPath = Some(s"$base/never-built"))
    try {
      mem.addData(1L)
      q.processAllAvailable() // must not throw, must not create the store
    } finally q.stop()
    assert(!Files.isDirectory(java.nio.file.Paths.get(s"$base/never-built")))
  }

  test("an incompatible artifact migration fails loudly, not silently") {
    import spark.implicits._
    val store = java.nio.file.Files
      .createTempDirectory("graft-badmig").toString + "/sk"
    // standing artifact persisted with string counts that do NOT
    // parse as the fresh build's long type — a silent null-out here
    // would persist a corrupted artifact as the new truth
    Seq(("hot", "forty"), ("cold", "9"))
      .toDF("v", "c").withColumn("batch_id", lit(0L))
      .write.parquet(store)
    val batch = Seq("hot", "hot", "cold").toDF("w")
    val e = intercept[Exception] {
      SeriesStream.artifactMergeBatch(batch,
        b => b.groupBy($"w".as("v")).agg(count(lit(1)).as("c")),
        u => u.groupBy("v").agg(sum("c").as("c")), store, batchId = 1L)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("alignTypes")),
      s"expected the alignTypes guard to fire, got: $e")
    // the standing artifact is untouched (swap never happened)
    assert(spark.read.parquet(store).count() == 2)
  }

  test("empty-artifact batches still commit their batch_id (durable marker)") {
    import spark.implicits._
    val store = java.nio.file.Files
      .createTempDirectory("graft-marker").toString + "/sk"
    var calls = 0
    def emptyUpdate(s: Option[org.apache.spark.sql.DataFrame]) = {
      calls += 1
      Seq.empty[(String, Long)].toDF("k", "v")
    }
    SeriesStream.artifactUpdateBatch(spark, store, 0L, emptyUpdate)
    assert(calls == 1)
    assert(spark.read.parquet(store).drop("batch_id").isEmpty)
    assert(SeriesStream.readBatchMarker(store).contains(0L))
    // re-delivery of batch 0 skips even though the artifact has 0 rows
    // (the row-based guard alone would replay it forever)
    SeriesStream.artifactUpdateBatch(spark, store, 0L, emptyUpdate)
    assert(calls == 1)
    // a NEW batch id proceeds and advances the marker
    SeriesStream.artifactUpdateBatch(spark, store, 1L,
      { s => calls += 1; Seq(("a", 1L)).toDF("k", "v") })
    assert(calls == 2)
    assert(SeriesStream.readBatchMarker(store).contains(1L))
    // pre-marker artifacts (marker file absent) fall back to the
    // row-based guard: delete the marker, re-deliver batch 1 — the
    // surviving rows carry batch_id=1 so it still skips
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(store).resolve("_GRAFT_BATCH_ID"))
    SeriesStream.artifactUpdateBatch(spark, store, 1L, emptyUpdate)
    assert(calls == 2)
  }

  test("standing per-group heavy hitters honor each group's MG contract") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rng = new scala.util.Random(31)
    val rows = (0 until 800).map { i =>
      val g = "g" + (i % 2)
      val v = if (i % 4 == 0) s"$g-hot${i % 3}" else s"$g-t${rng.nextInt(999)}"
      (g, v)
    }
    val store = java.nio.file.Files
      .createTempDirectory("graft-hhby").toString + "/sk"
    val mem = MemoryStream[(String, String)]
    val q = SeriesStream.heavyHittersByStream(
      mem.toDF().toDF("g", "w"), "g", "w", k = 32, storePath = store,
      checkpoint = java.nio.file.Files
        .createTempDirectory("graft-hhby-ck").toString)
    try {
      mem.addData(rows.take(300))
      q.processAllAvailable()
      mem.addData(rows.drop(300))
      q.processAllAvailable()
    } finally q.stop()
    val standing = spark.read.parquet(store)
      .select("g", "v", "c", "err").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    Seq("g0", "g1").foreach { g =>
      val sub = standing.filter(_._1 == g)
      val exact = rows.filter(_._1 == g).map(_._2)
        .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
      val err = if (sub.isEmpty) 0L else sub.map(_._4).max
      sub.foreach { case (_, v, c, _) =>
        if (v != null) {
          val ex = exact.getOrElse(v, 0L)
          assert(c <= ex && ex <= c + err,
            s"group $g deficit broken: $v c=$c err=$err exact=$ex")
        }
      }
      val present = sub.map(_._2).toSet
      exact.foreach { case (v, ex) =>
        if (ex > err) assert(present.contains(v),
          s"group $g coverage broken: $v exact=$ex err=$err")
      }
    }
  }

  test("standing covariance sketch: incremental PCA equals the batch build") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rng = new scala.util.Random(41)
    val rows = (1L to 300L).map(i =>
      (i, Array.fill(4)((rng.nextInt(2001) - 1000) / 1000.0f)))
    val store = java.nio.file.Files
      .createTempDirectory("graft-cov").toString + "/sk"
    val mem = MemoryStream[(Long, Array[Float])]
    val q = SeriesStream.covarianceSketchStream(
      mem.toDF().toDF("vec_id", "embedding"), "embedding", dim = 4,
      storePath = store,
      checkpoint = java.nio.file.Files
        .createTempDirectory("graft-cov-ck").toString)
    try {
      mem.addData(rows.take(120))
      q.processAllAvailable()
      mem.addData(rows.drop(120))
      q.processAllAvailable()
    } finally q.stop()
    import org.apache.spark.sql.functions.col
    val streamed = graft.operators.Embeddings.covarianceFinalize(
        spark.read.parquet(store).drop("batch_id"), scaleBits = 20)
      .orderBy("i", "j").collect().map(_.toSeq).toSeq
    val direct = graft.operators.Embeddings.covarianceMicro(
        rows.toDF("vec_id", "embedding"), col("embedding"), dim = 4)
      .orderBy("i", "j").collect().map(_.toSeq).toSeq
    assert(streamed == direct) // the exact second-moment homomorphism
    // and the PCA read off the standing artifact matches batch PCA
    val vS = graft.operators.Embeddings.pcaPowerMicro(
      graft.operators.Embeddings.covarianceFinalize(
        spark.read.parquet(store).drop("batch_id"), 20), dim = 4)
    val vB = graft.operators.Embeddings.pcaPowerMicro(
      graft.operators.Embeddings.covarianceMicro(
        rows.toDF("vec_id", "embedding"), col("embedding"), 4), dim = 4)
    assert(vS.toSeq == vB.toSeq)
  }

  test("standing logreg: streamed weights equal the hand-folded batch kernel") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val b1 = Seq(
      (1L, "the cat is in the hat and it is you that know", "good"),
      (2L, "@@@### $$$%% ^^^&&& !!!??? ***((( )))[[[", "bad"),
      (3L, "it is the best of the things and you like it", "good"))
    val b2 = Seq(
      (4L, "??!! ##@@ %%^^ &&** (()) {{}} [[]] ;;::", "bad"),
      (5L, "the dog and the fox ran to you in a field", "good"),
      (6L, "", "bad")) // no trainable text: must not move the weights
    val store = java.nio.file.Files
      .createTempDirectory("graft-lr").toString + "/w"
    val mem = MemoryStream[(Long, String, String)]
    val q = SeriesStream.logregStream(
      mem.toDF().toDF("doc_id", "text", "src"), "doc_id", "text",
      "src = 'good'", storePath = store,
      checkpoint = java.nio.file.Files
        .createTempDirectory("graft-lr-ck").toString,
      stepsPerBatch = 2)
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(store)
      .select("j", "w").collect().map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    // the same fold by hand: batch-1 kernel from zeros, batch-2 kernel
    // from batch-1's weights
    import org.apache.spark.sql.functions.{col, expr}
    def feats(rows: Seq[(Long, String, String)]) =
      graft.operators.CorpusStats.logregFeatFrame(
        rows.toDF("doc_id", "text", "src"), col("doc_id"), col("text"),
        expr("src = 'good'"))
    val w1 = graft.operators.CorpusStats.logregSteps(
      feats(b1), Vector.fill(4)(BigInt(0)), iters = 2)
    val w2 = graft.operators.CorpusStats.logregSteps(
      feats(b2), w1, iters = 2)
    assert(streamed == w2.indices.map(j => j -> w2(j).toLong).toMap)
    assert(streamed.values.exists(_ != 0L), "weights never moved")
  }

  test("standing heavy hitters: the streamed artifact honors the MG contract") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rng = new scala.util.Random(29)
    // hot values plus a distinct tail, split across two micro-batches
    val rows = (0 until 900).map(i =>
      if (i % 3 == 0) "hot" + (i % 9) else "tail" + rng.nextInt(5000))
    val store = java.nio.file.Files
      .createTempDirectory("graft-hh").toString + "/sk"
    val mem = MemoryStream[String]
    val q = SeriesStream.heavyHittersStream(
      mem.toDF().toDF("w"), "w", k = 48, storePath = store,
      checkpoint = java.nio.file.Files
        .createTempDirectory("graft-hh-ck").toString)
    try {
      mem.addData(rows.take(400))
      q.processAllAvailable()
      mem.addData(rows.drop(400))
      q.processAllAvailable()
    } finally q.stop()
    val standing = spark.read.parquet(store)
      .select("v", "c", "err").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(standing.length <= 48 + 1) // k rows (+ sentinel at worst)
    val exact = rows.groupBy(identity).map { case (v, g) => v -> g.size.toLong }
    val err = if (standing.isEmpty) 0L else standing.map(_._3).max
    standing.foreach { case (v, c, _) =>
      if (v != null) {
        val ex = exact.getOrElse(v, 0L)
        assert(c <= ex && ex <= c + err,
          s"MG deficit contract broken across batches: $v c=$c err=$err exact=$ex")
      }
    }
    val present = standing.map(_._1).toSet
    exact.foreach { case (v, ex) =>
      if (ex > err) assert(present.contains(v),
        s"coverage broken across batches: $v exact=$ex err=$err")
    }
    // every hot value (i % 3 == 0 forces i % 9 into {0, 3, 6}; each
    // occurs ~100 times, far above the deficit) must be present
    Seq(0, 3, 6).foreach(i => assert(present.contains("hot" + i)))
  }

  test("standing KMV sketch: stream-merged artifact equals the batch build") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rng = new scala.util.Random(13)
    val rows = (0 until 600).map(i =>
      ("g" + (i % 2), "tok" + rng.nextInt(200)))
    val store = java.nio.file.Files
      .createTempDirectory("graft-kmv").toString + "/sk"
    val mem = MemoryStream[(String, String)]
    val q = SeriesStream.kmvSketchStream(
      mem.toDF().toDF("source", "w"), "source", "w", k = 32,
      storePath = store,
      checkpoint = java.nio.file.Files
        .createTempDirectory("graft-kmv-ck").toString)
    try {
      mem.addData(rows.take(250))
      q.processAllAvailable()
      mem.addData(rows.drop(250))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(store).drop("batch_id")
      .select("source", "hv").as[(String, Long)].collect().toSet
    val direct = graft.operators.CorpusStats.kmvSketch(
        rows.toDF("source", "w"), $"source", $"w", 32)
      .select("source", "hv").as[(String, Long)].collect().toSet
    assert(streamed == direct) // the exact KMV merge homomorphism
    // and the estimate off the artifact equals the one-shot operator
    val estA = graft.operators.CorpusStats.kmvEstimate(
        spark.read.parquet(store), 32)
      .select("source", "est_distinct").as[(String, Long)].collect().toSet
    val estB = graft.operators.CorpusStats.distinctKmv(
        rows.toDF("source", "w"), $"source", $"w", 32)
      .select("source", "est_distinct").as[(String, Long)].collect().toSet
    assert(estA == estB)
  }

  test("streaming attribution join: clicks pair with in-window purchases only") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[(java.sql.Timestamp, String)]
    val purchases = MemoryStream[(java.sql.Timestamp, String)]
    val out = SeriesStream.attributionJoin(
      clicks.toDF().toDF("ts", "user"), purchases.toDF().toDF("ts", "user"),
      "user", "ts", windowMs = 60000L, watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    val base = 1346189040000L
    def ts(s: Long) = new java.sql.Timestamp(base + s * 1000)
    try {
      // a: clicks at 0 s and 30 s; purchase at 40 s → both in window;
      // click at 200 s is after the purchase; b's click has no purchase
      clicks.addData((ts(0), "a"), (ts(30), "a"), (ts(200), "a"), (ts(5), "b"))
      purchases.addData((ts(40), "a"))
      q.processAllAvailable()
      val rows = spark.table("attr")
        .select("click_key", "click_ts", "purchase_ts")
        .as[(String, java.sql.Timestamp, java.sql.Timestamp)].collect().toSet
      assert(rows == Set(
        ("a", ts(0), ts(40)), ("a", ts(30), ts(40))))
      // a purchase arriving later still catches a buffered click ≤60 s
      // back, but not one beyond the window
      purchases.addData((ts(230), "a"))
      q.processAllAvailable()
      val rows2 = spark.table("attr").count()
      assert(rows2 == 3) // + (click 200 s, purchase 230 s)
    } finally q.stop()
  }

  test("streaming sessionize: gap closes sessions; timeout flushes the last one") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val out = SeriesStream.sessionize(
      mem.toDF().toDF("ts", "user", "value"), "user", "ts", "value",
      gapMs = 60000L, watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    val base = 1346189040000L
    def ts(s: Long) = new java.sql.Timestamp(base + s * 1000)
    try {
      mem.addData((ts(0), "a", 1.0), (ts(30), "a", 2.0), (ts(10), "b", 5.0))
      q.processAllAvailable()
      // both sessions still open — nothing emitted
      assert(spark.table("sess").count() == 0)
      // 500 s later: a's gap (60 s) long exceeded → old session closes
      // in-line with the new event; b gets no event, so only the
      // advancing watermark's timeout can flush it
      mem.addData((ts(500), "a", 3.0))
      q.processAllAvailable()
      mem.addData((ts(1000), "a", 4.0)) // advances watermark past b+gap
      q.processAllAvailable()
      val rows = spark.table("sess")
        .select("key", "session_start", "session_end", "n_events", "value_sum")
        .as[(String, Long, Long, Long, Double)].collect().toSet
      assert(rows.contains(("a", base, base + 30000, 2L, 3.0)))
      assert(rows.contains(("b", base + 10000, base + 10000, 1L, 5.0)))
    } finally q.stop()
  }

  test("streaming sessionize: out-of-order event inside the span extends it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val out = SeriesStream.sessionize(
      mem.toDF().toDF("ts", "user", "value"), "user", "ts", "value",
      gapMs = 60000L, watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sess2")
      .outputMode("append").start()
    val base = 1346189040000L
    def ts(s: Long) = new java.sql.Timestamp(base + s * 1000)
    try {
      mem.addData((ts(40), "a", 1.0))
      q.processAllAvailable()
      mem.addData((ts(20), "a", 1.0)) // older than the open start
      q.processAllAvailable()
      mem.addData((ts(700), "a", 1.0)) // gap break → emits merged session
      q.processAllAvailable()
      val rows = spark.table("sess2")
        .select("session_start", "session_end", "n_events")
        .as[(Long, Long, Long)].collect().toSet
      assert(rows == Set((base + 20000, base + 40000, 2L)))
    } finally q.stop()
  }

  test("scoreStream projects the batch scoring columns onto a stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = SeriesStream.scoreStream(mem.toDF().toDF("doc_id", "text"), "text")
    val q = out.writeStream.format("memory").queryName("sc")
      .outputMode("append").start()
    try {
      mem.addData((0L, "the cat of the hat is a good cat mail me a@b.co"))
      q.processAllAvailable()
      val r = spark.table("sc").head()
      assert(r.getAs[String]("lang_pred") == "en")
      assert(r.getAs[Long]("n_emails") == 1)
      assert(r.getAs[String]("redacted").endsWith("mail me <EMAIL>"))
      assert(r.getAs[Long]("ws_tokens") == 12)
      // the round-10 rule/script signals ride the same projection
      assert(!r.getAs[Boolean]("gopher_keep")) // 12 words < minWords
      assert(r.getAs[String]("script") == "latin")
    } finally q.stop()
  }

  test("a batch-estimated unigram LM scores a stream as a pure projection") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.CorpusStats
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = Seq((1L, "a a b"), (2L, "a b c")).toDF("doc_id", "text")
    val model = CorpusStats.unigramModel(corpus, col("text"), vocabK = 8)
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .withColumn("avg_nll", model.avgNll(col("text")))
      .writeStream.format("memory").queryName("ppl").outputMode("append").start()
    try {
      mem.addData((10L, "a a a"), (11L, "zz zz zz"))
      q.processAllAvailable()
      val got = spark.table("ppl").collect()
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
      // hand values under the CORPUS model: total 6, c(a)=3, OOV → 1
      def m(c: Long) = Math.round(-Math.log(c / 6.0) * 1e6)
      assert(got(10L) == 3 * m(3) / 3e6)
      assert(got(11L) == 3 * m(1) / 3e6)
      assert(got(11L) > got(10L))
    } finally q.stop()
  }

  test("count-min sketch aggregates a stream with depth×width-bounded state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.CorpusStats
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    // the CMS groupBy is the rare GLOBAL streaming aggregate that is
    // safe without a watermark: its state is depth·width cells no
    // matter how unbounded the stream's vocabulary is
    val q = CorpusStats.countMinSketch(mem.toDF().toDF("w"), col("w"),
        width = 8, depth = 2)
      .writeStream.format("memory").queryName("cms")
      .outputMode("complete").start()
    try {
      mem.addData("a", "a", "b")
      q.processAllAvailable()
      mem.addData("a", "c")
      q.processAllAvailable()
      val cells = spark.table("cms").collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      // the streamed cell table equals the batch sketch of all 5 rows
      val batch = CorpusStats.countMinSketch(
          Seq("a", "a", "b", "a", "c").toDF("w"), col("w"),
          width = 8, depth = 2)
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(cells == batch)
    } finally q.stop()
  }

  test("a batch-trained NB classifier routes a stream as a pure projection") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.CorpusStats
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = Seq((1L, "x x y", "a"), (2L, "y x", "a"),
      (3L, "p q q", "b"), (4L, "q p", "b")).toDF("doc_id", "text", "lab")
    val model = CorpusStats.naiveBayesModel(corpus, col("text"), col("lab"),
      vocabK = 8)
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .withColumn("pred", model.scored(col("text"))(0)("c"))
      .writeStream.format("memory").queryName("nbcls")
      .outputMode("append").start()
    try {
      mem.addData((10L, "x y x"), (11L, "q p q"))
      q.processAllAvailable()
      val got = spark.table("nbcls").collect()
        .map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(got == Map(10L -> "a", 11L -> "b"))
    } finally q.stop()
  }

  test("streaming funnel: advancement rows, order enforced, state retires") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, String)]
    val out = SeriesStream.funnel(mem.toDF().toDF("ts", "user", "et"),
      "user", "ts", "et", steps = Seq("view", "click", "purchase"))
    val q = out.writeStream.format("memory").queryName("funl")
      .outputMode("append").start()
    val base = 1346189040000L
    def ts(s: Long) = new java.sql.Timestamp(base + s * 1000)
    try {
      // a: out-of-order within the batch still resolves (sorted);
      // b: click arrives BEFORE any view → no advancement
      mem.addData((ts(20), "a", "click"), (ts(10), "a", "view"),
        (ts(0), "b", "click"))
      q.processAllAvailable()
      val r1 = spark.table("funl")
        .as[(String, Int, Long, Long, Option[Long])].collect().toSet
      assert(r1 == Set(("a", 1, base + 10000, base + 10000, None),
        ("a", 2, base + 20000, base + 10000, None)))
      // completing purchase emits the conversion row with duration
      mem.addData((ts(50), "a", "purchase"), (ts(30), "b", "view"))
      q.processAllAvailable()
      val r2 = spark.table("funl")
        .as[(String, Int, Long, Long, Option[Long])].collect().toSet
      assert(r2.contains(("a", 3, base + 50000, base + 10000, Some(40000L))))
      assert(r2.contains(("b", 1, base + 30000, base + 30000, None)))
      // a's funnel completed → its state retired: a new view restarts
      // from depth 1, it does not re-complete on top of old state
      mem.addData((ts(100), "a", "view"))
      q.processAllAvailable()
      val r3 = spark.table("funl")
        .as[(String, Int, Long, Long, Option[Long])].collect().toSet
      assert(r3.contains(("a", 1, base + 100000, base + 100000, None)))
    } finally q.stop()
  }

  test("streaming sessionize: a late event beyond the gap emits its own session") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val out = SeriesStream.sessionize(
      mem.toDF().toDF("ts", "user", "value"), "user", "ts", "value",
      gapMs = 60000L, watermark = "30 minutes")
    val q = out.writeStream.format("memory").queryName("sess3")
      .outputMode("append").start()
    val base = 1346189040000L
    def ts(s: Long) = new java.sql.Timestamp(base + s * 1000)
    try {
      mem.addData((ts(500), "a", 1.0))
      q.processAllAvailable()
      // 400 s OLDER than the open session's start — more than the gap,
      // still inside the watermark: the batch operator would produce
      // two sessions, so this emits the older one instead of
      // stretching the open session backwards
      mem.addData((ts(100), "a", 2.0))
      q.processAllAvailable()
      val rows = spark.table("sess3")
        .select("session_start", "session_end", "n_events", "value_sum")
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(rows == Set((base + 100000, base + 100000, 1L, 2.0)))
      // the open session is untouched: a later gap break closes it with
      // its original bounds
      mem.addData((ts(1000), "a", 3.0))
      q.processAllAvailable()
      val rows2 = spark.table("sess3")
        .as[(String, Long, Long, Long, Double)].collect().toSet
      assert(rows2.contains(("a", base + 500000, base + 500000, 1L, 1.0)))
    } finally q.stop()
  }

  test("streaming funnel: stalled keys expire via event-time timeout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, String)]
    val out = SeriesStream.funnel(mem.toDF().toDF("ts", "user", "et"),
      "user", "ts", "et", steps = Seq("view", "purchase"),
      watermark = "0 seconds", idleMs = 60000L)
    val q = out.writeStream.format("memory").queryName("funl2")
      .outputMode("append").start()
    val base = 1346189040000L
    def ts(s: Long) = new java.sql.Timestamp(base + s * 1000)
    try {
      mem.addData((ts(0), "x", "view")) // x at depth 1, state held
      q.processAllAvailable()
      mem.addData((ts(1000), "y", "view")) // watermark → 1000 s
      q.processAllAvailable()
      mem.addData((ts(1001), "y", "other")) // x idle 1000 s > 60 s → expired
      q.processAllAvailable()
      // with state expired, a purchase is no longer the next needed
      // step — the stalled funnel does NOT complete
      mem.addData((ts(1100), "x", "purchase"))
      q.processAllAvailable()
      // and a fresh view restarts x from depth 1
      mem.addData((ts(1200), "x", "view"))
      q.processAllAvailable()
      val xs = spark.table("funl2").filter(col("key") === "x")
        .as[(String, Int, Long, Long, Option[Long])].collect().toSet
      assert(xs == Set(("x", 1, base, base, None),
        ("x", 1, base + 1200000, base + 1200000, None)))
    } finally q.stop()
  }
}
