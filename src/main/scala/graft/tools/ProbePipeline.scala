package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{CorpusStats, Dedup, Pipeline, TextOps}

/** Stage-level attribution for the pipeline_clean_perplexity chain —
 * the r17 top query. Times each independent branch of
 * [[Pipeline.cleanCorpus]] in isolation (best of 3, residue-drained)
 * so the composed query's cost can be attributed to a stage instead
 * of guessed at. Not library surface. */
object ProbePipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val s = SampleHygiene.measure(spark, 3) { f; () }
      println(f"PROBEPIPE $name: ${s.sec}%.2f s (io=${s.io}%.0f)")
    }
    val bands = Dedup.bandsFor(0.8)
    // warmup: compile every plan shape once
    Pipeline.cleanCorpus(docs, col("doc_id"), col("text"),
      langs = Seq("en", "es"), minQuality = 0.35, jaccardThreshold = 0.8,
      useClusters = true, maxAvgNll = 3.41, nllVocabK = 32,
      lshBands = bands).count()
    time("scored(lang+quality)") {
      docs.select(col("doc_id"), TextOps.langId(col("text")).as("l"),
        TextOps.qualityColumns(col("text")).toMap.apply("quality").as("q"))
        .count()
    }
    time("fingerprint-groupby") {
      docs.filter(col("text").isNotNull && length(col("text")) > 0)
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .groupBy(col("fp")).agg(min(col("doc_id"))).count()
    }
    time("pairs-bounded") {
      Dedup.minhashPairsBounded(docs, col("doc_id"), col("text"), 0.8,
        bands = bands).count()
    }
    time("clusters(pairs-bounded)") {
      Dedup.clusters(Dedup.minhashPairsBounded(docs, col("doc_id"),
        col("text"), 0.8, bands = bands)).count()
    }
    time("unigramNll(k=32)") {
      CorpusStats.unigramNll(docs.filter(col("text").isNotNull &&
        length(col("text")) > 0), col("doc_id"), col("text"), 32).count()
    }
    time("clean(no clusters,no ppl)") {
      Pipeline.cleanCorpus(docs, col("doc_id"), col("text"),
        langs = Seq("en", "es"), minQuality = 0.35, jaccardThreshold = 0.8,
        lshBands = bands).count()
    }
    time("clean(clusters)") {
      Pipeline.cleanCorpus(docs, col("doc_id"), col("text"),
        langs = Seq("en", "es"), minQuality = 0.35, jaccardThreshold = 0.8,
        useClusters = true, lshBands = bands).count()
    }
    time("clean(clusters+ppl) FULL") {
      Pipeline.cleanCorpus(docs, col("doc_id"), col("text"),
        langs = Seq("en", "es"), minQuality = 0.35, jaccardThreshold = 0.8,
        useClusters = true, maxAvgNll = 3.41, nllVocabK = 32,
        lshBands = bands).count()
    }
    spark.stop()
  }
}
