package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Pipeline}

/** r17 regression forensics: cleanCorpus with the (new-default)
  * bounded LSH stage vs the exact stage, healthy corpus — attributes
  * the pipeline_clean_perplexity 5.1 → 9.8 s move before optimizing.
  */
object ProbeBounded {
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
    def run(tag: String, maxBucket: Int, useClusters: Boolean,
        maxAvgNll: Double): Unit = {
      (1 to 3).foreach { i =>
        SampleHygiene.drainResidue(spark)
        val t0 = System.nanoTime()
        val n = Pipeline.cleanCorpus(docs, col("doc_id"), col("text"),
          langs = Seq("en", "es"), minQuality = 0.35,
          jaccardThreshold = 0.8, useClusters = useClusters,
          maxAvgNll = maxAvgNll, nllVocabK = 32,
          lshBands = Dedup.bandsFor(0.8), lshMaxBucket = maxBucket).count()
        println(f"$tag#$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    // warmup
    run("warm-exact", Int.MaxValue, false, Double.PositiveInfinity)
    run("clean-exact", Int.MaxValue, false, Double.PositiveInfinity)
    run("clean-bounded", 4096, false, Double.PositiveInfinity)
    run("ppl-exact", Int.MaxValue, true, 3.41)
    run("ppl-bounded", 4096, true, 3.41)
    // bare pair stages, no pipeline around them
    def pairs(tag: String, f: => org.apache.spark.sql.DataFrame): Unit =
      (1 to 3).foreach { i =>
        SampleHygiene.drainResidue(spark)
        val t0 = System.nanoTime()
        val n = f.count()
        println(f"$tag#$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    pairs("pairs-exact", Dedup.minhashPairs(docs, col("doc_id"), col("text"),
      0.8, bands = Dedup.bandsFor(0.8)))
    pairs("pairs-bounded", Dedup.minhashPairsBounded(docs, col("doc_id"),
      col("text"), 0.8, bands = Dedup.bandsFor(0.8), maxBucket = 4096))
    spark.stop()
  }
}
