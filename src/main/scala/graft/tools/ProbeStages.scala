package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Ad-hoc stage-level probe for the minhash chain (not library
 * surface — the profiling companion to [[BenchSubset]]): times
 * shingle+signature, banding/candidates, full pairs, and cluster
 * closure at an arbitrary SF dir, so a scale regression can be
 * attributed to a stage instead of a query. */
object ProbeStages {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val bands = if (args.length > 1) args(1).toInt else 8
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    (1 to 2).foreach { r =>
      println(s"== round $r ==")
      time("sigs") {
        Dedup.minhashSignatures(docs, col("doc_id"), col("text")).count()
      }
      time(s"cands(b=$bands)") {
        Dedup.lshCandidates(
          Dedup.minhashSignatures(docs, col("doc_id"), col("text")),
          bands).count()
      }
      time(s"pairs(b=$bands)") {
        Dedup.minhashPairs(docs, col("doc_id"), col("text"),
          threshold = 0.8, bands = bands).count()
      }
      time(s"clusters(b=$bands)") {
        Dedup.clusters(Dedup.minhashPairs(docs, col("doc_id"), col("text"),
          threshold = 0.8, bands = bands)).count()
      }
    }
    spark.stop()
  }
}
