package graft

import graft.operators.{Dedup, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main (not part of the library surface). */
object Scratch {
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
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"docs: ${docs.count()} in ${docs.rdd.getNumPartitions} partitions")

    val spread32 = docs.select(col("doc_id"), col("text")).repartition(32)
    time("spread-only")(spread32.count())
    time("shingles-post-spread")(spread32
      .select(TextOps.shingles(col("text")).as("ss"))
      .agg(sum(size(col("ss")))).count())
    time("hashes-post-spread")(spread32
      .select(col("doc_id"), explode(TextOps.shingles(col("text"))).as("sh"))
      .select(col("doc_id"), pmod(TextOps.hash60(col("sh")), lit(Dedup.MinhashP)).as("h"))
      .agg(sum(col("h"))).count())
    time("sig-agg-post-spread")(spread32
      .select(col("doc_id"), explode(TextOps.shingles(col("text"))).as("sh"))
      .select(col("doc_id"), pmod(TextOps.hash60(col("sh")), lit(Dedup.MinhashP)).as("h"))
      .groupBy(col("doc_id"))
      .agg(graft.functions.MinHashSigAgg.minhashSig(col("h"), 64).as("sig"))
      .count())
    time("signatures")(Dedup.minhashSignatures(docs, col("doc_id"), col("text")).count())
    time("candidates")(Dedup.lshCandidates(
      Dedup.minhashSignatures(docs, col("doc_id"), col("text"))).count())
    time("full-pairs")(Dedup.minhashPairs(docs, col("doc_id"), col("text")).count())
    spark.stop()
  }
}
