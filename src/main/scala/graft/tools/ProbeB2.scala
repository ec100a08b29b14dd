package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Minimal interleaved A/B of the exact vs bounded pair stage on the
 * healthy bench corpus (the fast iteration loop behind the r17
 * bounded-path work — ProbeBounded runs the full pipeline variants
 * and takes minutes). Not library surface. */
object ProbeB2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rounds = if (args.nonEmpty) args(0).toInt else 3
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
    val bands = Dedup.bandsFor(0.8)
    def exact() = Dedup.minhashPairs(docs, col("doc_id"), col("text"), 0.8,
      bands = bands)
    def bounded() = Dedup.minhashPairsBounded(docs, col("doc_id"),
      col("text"), 0.8, bands = bands)
    // warmup both plans
    exact().count(); bounded().count()
    (1 to rounds).foreach { r =>
      Seq("exact" -> exact _, "bounded" -> bounded _).foreach { case (tag, f) =>
        SampleHygiene.drainResidue(spark)
        val io = IoProbe.sampleMbps()
        val t0 = System.nanoTime()
        val n = f().count()
        println(f"PROBEB2 $tag#$r: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
          f"($n rows, io=$io%.0f)")
      }
    }
    spark.stop()
  }
}
