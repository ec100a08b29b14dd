package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage attribution for the dedup_index_delete gate (48 s at 100×
 * vs 7-8 s for its upsert/screen siblings): times the index build,
 * the anti-join delete, and the incremental screen separately, with
 * and without the delete upstream, to find which stage (or which
 * plan flip) owns the gap.
 *
 * Usage: ProbeIndexDelete <sfDir>
 */
object ProbeIndexDelete {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft-sf10"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val corpus = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
    val odd = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
    val dels = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    val remaining = corpus.filter(pmod(col("doc_id"), lit(10)) =!= 0)

    def time(name: String)(f: => Long): Unit = {
      System.gc()
      val io = IoProbe.sampleMbps()
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"($n rows, io=$io%.0fMB/s)")
    }

    time("index.build") {
      Dedup.corpusIndex(corpus, col("doc_id"), col("text")).count()
    }
    val full = Dedup.corpusIndex(corpus, col("doc_id"), col("text"))
      .localCheckpoint()
    time("delete.antijoin") {
      Dedup.corpusIndexDelete(full, dels, col("doc_id")).count()
    }
    val idxDel = Dedup.corpusIndexDelete(full, dels, col("doc_id"))
    time("screen.with-delete") {
      Dedup.incrementalIndexed(odd, idxDel, remaining,
        col("doc_id"), col("text"), threshold = 0.8).count()
    }
    time("screen.plain") {
      Dedup.incrementalIndexed(odd, full, corpus,
        col("doc_id"), col("text"), threshold = 0.8).count()
    }
    // the gate's exact shape: UNCHECKPOINTED index chain through the
    // delete into the screen — recomputation suspect
    time("gate.shape-unpinned") {
      val f2 = Dedup.corpusIndex(corpus, col("doc_id"), col("text"))
      Dedup.incrementalIndexed(odd,
        Dedup.corpusIndexDelete(f2, dels, col("doc_id")), remaining,
        col("doc_id"), col("text"), threshold = 0.8).count()
    }
    spark.stop()
  }
}
