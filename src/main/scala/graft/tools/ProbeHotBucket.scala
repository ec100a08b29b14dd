package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * HOT-BUCKET stress for the banded LSH joins: a pathological single
 * near-dup cluster (k slightly-perturbed copies of one boilerplate
 * page — NOT exact dups, so the exact-dup collapse can't save the LSH
 * stage) lands all k members in one (band, key) bucket per band. The
 * in-bucket verify is O(k²) and the TRUE pair set is ~k²/2, so the
 * exact path [[graft.operators.Dedup.minhashPairs]] is inherently
 * quadratic here; the probe measures where that turns from "fine"
 * into "a wall", and what the bounded variant
 * ([[graft.operators.Dedup.minhashPairsBounded]], maxBucket
 * key-refinement) costs on the same corpus.
 *
 * Copies perturb 2 of 170 tokens (per-copy-unique), so pairwise
 * shingle-Jaccard stays ≈ 0.87-0.93 — above the 0.8 gate, below
 * exactness. A base corpus of ordinary docs rides along so the probe
 * also shows the healthy-corpus overhead of the bounded path's extra
 * size pass.
 *
 * Usage: ProbeHotBucket <sfDir> [ks=2000,10000,100000]
 * (the exact path is skipped at k > 5000 — measured 262 s at k=3000
 * on sf0.01, growing ~k²: its ~k²/2 verified pairs run for hours;
 * that cliff IS the finding)
 */
object ProbeHotBucket {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val ks = (if (args.length > 1) args(1) else "2000,10000,100000")
      .split(",").map(_.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))

    def hotCluster(k: Int): DataFrame = {
      // 170 tokens; copies replace tokens 60 and 120 with copy-unique
      // ones → any two copies differ in ≤ 4 tokens (≤ 12 of ~168
      // shingles): pairwise J ≥ ~0.87
      spark.range(k.toLong).select(
        (col("id") + 10000000L).as("doc_id"),
        concat_ws(" ", (1 to 170).map { j =>
          if (j == 60 || j == 120)
            concat(lit(s"h${j}x"), col("id")): org.apache.spark.sql.Column
          else lit(s"w$j"): org.apache.spark.sql.Column
        }: _*).as("text"))
    }

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    ks.foreach { k =>
      val corpus = base.unionByName(hotCluster(k)).localCheckpoint()
      val io = IoProbe.sampleMbps()
      if (k <= 5000) {
        val (n1, s1) = time(Dedup.minhashPairs(corpus, col("doc_id"),
          col("text"), threshold = 0.8, bands = 8).count())
        println(f"PROBE hotbucket k=$k EXACT: $s1%.1f s, $n1 pairs (io=$io%.0fMB/s)")
      } else {
        println(s"PROBE hotbucket k=$k EXACT: SKIPPED (~${k.toLong * k / 2} " +
          "true pairs — the quadratic wall this probe documents)")
      }
      val (n2, s2) = time(Dedup.minhashPairsBounded(corpus, col("doc_id"),
        col("text"), threshold = 0.8, bands = 8, maxBucket = 1024).count())
      println(f"PROBE hotbucket k=$k BOUNDED(maxBucket=1024): $s2%.1f s, " +
        f"$n2 pairs (io=$io%.0fMB/s)")
      System.gc()
    }
    spark.stop()
  }
}
