package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Construction-vs-production attribution for the gate-heavy queries
 * (the [[ProbeStages]] pattern, requested by the round-13 review):
 * the three r13 heavyweights each BUILD their standing artifacts
 * in-gate (histograms, from-scratch index) before exercising the
 * production path (scoring scan, batch-cost upsert, artifact
 * retrain), so their BenchSubset floors conflate the two. This probe
 * times the halves separately at an arbitrary SF dir, each with an
 * [[IoProbe]] sample next to it, so BASELINE floor rows can cite
 * measured splits AND the io state they were taken in.
 *
 * Usage: ProbeGateSplit <sfDir>
 */
object ProbeGateSplit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{CorpusStats, Dedup}
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time(name: String)(f: => Long): Unit = {
      System.gc()
      val io = IoProbe.sampleMbps()
      val t0 = System.nanoTime()
      val n = f
      println(f"SPLIT $name: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"($n rows, io=${io}%.0fMB/s)")
    }

    // 1. text_perplexity_trigram_hist: hist construction vs scoring.
    //    Production holds the n-gram histograms as standing artifacts
    //    (ngramHistStream) — only the table cut + scoring scan recur.
    val hists = (1 to 3).map(n =>
      CorpusStats.ngramHistogram(docs, col("text"), n).localCheckpoint())
    time("trigram.hist-construction") {
      (1 to 3).map(n =>
        CorpusStats.ngramHistogram(docs, col("text"), n).count()).sum
    }
    time("trigram.production-score") {
      CorpusStats.trigramNllFromHists(docs, col("doc_id"), col("text"),
        hists(0), hists(1), hists(2)).count()
    }

    // 2. dedup_index_upsert: from-scratch index construction vs the
    //    batch-cost upsert + indexed screen the standing path pays.
    val corpus = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
    val batch = corpus.filter(pmod(col("doc_id"), lit(3)) === 0)
    val standing = Dedup.corpusIndex(
      corpus.filter(pmod(col("doc_id"), lit(3)) =!= 0),
      col("doc_id"), col("text")).localCheckpoint()
    time("index.construction") {
      Dedup.corpusIndex(corpus, col("doc_id"), col("text")).count()
    }
    time("index.production-upsert") {
      Dedup.corpusIndexUpsert(standing, batch, col("doc_id"),
        col("text")).count()
    }
    time("index.production-screen") {
      Dedup.incrementalIndexed(
        docs.filter(pmod(col("doc_id"), lit(2)) === 1), standing, corpus,
        col("doc_id"), col("text"), threshold = 0.8).count()
    }

    // 3. corpus_wordpiece_merges_hist: word-type histogram build vs
    //    the bounded-artifact retrain production pays.
    val hist = CorpusStats.wordTypeHistogram(docs, col("text"))
      .filter(length(col("w")) >= 2)
      .orderBy(col("n").desc, col("w")).limit(50000).localCheckpoint()
    time("wordpiece.hist-construction") {
      CorpusStats.wordTypeHistogram(docs, col("text")).count()
    }
    time("wordpiece.production-retrain") {
      CorpusStats.wordpieceTrainMarkedFromHist(hist, merges = 6).count()
    }
    spark.stop()
  }
}
