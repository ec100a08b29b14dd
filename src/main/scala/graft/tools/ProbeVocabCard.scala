package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Component attribution for the tokenizer vocab card: times the
 * encode-only scan, the doc-local card explode, and the full
 * bpeVocabStats emit at a given SF dir — the probe that decides
 * which stage of the one-pass card shape pays. */
object ProbeVocabCard {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val merges = Seq((0, "t", "a"), (1, "ta", "b"), (2, "l", "e"),
      (3, "tab", "le"), (4, "s", "c"), (5, "a", "n"), (6, "r", "o"),
      (7, "v", "a"), (8, "u", "e"))
      .map { case (r, l, rr) => (r, l, rr, 0L) }
      .toDF("merge_rank", "left", "right", "pair_count")
    val bc = spark.sparkContext.broadcast(
      merges.collect().sortBy(_.getInt(0))
        .map(r => Array(r.getString(1), r.getString(2))))
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"VOCABCARD $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    (1 to 2).foreach { round =>
      time(s"scan_only#$round")(docs.select(length(col("text"))).agg(
        sum(col("length(text)"))).count())
      time(s"encode_ntokens#$round")(docs.select(
        size(graft.functions.BpeEncodeExpr.bpeText(col("text"), bc)))
        .agg(sum(col("size(bpe_encode_text(text))"))).count())
      time(s"encode_explode#$round")(docs.select(
        explode(graft.functions.BpeEncodeExpr.bpeText(col("text"), bc)))
        .count())
      time(s"card_explode#$round")(docs.select(
        explode(graft.functions.BpeEncodeExpr.bpeTextCard(col("text"), bc)))
        .count())
      time(s"card_agg#$round")(docs.select(
          explode(graft.functions.BpeEncodeExpr.bpeTextCard(col("text"), bc))
            .as("t"))
        .select(col("t.token").as("token"), col("t.cnt").as("cnt"))
        .groupBy(col("token"))
        .agg(sum(col("cnt")).as("n"), count(lit(1)).as("n_docs"))
        .count())
      time(s"full_card#$round")(graft.operators.CorpusStats.bpeVocabStats(
        docs, col("doc_id"), col("text"), merges, k = 40).count())
    }
    spark.stop()
  }
}
