package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic: dump the top-types cut the wordpiece gates use
 * so it can be diffed against the oracle's (engine-cut parity). */
object ProbeCut {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-sf1")
    val out = if (args.length > 1) args(1) else "/tmp/sparkcut.txt"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val cut = graft.operators.CorpusStats.wordTypeHistogram(docs, col("text"))
      .filter(length(col("w")) >= 2)
      .orderBy(col("n").desc, col("w")).limit(50000)
      .collect().map(r => s"${r.getString(0)}\t${r.getLong(1)}")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      cut.mkString("\n").getBytes("UTF-8"))
    println(s"PROBECUT ${cut.length} rows -> $out")
    spark.stop()
  }
}
