package graft.tools

import graft.sources.SeriesStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Categorical-pruning scale probe (the per-source analog of
 * [[ProbePrune]]): load the events table into a store with a derived
 * source category on every doc, compact with the category DECLARED
 * (clustered layout + per-file category sets in the manifest), then
 * time a ONE-SOURCE read with and without manifest-level category
 * skipping. Run it at two source counts at the same SF: the pruned
 * read's cost tracks files-per-source (≈ flat as sources grow), the
 * unpruned read's tracks table size.
 *
 * Usage: ProbeCatPrune <sfDir> [sources] [rowsPerFile]
 */
object ProbeCatPrune {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val sources = if (args.length > 1) args(1).toInt else 8
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft-catprune")
    val store = new SeriesStore(spark, root.toString)
    store.create("ev")

    val ev = graft.Queries.eventsNs(spark, sfDir)
      .select(col("ts"),
        concat(lit("{\"src\": \"s"),
          pmod(col("user_id"), lit(sources)).cast("string"),
          lit("\", \"v\": "), col("value").cast("string"),
          lit("}")).as("doc"))
    val n = ev.count()
    val rowsPerFile = if (args.length > 2) args(2).toLong
      else math.max(1L, n / (sources.toLong * 4)) // ~4 files per source
    val t0 = System.nanoTime()
    store.storeBatch("ev", ev, Some("/src"))
    store.compact("ev", Some("/src"), rowsPerFile)
    println(f"PROBE load+compact: ${(System.nanoTime() - t0) / 1e9}%.1f s, " +
      s"$n rows, $sources sources, ${store.scanFiles("ev").size} files")

    val one = "s" + (sources / 2)
    println(s"PROBE files: total=${store.scanFiles("ev").size} " +
      s"pruned=${store.scanFiles("ev", cat = Some(one)).size}")
    def time(name: String)(f: => Long): Unit = (1 to 3).foreach { r =>
      val t = System.nanoTime()
      val rows = f
      println(f"PROBE $name#$r: ${(System.nanoTime() - t) / 1e9}%.3f s ($rows rows)")
    }
    time("pruned")(store.frame("ev", None, None, "/src", one).count())
    time("unpruned")(store.frame("ev")
      .filter(SeriesStore.catValueCol("/src") === one).count())
    spark.stop()
  }
}
