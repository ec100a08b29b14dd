package graft.tools

import graft.sources.SeriesStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Numeric-band pruning scale probe (the quality-score analog of
 * [[ProbeCatPrune]]): load the events table into a store with a
 * derived quality score on every doc, compact with the score
 * DECLARED (value-clustered layout + per-file min/max in the
 * manifest), then time a TOP-BAND read with and without
 * manifest-level range skipping. The pruned read's cost tracks
 * files-in-band (≈ flat as the table grows at a fixed band width),
 * the unpruned read's tracks table size.
 *
 * Usage: ProbeNumPrune <sfDir> [bands] [rowsPerFile]
 */
object ProbeNumPrune {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val bands = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft-numprune")
    val store = new SeriesStore(spark, root.toString)
    store.create("ev")

    // deterministic pseudo-quality in [0, 1): user-hash percent / 100
    val ev = graft.Queries.eventsNs(spark, sfDir)
      .select(col("ts"),
        concat(lit("{\"q\": 0."),
          lpad(pmod(col("user_id") * 37 + col("value").cast("long"),
            lit(100)).cast("string"), 2, "0"),
          lit(", \"v\": "), col("value").cast("string"),
          lit("}")).as("doc"))
    val n = ev.count()
    val rowsPerFile = if (args.length > 2) args(2).toLong
      else math.max(1L, n / (bands.toLong * 4)) // ~4 files per band
    val t0 = System.nanoTime()
    store.storeBatch("ev", ev, None, Some("/q"))
    store.compact("ev", None, rowsPerFile, Some("/q"))
    println(f"PROBE load+compact: ${(System.nanoTime() - t0) / 1e9}%.1f s, " +
      s"$n rows, ${store.scanFiles("ev").size} files")

    // top band: [1 - 1/bands, 1)
    val lo = 1.0 - 1.0 / bands
    println(s"PROBE files: total=${store.scanFiles("ev").size} " +
      s"pruned=${store.scanFiles("ev",
        numBand = Some((Some(lo), None))).size}")
    def time(name: String)(f: => Long): Unit = (1 to 3).foreach { r =>
      val t = System.nanoTime()
      val rows = f
      println(f"PROBE $name#$r: ${(System.nanoTime() - t) / 1e9}%.3f s ($rows rows)")
    }
    time("pruned")(store.frameNum("ev", None, None, "/q", Some(lo), None)
      .count())
    time("unpruned")(store.frame("ev")
      .filter(SeriesStore.numValueCol("/q") >= lo).count())
    spark.stop()
  }
}
