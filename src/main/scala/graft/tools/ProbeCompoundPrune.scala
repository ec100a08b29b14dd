package graft.tools

import graft.sources.SeriesStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Compound (multi-pointer) manifest-pruning scale probe — the
 * [[ProbeNumPrune]] construction with BOTH a categorical source and a
 * numeric quality declared: load events with a derived (src, q) doc,
 * `compactMulti` clustered on (src, q, ts), then time the
 * (source AND top-quality-band) read four ways — unpruned,
 * source-pruned only, band-pruned only, and compound-pruned — so the
 * intersection's advantage over each single axis is a measured
 * number, not an argument. At a fixed band the compound read's file
 * count tracks files-in-intersection (≈ flat as the table grows);
 * each single-axis read tracks its own axis's selectivity only.
 *
 * Usage: ProbeCompoundPrune <sfDir> [sources] [bands] [rowsPerFile]
 */
object ProbeCompoundPrune {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val sources = if (args.length > 1) args(1).toInt else 8
    val bands = if (args.length > 2) args(2).toInt else 8
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft-cmpprune")
    val store = new SeriesStore(spark, root.toString)
    store.create("ev")

    // deterministic source + quality per event
    val ev = graft.Queries.eventsNs(spark, sfDir)
      .select(col("ts"),
        concat(lit("{\"src\": \"s"),
          pmod(col("user_id"), lit(sources)).cast("string"),
          lit("\", \"q\": 0."),
          lpad(pmod(col("user_id") * 37 + col("value").cast("long"),
            lit(100)).cast("string"), 2, "0"),
          lit("}")).as("doc"))
    val n = ev.count()
    val rowsPerFile = if (args.length > 3) args(3).toLong
      else math.max(1L, n / (sources.toLong * bands * 2)) // ~2 files/cell
    val t0 = System.nanoTime()
    store.storeBatch("ev", ev, Seq("/src"), Seq("/q"))
    store.compactMulti("ev", Seq("/src"), Seq("/q"), rowsPerFile)
    println(f"PROBE load+compact: ${(System.nanoTime() - t0) / 1e9}%.1f s, " +
      s"$n rows, ${store.scanFiles("ev").size} files")

    val lo = 1.0 - 1.0 / bands
    val srcEq = Seq(("/src", "s0"))
    val band = Seq(("/q", Some(lo), Option.empty[Double]))
    println(s"PROBE files: total=${store.scanFiles("ev").size} " +
      s"src=${store.scanFiles("ev", catEqs = srcEq).size} " +
      s"band=${store.scanFiles("ev", numBands = band).size} " +
      s"compound=${store.scanFiles("ev", catEqs = srcEq,
        numBands = band).size}")
    def time(name: String)(f: => Long): Unit = (1 to 3).foreach { r =>
      val t = System.nanoTime()
      val rows = f
      println(f"PROBE $name#$r: ${(System.nanoTime() - t) / 1e9}%.3f s ($rows rows)")
    }
    time("compound")(store.frameMulti("ev", None, None, srcEq, band).count())
    time("src-only")(store.frameMulti("ev", None, None, srcEq)
      .filter(SeriesStore.numValueCol("/q") >= lo).count())
    time("band-only")(store.frameMulti("ev", None, None, Nil, band)
      .filter(SeriesStore.catValueCol("/src") === "s0").count())
    time("unpruned")(store.frame("ev")
      .filter(SeriesStore.catValueCol("/src") === "s0" &&
        SeriesStore.numValueCol("/q") >= lo).count())
    spark.stop()
  }
}
