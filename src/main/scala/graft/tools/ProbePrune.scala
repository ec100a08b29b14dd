package graft.tools

import graft.operators.SeriesEngine
import graft.operators.SeriesEngine.SeriesQuery
import graft.sources.SeriesStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Manifest-pruning scale probe: load the events table into a store as
 * many time-ordered commits (one data file each — the shape a
 * steady-state ingest produces), then time a NARROW time-range
 * `_query` with and without manifest-level file skipping. At 100 TB
 * the pruned path's scan cost tracks files-in-range, the unpruned
 * path's tracks table size — this probe records the gap plus the
 * pruned/total file counts.
 *
 * Usage: ProbePrune <sfDir> [commits]
 */
object ProbePrune {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val commits = if (args.length > 1) args(1).toInt else 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft-prune-probe")
    val store = new SeriesStore(spark, root.toString)
    store.create("ev")

    // events → (ts, doc) rows, committed as `commits` contiguous time
    // slices (range-partitioned ingest → tight per-file min/max)
    val ev = graft.Queries.eventsNs(spark, sfDir)
      .select(col("ts"), concat(lit("{\"v\":"), col("value").cast("string"),
        lit("}")).as("doc"))
    val bounds = ev.agg(min("ts"), max("ts")).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val width = (hi - lo) / commits + 1
    val t0 = System.nanoTime()
    (0 until commits).foreach { i =>
      val a = lo + i * width
      val b = math.min(lo + (i + 1) * width, hi + 1)
      store.storeBatch("ev",
        ev.filter(col("ts") >= a && col("ts") < b).coalesce(1))
    }
    println(f"PROBE load: ${(System.nanoTime() - t0) / 1e9}%.1f s, " +
      s"${store.scanFiles("ev").size} files")

    // narrow range = one commit's slice in the middle
    val from = lo + (commits / 2) * width
    val to = from + width
    val fromS = graft.timelib.TimeLib.formatCanonical(from)
    val toS = graft.timelib.TimeLib.formatCanonical(to)
    val q = SeriesQuery(groupMs = 3600000L, ptrs = Seq("/v"),
      reducers = Seq("sum"), from = Some(fromS), to = Some(toS))
    println(s"PROBE files: total=${store.scanFiles("ev").size} " +
      s"pruned=${store.scanFiles("ev", Some(from), Some(to)).size}")

    def time(name: String)(f: => Long): Unit = (1 to 3).foreach { r =>
      val t = System.nanoTime()
      val n = f
      println(f"PROBE $name#$r: ${(System.nanoTime() - t) / 1e9}%.3f s ($n rows)")
    }
    // pruned: the store's query path (manifest stats drop files)
    time("pruned")(store.query("ev", q).count())
    // unpruned: the same engine query over the full-file-list frame
    time("unpruned")(SeriesEngine.query(store.frame("ev"), q).count())
    spark.stop()
  }
}
