package graft.tools

import graft.sources.SeriesStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Takedown-at-scale probe for [[SeriesStore.deleteKeys]]: load the
 * (scaled) events table into a store as many time-ordered commits
 * (the [[ProbePrune]] shape), then delete a handful of keys and
 * measure what the TARGETED rewrite touches — files rewritten vs
 * kept, wall time — against the whole-table [[SeriesStore
 * .deleteRange]] path deleting the same rows. At 100 TB the targeted
 * path's cost tracks the OWNING FILES (a takedown of k docs rewrites
 * ~k files), the range path's tracks the table.
 *
 * Usage: ProbeStoreDelete <sfDir> [commits]
 */
object ProbeStoreDelete {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val commits = if (args.length > 1) args(1).toInt else 64
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def freshStore(): (SeriesStore, Seq[Long]) = {
      val root = java.nio.file.Files.createTempDirectory("graft-del-probe")
      val store = new SeriesStore(spark, root.toString)
      store.create("ev")
      val ev = graft.Queries.eventsNs(spark, sfDir)
        .select(col("ts"), concat(lit("{\"v\":"),
          col("value").cast("string"), lit("}")).as("doc"))
      val bounds = ev.agg(min("ts"), max("ts")).head()
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      val width = (hi - lo) / commits + 1
      (0 until commits).foreach { i =>
        val a = lo + i * width
        val b = math.min(lo + (i + 1) * width, hi + 1)
        store.storeBatch("ev",
          ev.filter(col("ts") >= a && col("ts") < b).coalesce(1))
      }
      // three takedown keys from one commit's slice in the middle
      val mid = lo + (commits / 2) * width
      val keys = ev.filter(col("ts") >= mid).orderBy(col("ts"))
        .limit(3).select(col("ts")).collect().map(_.getLong(0)).toSeq
      (store, keys)
    }

    val (s1, keys) = freshStore()
    val total = s1.scanFiles("ev").size
    val rows = s1.frame("ev").count()
    println(s"PROBE store: $total files, $rows rows; deleting ${keys.size} keys")
    val io1 = IoProbe.sampleMbps()
    val t1 = System.nanoTime()
    val n1 = s1.deleteKeys("ev",
      keys.map(graft.timelib.TimeLib.formatCanonical))
    val sec1 = (System.nanoTime() - t1) / 1e9
    val after1 = s1.scanFiles("ev").size
    println(f"TARGETED deleteKeys: $sec1%.2f s, $n1 rows deleted, " +
      f"files total=$total after=$after1 (io=$io1%.0fMB/s)")

    // the whole-table alternative on an identical fresh store: delete
    // the same rows via three single-key ranges (deleteRange rewrites
    // the full table each call; ONE call is the fairest comparison)
    val (s2, _) = freshStore()
    val io2 = IoProbe.sampleMbps()
    val t2 = System.nanoTime()
    val n2 = s2.deleteRange("ev",
      Some(graft.timelib.TimeLib.formatCanonical(keys.min)),
      Some(graft.timelib.TimeLib.formatCanonical(keys.max + 1)))
    val sec2 = (System.nanoTime() - t2) / 1e9
    println(f"FULL-REWRITE deleteRange (same span): $sec2%.2f s, " +
      f"$n2 rows deleted (io=$io2%.0fMB/s)")
    println(f"RATIO targeted/full: ${sec1 / sec2}%.2f")
    spark.stop()
  }
}
