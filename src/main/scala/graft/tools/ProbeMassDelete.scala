package graft.tools

import graft.sources.SeriesStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * MASS-takedown probe for the DataFrame overload of
 * [[SeriesStore.deleteKeys]] — the GDPR/opt-out batch shape the Seq
 * form cannot take (an `isin` of 10⁵+ literals is a codegen/driver
 * blowup, and its per-file selection loop is O(|files|·|keys|)). The
 * probe loads the (scaled) events table as many time-ordered commits,
 * then deletes key batches of growing size (10³, 10⁴, 10⁵ — plus
 * however many actually hit) and reports wall time, rows removed, and
 * files rewritten vs kept per batch. The claim under test: cost
 * tracks AFFECTED FILES (how many files the keys stab), not
 * |files|·|keys| and not |keys| in any super-linear way — the
 * sorted-interval probe is O(|keys| log |files|) distributed and the
 * rewrite is an anti-join over only the stabbed files.
 *
 * Usage: ProbeMassDelete <sfDir> [commits]
 */
object ProbeMassDelete {
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

    def freshStore(): SeriesStore = {
      val root = java.nio.file.Files.createTempDirectory("graft-massdel")
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
      store
    }

    Seq(1000L, 10000L, 100000L).foreach { batch =>
      val s = freshStore()
      val total = s.scanFiles("ev").size
      val rows = s.frame("ev").count()
      // every batch-th stored ts is a real hit; the rest of the key
      // space is synthetic misses far in the future — so the probe
      // exercises both the stab walk (hits concentrate on real files)
      // and the mass-miss path (misses stab nothing)
      val hits = s.frame("ev").select(col("ts"))
        .orderBy(col("ts")).limit((batch / 10).toInt)
      val misses = spark.range(batch - batch / 10)
        .select((col("id") * 1000000L + 4102444800000000000L).as("ts"))
      val keys = hits.unionByName(misses).select(col("ts").as("key"))
        .localCheckpoint()
      val io = IoProbe.sampleMbps()
      val t0 = System.nanoTime()
      val n = s.deleteKeys("ev", keys)
      val sec = (System.nanoTime() - t0) / 1e9
      val after = s.scanFiles("ev").size
      println(f"PROBE massdelete batch=$batch keys: $sec%.2f s, " +
        f"$n rows deleted of $rows, files total=$total after=$after " +
        f"(io=$io%.0fMB/s)")
    }
    spark.stop()
  }
}
