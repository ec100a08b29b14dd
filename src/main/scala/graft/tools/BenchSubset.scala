package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Scale-probe bench: time a comma-separated subset of the
 * [[graft.SparkEntry.queries]] registry against an arbitrary SF
 * directory (ScaleGen output included) — the tool behind the
 * BASELINE.md 10×/100× scaling tables, where running the full
 * headline set would take too long per data point.
 *
 * Usage: `runMain graft.tools.BenchSubset <sfDir> <name1,name2,...>`
 * Prints one `BENCHSUBSET <name> <best-of-3 sec>` line per query
 * (warmup pass on sf0.001 charges codegen to the warmup, mirroring
 * [[graft.Bench]]).
 */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: BenchSubset <sfDir> <name1,name2,...>  (names from SparkEntry.queries)")
      sys.exit(2)
    }
    val dir = args(0)
    val (names, unknown) = args(1).split(",").toSeq
      .partition(graft.SparkEntry.queries.contains)
    unknown.foreach(n => System.err.println(s"[benchsubset] unknown query: $n"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup on the smallest available SF, derived like graft.Bench:
    // the codegen cost (2-5× steady-state) must bill the warmup pass,
    // and a hardcoded path would silently skip warmup on other roots
    val warmDir = {
      val tiny = new java.io.File("/root/testdata/sf0.001")
      if (tiny.isDirectory) tiny.toString else dir
    }
    val results = names.map { name =>
      val fn = graft.SparkEntry.queries(name)
      try fn(spark, warmDir).count()
      catch { case _: Throwable => () }
      System.gc()
      // io-state sample next to the measurement (BASELINE item 19's
      // dd protocol, in-harness): a slow-state MB/s on the line tells
      // the reader this sample is NOT a like-for-like floor
      val io = IoProbe.sampleMbps()
      var threw = false
      val times = (1 to 3).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, dir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          System.err.println(s"[benchsubset] $name failed: ${e.getMessage}")
          threw = true
          None
        }
      }
      // a query that threw on ANY run is flagged on the result line —
      // min-of-times alone would read an intermittent crash as healthy
      val flag = if (threw) " FAILED" else ""
      val slow = if (io >= 0 && io < IoProbe.SlowMbps) " SLOW-IO" else ""
      println(f"BENCHSUBSET $name ${if (times.nonEmpty) times.min else 999.0}%.2f io=${io}%.0fMB/s$flag$slow")
      // release this query's localCheckpoint blocks before the next
      // one times: ContextCleaner frees them only after the RDD
      // objects are GC'd, and accumulated blocks from earlier heavy
      // queries have OOM'd (and skewed) later ones in the same JVM
      System.gc()
      (name, if (times.nonEmpty) times.min else 999.0, threw, io)
    }
    // durable machine-readable record, same shape as Bench's
    // target/bench.json (per-probe history survives log truncation)
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val io = results.map { case (k, _, _, m) =>
        "\"" + k + "\":" + BigDecimal(m).setScale(1,
          BigDecimal.RoundingMode.HALF_UP)
      }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, true, _) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val out = java.nio.file.Paths.get("target/bench-subset.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      (s"""{"queries":$qs,"io_mbps":$io,"failed":$failed,"sf":"$dir"}""" + "\n")
        .getBytes("UTF-8"))
    spark.stop()
  }
}
