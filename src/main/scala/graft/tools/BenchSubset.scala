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
 *
 * SAMPLE HYGIENE, automated (the r14/r15 floors were hand-filtered):
 * two contamination modes get detected and re-run in-harness —
 *  - SLOW-IO: the box's bimodal buffered-write throttling, probed
 *    next to each sample ([[IoProbe]]); samples probed slow re-run
 *    once the state reads fast (bounded passes), [[graft.Bench]]'s
 *    io_reruns discipline.
 *  - CHECKPOINT RESIDUE: earlier heavy queries' localCheckpoint
 *    blocks stay pinned until their RDD objects are GC'd and the
 *    ContextCleaner drains them; a later sample timed over hundreds
 *    of MB of standing blocks reads up to 1.5× high (BASELINE items
 *    23/29). Before each query the harness DRAINS (gc + bounded
 *    cleaner wait) until executor storage memory falls under
 *    [[ResidueBytes]]; a sample that still timed over the threshold
 *    is flagged and re-run after a final drain. The shared gate
 *    caches (clusters/verdicts frames) are deliberately small and
 *    sit below the threshold — draining never evicts them.
 *
 * As of r17 the detection/drain mechanics live in [[SampleHygiene]],
 * shared with the official [[graft.Bench]] main; this tool remains
 * the arbitrary-SF / arbitrary-subset floors harness. The recorded
 * io/residue always describe whichever sample produced the STANDING
 * min (r16 ADVICE: a state field overwritten by a later, slower
 * sample stops describing the recorded time).
 */
object BenchSubset {

  /** See [[SampleHygiene.ResidueBytes]]. */
  val ResidueBytes: Long = SampleHygiene.ResidueBytes

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
    case class R(name: String, sec: Double, threw: Boolean, io: Double,
      residue: Long, reruns: Int)
    def sampleQuery(name: String): SampleHygiene.Sample =
      SampleHygiene.measure(spark, 3) {
        graft.SparkEntry.queries(name)(spark, dir).count(); ()
      }
    var results = names.map { name =>
      val fn = graft.SparkEntry.queries(name)
      try fn(spark, warmDir).count()
      catch { case _: Throwable => () }
      // SampleHygiene.measure drains residue BEFORE sampling (earlier
      // queries' checkpoint blocks must not bill this one) and probes
      // the io state next to the measurement
      val s = sampleQuery(name)
      R(name, s.sec, s.threw, s.io, s.residue, 0)
    }
    // bounded contaminated-sample retry: re-run queries whose sample
    // was taken in a slow-io OR residue-laden state, once the state
    // clears; the min across samples stands (a contaminated sample
    // only ever reads HIGH) and io/residue follow the standing-min
    // sample so the emitted JSON stays self-describing
    def contaminated(r: R): Boolean =
      SampleHygiene.contaminated(r.io, r.residue)
    var pass = 0
    while (pass < 2 && results.exists(contaminated)) {
      results = results.map { r =>
        if (!contaminated(r)) r
        else {
          val residue2 = SampleHygiene.drainResidue(spark)
          val io2 = IoProbe.sampleMbps()
          if (SampleHygiene.contaminated(io2, residue2)) r // still bad
          else {
            val s2 = sampleQuery(r.name)
            if (s2.sec <= r.sec)
              R(r.name, s2.sec, r.threw || s2.threw, s2.io, s2.residue,
                r.reruns + 1)
            else // old (contaminated) sample stands: keep ITS state
              r.copy(threw = r.threw || s2.threw, reruns = r.reruns + 1)
          }
        }
      }
      pass += 1
    }
    results.foreach { r =>
      val flag = if (r.threw) " FAILED" else ""
      val slow = if (r.io >= 0 && r.io < IoProbe.SlowMbps) " SLOW-IO" else ""
      val res = if (r.residue > ResidueBytes)
        f" RESIDUE=${r.residue / (1024 * 1024)}%dMB" else ""
      val rr = if (r.reruns > 0) s" reruns=${r.reruns}" else ""
      println(f"BENCHSUBSET ${r.name} ${r.sec}%.2f io=${r.io}%.0fMB/s$flag$slow$res$rr")
    }
    // durable machine-readable record, same shape as Bench's
    // target/bench.json (per-probe history survives log truncation)
    val qs = results.map(r => "\"" + r.name + "\":" + r.sec)
      .mkString("{", ",", "}")
    val io = results.map(r =>
        "\"" + r.name + "\":" + BigDecimal(r.io).setScale(1,
          BigDecimal.RoundingMode.HALF_UP))
      .mkString("{", ",", "}")
    val res = results.map(r =>
        "\"" + r.name + "\":" + (r.residue / (1024 * 1024)))
      .mkString("{", ",", "}")
    val failed = results.collect { case r if r.threw => "\"" + r.name + "\"" }
      .mkString("[", ",", "]")
    val dirty = results.collect { case r if contaminated(r) =>
      "\"" + r.name + "\"" }.mkString("[", ",", "]")
    val reruns = results.map(_.reruns).sum
    val out = java.nio.file.Paths.get("target/bench-subset.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      (s"""{"queries":$qs,"io_mbps":$io,"residue_mb":$res,"failed":$failed,""" +
        s""""contaminated":$dirty,"state_reruns":$reruns,"sf":"$dir"}""" +
        "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
