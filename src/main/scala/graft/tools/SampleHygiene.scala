package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Shared bench-sample hygiene (BASELINE items 19/23/29/37): the two
 * contamination modes that make a timed sample read high on this box,
 * detected and drained in-harness so the recorded floor is a
 * like-for-like measurement of the PLAN, not of box state.
 *
 *  - SLOW-IO: the buffered-write path is bimodal (~28 MB/s throttled
 *    vs ~2.8 GB/s); shuffle/checkpoint writes ride it. Probed next to
 *    each sample via [[IoProbe.sampleMbps]].
 *  - CHECKPOINT RESIDUE: earlier queries' localCheckpoint blocks stay
 *    pinned until their RDDs are GC'd and the ContextCleaner drains
 *    them; a sample timed over hundreds of MB of standing blocks reads
 *    up to 1.5× high. [[drainResidue]] gc+waits (bounded) until
 *    executor storage falls under [[ResidueBytes]].
 *
 * Used by both the official [[graft.Bench]] full-suite main and the
 * [[BenchSubset]] floors tool, so the driver's per-round record and
 * the BASELINE floor runs carry the same discipline (the r16 driver
 * record was ~1.36× uniformly inflated precisely because this lived
 * only in BenchSubset).
 */
object SampleHygiene {

  /** Storage-memory level above which a sample is residue-
   * contaminated: the intentional cross-query caches are a few MB;
   * heavy queries leave 10²-10³ MB. */
  val ResidueBytes: Long = 256L * 1024 * 1024

  def storageBytes(spark: SparkSession): Long =
    spark.sparkContext.statusTracker.getExecutorInfos
      .map(e => e.usedOnHeapStorageMemory() + e.usedOffHeapStorageMemory())
      .sum

  /** gc + wait for the ContextCleaner to drop unreferenced
   * checkpoint blocks, bounded; returns the residual bytes. */
  def drainResidue(spark: SparkSession): Long = {
    var tries = 0
    var b = storageBytes(spark)
    while (b > ResidueBytes && tries < 6) {
      System.gc()
      Thread.sleep(500)
      b = storageBytes(spark)
      tries += 1
    }
    b
  }

  /** One measured sample: the best-of-`runs` seconds for the query,
   * whether any run threw, and the io/residue state it was taken
   * under. `residue`/`io` describe THIS sample — callers keeping a
   * min across samples must keep the state of whichever sample
   * produced the standing min (ADVICE r16: a state field overwritten
   * by a later, slower sample stops describing the recorded time). */
  final case class Sample(sec: Double, threw: Boolean, io: Double,
    residue: Long)

  def contaminated(io: Double, residue: Long): Boolean =
    (io >= 0 && io < IoProbe.SlowMbps) || residue > ResidueBytes

  /** Drain, probe, then time `runs` back-to-back executions of `fn`
   * (min is the estimator; a thrown run is tracked separately so an
   * intermittent crash can't read as healthy). */
  def measure(spark: SparkSession, runs: Int)(fn: => Unit): Sample = {
    val residue = drainResidue(spark)
    val io = IoProbe.sampleMbps()
    var threw = false
    val times = (1 to runs).flatMap { _ =>
      val t0 = System.nanoTime()
      try { fn; Some((System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable =>
        System.err.println(s"[bench] run failed: ${e.getMessage}")
        threw = true
        None
      }
    }
    Sample(if (times.nonEmpty) times.min else 999.0, threw, io, residue)
  }
}
