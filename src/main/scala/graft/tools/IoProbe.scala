package graft.tools

/**
 * Buffered-write throughput probe — the BASELINE.md item-19 dd
 * protocol (`sync; dd if=/dev/zero bs=1M ...`) folded into the bench
 * harness: the box's buffered-write path is BIMODAL (~28 MB/s vs
 * ~2.8 GB/s within minutes, host-level writeback throttling), and
 * localCheckpoint/shuffle writes ride that path, so checkpoint-heavy
 * queries can read 2-9× their floors in a slow-state sample. Sampling
 * the state NEXT TO each timed query makes bench totals attributable:
 * a per-query `io_mbps` lands in the JSON artifact, and slow-state
 * samples get bounded re-runs once the state recovers.
 *
 * The `sync` first flushes the dirty backlog so the timed write sees
 * the CURRENT throttle state rather than inheriting credit; the write
 * itself goes through the page cache (no fsync) — exactly the path
 * Spark's local shuffle/checkpoint writes take.
 */
object IoProbe {
  /** One throughput sample in MB/s: sync, then `mb` MB of 1 MB
   * buffered writes to a temp file. Returns -1.0 if the probe itself
   * fails (read-only tmp, etc.) — never throws into the bench. */
  def sampleMbps(mb: Int = 32, dir: String = "/tmp"): Double =
    try {
      // bounded: in the throttled writeback mode a full sync can stall
      // for minutes, and a probe that stalls IS the answer (slow) —
      // the timed 1 MB writes will read the throttle either way
      try {
        val p = new ProcessBuilder("sync").start()
        if (!p.waitFor(10, java.util.concurrent.TimeUnit.SECONDS))
          p.destroy()
      } catch { case _: Throwable => () }
      val f = java.io.File.createTempFile("graft-ioprobe", ".bin",
        new java.io.File(dir))
      try {
        val buf = new Array[Byte](1 << 20)
        java.util.Arrays.fill(buf, 0x5a.toByte)
        val out = new java.io.FileOutputStream(f)
        val t0 = System.nanoTime()
        try { var i = 0; while (i < mb) { out.write(buf); i += 1 } }
        finally out.close()
        mb / ((System.nanoTime() - t0) / 1e9)
      } finally { f.delete(); () }
    } catch { case _: Throwable => -1.0 }

  /** The slow-state cut: the two modes sit at ~28 MB/s and ~2.8 GB/s
   * (direct I/O steady ~440), so anything under 300 MB/s is the
   * throttled mode, not noise. */
  val SlowMbps = 300.0
}
