package graft.sources

import org.apache.spark.sql.SparkSession

import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}
import scala.concurrent.duration.Duration

/** Raised when a query exceeds its deadline — the engine's analog of
 * the reference's `errTimeout` (query.go:17). */
class QueryTimeoutException(timeout: Duration)
  extends RuntimeException(s"query timed out after $timeout")

/**
 * Query deadline enforcement (reference: `-maxQueryTime`,
 * main.go:31-32). The reference stamps each query with a `before`
 * deadline; the executor refuses work that is already late
 * (query.go:301-310) and document processors stop past-deadline
 * processing (query.go:219-227). Spark's unit of cancellation is the
 * JOB GROUP: every job a query submits — including the per-partition
 * jobs a streaming `toLocalIterator` consumer triggers lazily — runs
 * in one group, and a driver-side timer cancels the group (tasks
 * interrupted) when the deadline passes. One runaway `_query` can no
 * longer occupy the cluster.
 */
object QueryDeadline {

  private lazy val timer = Executors.newSingleThreadScheduledExecutor(r => {
    val t = new Thread(r, "graft-query-deadline")
    t.setDaemon(true)
    t
  })
  private val seq = new AtomicLong(0L)

  /** In-flight deadline scopes, for the `/_debug/open` introspection
   * surface (the reference lists its open couchstore handles with the
   * opening stack — debug.go:58-67; the Spark-side analog of an open
   * handle is a live query scope and its job group). */
  private val active =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()
  def activeScopes(): Map[String, (String, Long)] = {
    val b = Map.newBuilder[String, (String, Long)]
    active.forEach((k, v) => b += k -> v)
    b.result()
  }

  /** Runs `body` — which must both build AND consume its Spark actions
   * on this thread (job groups are thread-local) — under `timeout`.
   * Infinite timeout runs unguarded; a non-positive one is refused up
   * front, mirroring the reference's already-late pre-check. */
  def run[T](spark: SparkSession, timeout: Duration, desc: String)(body: => T): T = {
    if (!timeout.isFinite) return body
    if (timeout.toMillis <= 0) throw new QueryTimeoutException(timeout)
    val sc = spark.sparkContext
    val group = s"graft-deadline-${seq.incrementAndGet()}"
    val fired = new AtomicBoolean(false)
    sc.setJobGroup(group, desc, interruptOnCancel = true)
    // re-fires until the scope exits: cancelJobGroup only reaches jobs
    // active at that instant, and a query may still be in driver-side
    // planning/codegen when the deadline passes — its jobs submit late
    // and would otherwise run unbounded
    val cancel = timer.scheduleWithFixedDelay(new Runnable {
      def run(): Unit = { fired.set(true); sc.cancelJobGroup(group) }
    }, timeout.toMillis, 250L, TimeUnit.MILLISECONDS)
    active.put(group, (desc, System.currentTimeMillis()))
    try body
    catch {
      // the cancelled jobs surface as SparkException("... cancelled ...");
      // report the CAUSE (deadline) rather than the mechanism
      case _: Throwable if fired.get() => throw new QueryTimeoutException(timeout)
    } finally {
      active.remove(group)
      cancel.cancel(false)
      sc.clearJobGroup()
    }
  }
}
