package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization over an event stream: a session is a
 * maximal run of a key's events where consecutive gaps never exceed
 * `gap` time units — the canonical event-pipeline rollup (user
 * sessions, device bursts, request traces) the reference's per-key
 * range scans feed one key at a time (seriesly queries one db/series
 * per request, `query.go:54`; sessionizing N users there is N
 * requests — here it is one distributed pass over all keys).
 *
 * Scale shape: ONE hash exchange on `key` total. [[assign]] is a
 * per-key window (lag + running sum of session-break flags);
 * [[sessions]]' rollup groups by (key, session), and because the
 * group keys extend the window's partition keys, Catalyst's
 * EnsureRequirements reuses the exchange — the aggregation adds no
 * second shuffle (asserted in SessionizeSpec's plan test).
 *
 * Skew contract: a key's whole history flows through one task (any
 * engine's per-key ordered pass does). Keys are users/devices —
 * cardinality grows with the corpus and per-key volume is bounded in
 * practice; for pathological hot keys (bots), pre-split the key by
 * coarse time (day) upstream, or use the streaming variant
 * (graft.streaming.SeriesStream.sessionize) whose state is bounded by
 * the watermark regardless of key volume.
 */
object Sessionize {

  /**
   * Assign a session index per key: sessions number 1, 2, … in `ts`
   * order within each key. A new session starts at a key's first
   * event and whenever `ts - previous ts > gap` (gap in the same
   * units as `ts`; ties and out-of-order duplicates order
   * deterministically by the `ord` tie-break column).
   */
  def assign(df: DataFrame, key: Column, ts: Column, ord: Column,
      gap: Long): DataFrame = {
    require(gap >= 0, "gap must be >= 0")
    val w = Window.partitionBy(key).orderBy(ts, ord)
    val prev = lag(ts, 1).over(w)
    val isBreak = when(prev.isNull || ts - prev > lit(gap), lit(1L))
      .otherwise(lit(0L))
    df.withColumn("session",
      sum(isBreak).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /**
   * Per-session rollup: start/end timestamps, event count, and the
   * caller's extra aggregates (e.g. a value sum). Reuses [[assign]]'s
   * exchange — see the class doc.
   */
  def sessions(df: DataFrame, key: Column, ts: Column, ord: Column,
      gap: Long, extraAggs: Seq[Column] = Nil): DataFrame = {
    val base = Seq(
      min(ts).as("session_start"),
      max(ts).as("session_end"),
      count(lit(1)).as("n_events"))
    assign(df, key, ts, ord, gap)
      .groupBy(key, col("session"))
      .agg(base.head, (base.tail ++ extraAggs): _*)
  }
}
