package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Cohort retention analysis: bucket every user by their FIRST-seen
 * period (the cohort), then count how many of each cohort are still
 * active `k` periods later — the (cohort, offset) → users matrix
 * behind every retention curve. The events-side complement of the
 * funnel: the funnel asks "how deep", retention asks "how long".
 *
 * Scale shape: the cohort assignment is a per-user running `min` over
 * ONE (user) exchange (window, not a self-join back onto the event
 * stream); activity collapses to distinct (user, period) INSIDE that
 * same exchange via a per-partition-key distinct aggregate, and the
 * final matrix is a |cohorts|·|offsets|-bounded count-distinct whose
 * shuffle carries (cohort, offset, user) triples already deduplicated
 * map-side. No event-level data crosses a second exchange.
 */
object Retention {

  /**
   * Cumulative distinct users to date — the total-audience growth
   * curve ("how many identities have we EVER seen, by period"),
   * computed exactly without any per-period giant distinct: each
   * user contributes once at their first-seen period
   * ([[newVsReturning]]'s frame), and a running sum over the
   * #periods-sized rollup (one bounded window) accumulates the curve.
   * Periods with no NEW users still appear when they had activity
   * (joined from the per-period activity frame) with the carried
   * total.
   */
  def cumulativeUsers(events: DataFrame, user: Column,
      period: Column): DataFrame = {
    val pu = events.filter(user.isNotNull)
      .select(period.as("period_ms"), user.as("__u")).distinct()
    val firsts = pu.groupBy(col("__u")).agg(min(col("period_ms")).as("__f"))
      .groupBy(col("__f").as("period_ms")).agg(count(lit(1)).as("n_new"))
    val periods = pu.select(col("period_ms")).distinct()
    periods.join(firsts, Seq("period_ms"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("n_total", sum(col("n_new")).over(
        Window.orderBy(col("period_ms"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /**
   * New-vs-returning split per period — the growth-accounting
   * companion to [[rollingActive]]: for every period, how many
   * distinct actives appear for the FIRST time ever (`n_new`) vs have
   * history (`n_returning`). Exact (no sketch): the per-user first
   * period is one map-side-combined `min` over the deduped
   * (period, user) frame, joined back on user — every exchange is
   * bounded by distinct (period, user) pairs, never raw event volume.
   *
   * `period` is the caller's bucket expression (epoch-ms day/week);
   * null users are excluded (they are no identity to track).
   */
  def newVsReturning(events: DataFrame, user: Column,
      period: Column): DataFrame = {
    val pu = events.filter(user.isNotNull)
      .select(period.as("period_ms"), user.as("__u")).distinct()
    val first = pu.groupBy(col("__u")).agg(min(col("period_ms")).as("__f"))
    pu.join(first, "__u")
      .groupBy(col("period_ms"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("period_ms") === col("__f"), 1L).otherwise(0L))
          .as("n_new"))
      .withColumn("n_returning", col("n_active") - col("n_new"))
  }

  /**
   * `user`/`ts` columns over an event frame; `periodUs` the cohort
   * granularity in the `ts` unit (e.g. 86400e6 µs for daily).
   * Output: (cohort, offset, users) — `cohort` the first-activity
   * period index, `offset ≥ 0` periods since the cohort period,
   * `users` distinct active users.
   */
  def matrix(df: DataFrame, user: Column, ts: Column,
      periodUs: Long): DataFrame = {
    require(periodUs > 0, "periodUs must be positive")
    // integer division (graft.functions.ldiv): double division would
    // lose precision past 2^53 — epoch-ns timestamps live there
    val per = df.select(user.as("u"),
      graft.functions.ldiv(ts.cast("long"), periodUs).as("p"))
    val w = Window.partitionBy(col("u"))
    per
      .withColumn("cohort", min(col("p")).over(w))
      .select(col("u"), col("cohort"), (col("p") - col("cohort")).as("offset"))
      .distinct()
      .groupBy(col("cohort"), col("offset"))
      .agg(count(lit(1)).as("users"))
  }

  /**
   * Rolling active users: for every period, the distinct users active
   * in the trailing `windowPeriods`-period window — DAU at window 1,
   * WAU at 7, MAU at 30. Exact, not sketched.
   *
   * The scale trick: a naive per-window `count(distinct)` re-scans
   * `windowPeriods` days of events per output row. Instead activity
   * first collapses to distinct (user, period) — map-side combined,
   * the only event-sized shuffle — and each active period then
   * CONTRIBUTES ITSELF to the `windowPeriods` windows it falls in via
   * a bounded `sequence` explode (fan-out = window length, a
   * constant), deduped per (user, window) and rolled up. Every stage
   * is bounded by (active pairs) × window — independent of per-user
   * event volume.
   */
  def rollingActive(df: DataFrame, user: Column, ts: Column,
      periodUs: Long, windowPeriods: Int): DataFrame = {
    require(periodUs > 0, "periodUs must be positive")
    require(windowPeriods >= 1, "windowPeriods must be >= 1")
    df.select(user.as("u"),
        graft.functions.ldiv(ts.cast("long"), periodUs).as("p"))
      .distinct()
      .select(col("u"),
        explode(sequence(col("p"), col("p") + (windowPeriods - 1))).as("w"))
      .distinct()
      .groupBy(col("w").as("period"))
      .agg(count(lit(1)).as("active_users"))
  }

  /**
   * Rolling value aggregate: per period, the `value` total over the
   * trailing `windowPeriods` periods (trailing 7-day revenue, 30-day
   * event volume). Unlike [[rollingActive]] there is no cross-period
   * distinct, so the corpus collapses FIRST to one row per period
   * (map-side combined, DECIMAL so the sum is order-free) and the
   * trailing window runs over that tiny frame — a RANGE window over
   * #periods rows, not events. The RANGE frame also handles gaps:
   * an empty period contributes nothing, but periods bounding it
   * still see the right trailing total.
   *
   * Emitted periods are those with ≥1 event (gap periods have no row;
   * callers wanting a dense axis join against a generated range).
   */
  def rollingSum(df: DataFrame, ts: Column, value: Column,
      periodUs: Long, windowPeriods: Int): DataFrame = {
    require(periodUs > 0, "periodUs must be positive")
    require(windowPeriods >= 1, "windowPeriods must be >= 1")
    val daily = df.select(
        graft.functions.ldiv(ts.cast("long"), periodUs).as("period"),
        value.cast("decimal(38,6)").as("v"))
      .groupBy(col("period")).agg(sum(col("v")).as("pv"))
    daily
      .withColumn("rolling_value",
        sum(col("pv")).over(Window.orderBy(col("period"))
          .rangeBetween(-(windowPeriods - 1).toLong, Window.currentRow))
          .cast("double"))
      .select(col("period"), col("pv").cast("double").as("period_value"),
        col("rolling_value"))
  }
}
