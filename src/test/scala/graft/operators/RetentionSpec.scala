package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetentionSpec extends SparkSpec {
  import spark.implicits._

  test("matrix buckets users by first-seen period and counts offsets once") {
    // period 10: u1 first at p0, active p0/p1/p3 (day 31 dedups with
    // 30); u2 first at p1, active p1 only; u3 first at p0, active p0/p1
    val events = Seq(
      (1L, 0L), (1L, 5L), (1L, 12L), (1L, 30L), (1L, 31L),
      (2L, 15L),
      (3L, 9L), (3L, 19L)).toDF("user_id", "ts")
    val out = Retention.matrix(events, $"user_id", $"ts", periodUs = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (0L, 0L) -> 2L,   // u1, u3 in cohort 0 at offset 0
      (0L, 1L) -> 2L,   // both active the next period
      (0L, 3L) -> 1L,   // only u1 reaches offset 3 (counted once)
      (1L, 0L) -> 1L))  // u2's own cohort
  }

  test("newVsReturning splits each period's actives by first-ever " +
      "appearance; duplicate events collapse; null users drop") {
    val events = Seq(
      (Some(1L), 0L), (Some(1L), 5L),          // u1 day 0 (twice)
      (Some(2L), 3L),                          // u2 day 0
      (Some(1L), 12L), (Some(3L), 15L),        // day 1: u1 back, u3 new
      (Some(2L), 25L),                         // day 2: u2 back
      (None, 14L))                             // anonymous — dropped
      .toDF("user_id", "ts")
    val got = Retention.newVsReturning(events, $"user_id",
        graft.functions.ldiv($"ts", 10L) * 10L)
      .orderBy("period_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0L, 2L, 2L, 0L), (10L, 2L, 1L, 1L), (20L, 1L, 0L, 1L)))
  }

  test("cumulativeUsers: running audience total; active-but-no-new " +
      "periods carry the total") {
    val events = Seq(
      (1L, 0L), (2L, 3L),                 // p0: u1, u2 new
      (1L, 12L),                          // p1: activity, nothing new
      (3L, 25L), (1L, 27L))               // p2: u3 new
      .toDF("user_id", "ts")
    val got = Retention.cumulativeUsers(events, $"user_id",
        graft.functions.ldiv($"ts", 10L) * 10L)
      .orderBy("period_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 2L, 2L), (10L, 0L, 2L), (20L, 1L, 3L)))
  }

  test("rollingActive counts trailing-window distinct users exactly") {
    // period 10, window 3: u1 active p0 and p2; u2 active p0 only.
    // windows: p0 {u1,u2}=2, p1 {u1,u2}=2 (trailing), p2 {u1,u2}=2,
    // p3 {u1}=1 (u2's p0 aged out), p4 {u1}=1
    val events = Seq(
      (1L, 0L), (1L, 5L), (1L, 25L),
      (2L, 9L)).toDF("user_id", "ts")
    val out = Retention.rollingActive(events, $"user_id", $"ts",
        periodUs = 10L, windowPeriods = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 2L, 1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
    // heavy per-user volume cannot inflate any stage: same answer,
    // same bounded fan-out, with u1's day-0 events duplicated 50×
    val heavy = events.union(
      (1 to 50).map(_ => (1L, 3L)).toDF("user_id", "ts"))
    val out2 = Retention.rollingActive(heavy, $"user_id", $"ts",
        periodUs = 10L, windowPeriods = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out2 == out)
  }

  test("rollingSum handles gap periods through the RANGE frame") {
    // period 10, window 3: values on p0 (5), p1 (2), p3 (4) — p2 empty
    val events = Seq((0L, 5.0), (5L, 0.0), (12L, 2.0), (30L, 4.0))
      .toDF("ts", "value")
    val out = Retention.rollingSum(events, $"ts", $"value",
        periodUs = 10L, windowPeriods = 3)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(out == Map(
      0L -> ((5.0, 5.0)),
      1L -> ((2.0, 7.0)),
      // p3's trailing window is {p1, p2, p3}: p0 aged out, p2 empty
      3L -> ((4.0, 6.0))))
  }

  test("one event-level exchange: window and distinct share the partitioning") {
    val events = Seq((1L, 0L)).toDF("user_id", "ts")
    val plan = Retention.matrix(events, $"user_id", $"ts", periodUs = 10L)
      .queryExecution.executedPlan.toString
    // exchanges: user window; (u, cohort, offset) distinct; final
    // (cohort, offset) rollup — the event stream itself crosses once
    assert(plan.sliding(8).count(_ == "Exchange") <= 3, plan)
  }
}
