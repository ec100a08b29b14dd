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

  test("one event-level exchange: window and distinct share the partitioning") {
    val events = Seq((1L, 0L)).toDF("user_id", "ts")
    val plan = Retention.matrix(events, $"user_id", $"ts", periodUs = 10L)
      .queryExecution.executedPlan.toString
    // exchanges: user window; (u, cohort, offset) distinct; final
    // (cohort, offset) rollup — the event stream itself crosses once
    assert(plan.sliding(8).count(_ == "Exchange") <= 3, plan)
  }
}
