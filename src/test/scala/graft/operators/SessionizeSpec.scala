package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  // (user, ts, eid, value) — user a has two sessions (gap 100 between
  // 30 and 200), user b one single-event session, user c a tie at ts 10
  private lazy val events = Seq(
    ("a", 10L, 1L, 1.0), ("a", 20L, 2L, 2.0), ("a", 30L, 3L, 3.0),
    ("a", 200L, 4L, 4.0), ("a", 250L, 5L, 5.0),
    ("b", 7L, 6L, 6.0),
    ("c", 10L, 8L, 8.0), ("c", 10L, 7L, 7.0))
    .toDF("u", "ts", "eid", "v")

  test("gap rule: sessions split where the gap exceeds the threshold") {
    val out = Sessionize.assign(events, $"u", $"ts", $"eid", gap = 100L)
      .select("u", "eid", "session")
      .as[(String, Long, Long)].collect().toSet
    assert(out == Set(
      ("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 1L), // gaps 10, 10
      ("a", 4L, 2L), ("a", 5L, 2L),                // 30 -> 200 breaks
      ("b", 6L, 1L),
      ("c", 7L, 1L), ("c", 8L, 1L)))               // tie stays one session
  }

  test("gap exactly equal to the threshold does NOT break the session") {
    val df = Seq(("a", 0L, 1L), ("a", 100L, 2L)).toDF("u", "ts", "eid")
    val sess = Sessionize.assign(df, $"u", $"ts", $"eid", gap = 100L)
      .select("session").as[Long].collect().toSet
    assert(sess == Set(1L))
  }

  test("rollup: start/end/count and extra aggregates per session") {
    val out = Sessionize.sessions(events, $"u", $"ts", $"eid", gap = 100L,
        extraAggs = Seq(sum($"v").as("v_sum")))
      .select("u", "session", "session_start", "session_end", "n_events", "v_sum")
      .as[(String, Long, Long, Long, Long, Double)].collect().toSet
    assert(out == Set(
      ("a", 1L, 10L, 30L, 3L, 6.0),
      ("a", 2L, 200L, 250L, 2L, 9.0),
      ("b", 1L, 7L, 7L, 1L, 6.0),
      ("c", 1L, 10L, 10L, 2L, 15.0)))
  }

  test("rollup reuses the window's exchange: exactly one shuffle") {
    val df = Sessionize.sessions(events, $"u", $"ts", $"eid", gap = 100L)
    val p = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 exchange, plan:\n$p")
  }
}
