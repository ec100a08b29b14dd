package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("view", "click", "purchase")

  private def reach(rows: Seq[(Long, Long, String)]) =
    Funnel.stepReach(rows.toDF("user_id", "ts", "et"),
        $"user_id", $"ts", $"et", steps)
      .as[(Long, Int, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> r).toMap

  test("depth counts only in-order steps") {
    val r = reach(Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (2L, 10L, "click"), (2L, 20L, "view"), (2L, 30L, "click"),
      (3L, 10L, "purchase"), (3L, 20L, "view"),
      (4L, 10L, "error")))
    assert(r(1L) == ((1L, 3, Some(10L), Some(20L))))
    // user 2: click before any view doesn't count; the later one does
    assert(r(2L) == ((2L, 2, Some(20L), None)))
    // user 3: purchase precedes the view — depth 1, no conversion
    assert(r(3L) == ((3L, 1, Some(20L), None)))
    assert(r(4L) == ((4L, 0, None, None)))
  }

  test("earliest qualifying occurrence wins, not the first of a type") {
    // the user's first click is pre-view; convert time measures from
    // the FIRST view even though a later view also precedes the click
    val r = reach(Seq(
      (1L, 5L, "click"), (1L, 10L, "view"), (1L, 12L, "view"),
      (1L, 20L, "click"), (1L, 40L, "purchase")))
    assert(r(1L) == ((1L, 3, Some(10L), Some(30L))))
  }

  test("equal timestamps chain within the tie") {
    // all three steps at the same instant complete the funnel: the
    // RANGE frame sees same-ts peers regardless of within-tie order
    val r = reach(Seq(
      (1L, 10L, "view"), (1L, 10L, "click"), (1L, 10L, "purchase")))
    assert(r(1L) == ((1L, 3, Some(10L), Some(0L))))
  }

  test("within-deadline anchors at the first view") {
    val rows = Seq(
      // u1 converts inside the window; u2's purchase misses it; u3's
      // SECOND view would be in time, but the anchor is the FIRST view
      (1L, 10L, "view"), (1L, 15L, "click"), (1L, 19L, "purchase"),
      (2L, 10L, "view"), (2L, 15L, "click"), (2L, 25L, "purchase"),
      (3L, 0L, "view"), (3L, 30L, "view"), (3L, 35L, "click"))
      .toDF("user_id", "ts", "et")
    val r = Funnel.stepReach(rows, $"user_id", $"ts", $"et", steps,
        within = Some(10L))
      .as[(Long, Int, Option[Long], Option[Long])].collect()
      .map(x => x._1 -> x).toMap
    assert(r(1L) == ((1L, 3, Some(10L), Some(9L))))
    assert(r(2L) == ((2L, 2, Some(10L), None)))
    assert(r(3L) == ((3L, 1, Some(0L), None)))
  }

  test("topPaths truncates per user and counts identical journeys") {
    val rows = Seq(
      (1L, 10L, "view", 1L), (1L, 20L, "click", 2L), (1L, 30L, "purchase", 3L),
      (2L, 5L, "view", 4L), (2L, 6L, "click", 5L), (2L, 7L, "purchase", 6L),
      (3L, 1L, "view", 7L), (3L, 2L, "view", 8L), (3L, 3L, "view", 9L),
      (3L, 4L, "view", 10L)) // 4th event falls past maxSteps=3
      .toDF("user_id", "ts", "et", "event_id")
    val out = Funnel.topPaths(rows, $"user_id", $"ts", $"et", $"event_id",
        maxSteps = 3, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("view>click>purchase", 2L), ("view>view>view", 1L)))
    // truncation must be the map-side group-limit shape
    val plan = Funnel.topPaths(rows, $"user_id", $"ts", $"et", $"event_id",
        maxSteps = 3, k = 10).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("one exchange total: windows and rollup share the partitioning") {
    val df = Seq((1L, 10L, "view")).toDF("user_id", "ts", "et")
    val plan = Funnel.stepReach(df, $"user_id", $"ts", $"et", steps)
      .queryExecution.executedPlan.toString
    assert(plan.sliding(8).count(_ == "Exchange") == 1, plan)
  }

  test("linearAttribution splits credit equally inside the lookback") {
    import org.apache.spark.sql.functions.col
    // user 1 converts at t=100 with touches a@90, b@95 (half credit
    // each); user 2 converts at t=100 with ONE touch a@99; user 1's
    // a@10 is outside the 50-unit lookback; user 3 never converts
    val touches = Seq((1L, 10L, "a"), (1L, 90L, "a"), (1L, 95L, "b"),
      (2L, 99L, "a"), (3L, 98L, "b")).toDF("u", "ts", "ch")
    val convs = Seq((1L, 100L), (2L, 100L)).toDF("u", "ts")
    val got = Funnel.linearAttribution(touches, convs,
        col("u"), col("ts"), col("ch"), col("ts"), lookbackUs = 50L)
      .orderBy("channel")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq == Seq(("a", 2L, 2L, 1.5), ("b", 1L, 1L, 0.5)))
  }

  test("positionAttribution: U-shape 40/20/40; degenerate 1 and 2 sets") {
    import org.apache.spark.sql.functions.col
    // user 1: four touches a,b,b,c → a 0.4, b 0.1+0.1, c 0.4
    // user 2: single touch d → 1.0 ; user 3: two touches d,e → 0.5 each
    val touches = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "b"),
      (1L, 4L, 4L, "c"),
      (2L, 1L, 5L, "d"), (3L, 1L, 6L, "d"), (3L, 2L, 7L, "e"))
      .toDF("u", "ts", "id", "ch")
    val convs = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("u", "ts")
    val got = Funnel.positionAttribution(touches, convs,
        col("u"), col("ts"), col("id"), col("ch"), col("ts"),
        lookbackUs = 10L)
      .orderBy("channel")
      .collect().map(r => (r.getString(0), r.getDouble(3)))
    assert(got.toSeq == Seq(("a", 0.4), ("b", 0.2), ("c", 0.4),
      ("d", 1.5), ("e", 0.5)))
  }

  test("timeDecayAttribution: recency wins; shares renormalize exactly") {
    import org.apache.spark.sql.functions.col
    // touch a one half-life before the conversion (weight 500000),
    // touch b at the conversion instant (weight 1000000): b takes
    // 2/3 of the credit, a 1/3 — by exact integer division
    val touches = Seq((1L, 0L, "a"), (1L, 10L, "b")).toDF("u", "ts", "ch")
    val convs = Seq((1L, 10L)).toDF("u", "ts")
    val got = Funnel.timeDecayAttribution(touches, convs,
        col("u"), col("ts"), col("ch"), col("ts"),
        lookbackUs = 100L, halfLifeUs = 10L)
      .orderBy("channel")
      .collect().map(r => (r.getString(0), r.getDouble(3)))
    // a: 500000·1e6 div 1500000 = 333333 ppm; b: 666666 ppm
    assert(got.toSeq == Seq(("a", 0.333333), ("b", 0.666666)))
  }

  test("attribution: duplicate (key, ts) conversions each get full credit") {
    import org.apache.spark.sql.functions.col
    // at-least-once upstream: the same purchase row delivered twice —
    // each copy is a conversion, so channel credit DOUBLES (a naive
    // (key, ts) grouping would merge them and halve every share)
    val touches = Seq((1L, 90L, 1L, "a"), (1L, 95L, 2L, "b"))
      .toDF("u", "ts", "id", "ch")
    val convs = Seq((1L, 100L), (1L, 100L)).toDF("u", "ts")
    val lin = Funnel.linearAttribution(touches, convs,
        col("u"), col("ts"), col("ch"), col("ts"), lookbackUs = 50L)
      .orderBy("channel")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    assert(lin.toSeq == Seq(("a", 2L, 1.0), ("b", 2L, 1.0)))
    val pos = Funnel.positionAttribution(touches, convs,
        col("u"), col("ts"), col("id"), col("ch"), col("ts"),
        lookbackUs = 50L)
      .orderBy("channel")
      .collect().map(r => (r.getString(0), r.getDouble(3)))
    assert(pos.toSeq == Seq(("a", 1.0), ("b", 1.0))) // 0.5 × 2 convs each
  }

  test("linearAttribution floors: three-way split loses only dust") {
    import org.apache.spark.sql.functions.col
    val touches = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"))
      .toDF("u", "ts", "ch")
    val convs = Seq((1L, 4L)).toDF("u", "ts")
    val got = Funnel.linearAttribution(touches, convs,
        col("u"), col("ts"), col("ch"), col("ts"), lookbackUs = 10L)
      .collect().map(_.getDouble(3))
    // 10^6 div 3 = 333333 ppm each → 0.333333, total 0.999999
    assert(got.toSeq.forall(_ == 0.333333))
  }
}
