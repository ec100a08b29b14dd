package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // points: (key, pt, pid); intervals: (key, lo, hi, iid)
  private lazy val points = Seq(
    ("a", 5L, 1L), ("a", 10L, 2L), ("a", 25L, 3L), ("a", 40L, 4L),
    ("b", 10L, 5L), ("c", 7L, 6L))
    .toDF("k", "pt", "pid")
  private lazy val intervals = Seq(
    ("a", 5L, 25L, 10L),   // spans 3 width-10 buckets; closed both ends
    ("a", 26L, 30L, 11L),  // empty of points
    ("b", 0L, 100L, 12L),  // spans 11 buckets, catches one point
    ("d", 0L, 50L, 13L))   // key with no points
    .toDF("k", "lo", "hi", "iid")

  private def joined = RangeJoin.pointInInterval(
    points, "pt", intervals, "lo", "hi", on = Seq("k"), width = 10L)

  test("matches exactly the BETWEEN pairs, closed at both ends") {
    val got = joined.select("iid", "pid").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 1L), (10L, 2L), (10L, 3L), (12L, 5L)))
  }

  test("no duplicate pairs despite multi-bucket intervals") {
    val n = joined.count()
    assert(n == joined.select("iid", "pid").distinct().count())
  }

  test("interval wider than many buckets still meets each point once") {
    val p = Seq(("x", 55L, 1L)).toDF("k", "pt", "pid")
    val iv = Seq(("x", 0L, 1000L, 9L)).toDF("k", "lo", "hi", "iid")
    val out = RangeJoin.pointInInterval(p, "pt", iv, "lo", "hi", Seq("k"), 10L)
    assert(out.count() == 1)
  }

  test("degenerate and inverted intervals") {
    val p = Seq(("x", 7L, 1L)).toDF("k", "pt", "pid")
    val iv = Seq(("x", 7L, 7L, 1L), ("x", 9L, 2L, 2L)).toDF("k", "lo", "hi", "iid")
    val out = RangeJoin.pointInInterval(p, "pt", iv, "lo", "hi", Seq("k"), 10L)
      .select("iid").as[Long].collect().toSeq
    assert(out == Seq(1L)) // point interval matches; inverted drops
  }

  test("plan is an equi-join: no nested loop, no cartesian product") {
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  // intervalOverlap: left (lid, s1, e1) vs right (rid, s2, e2)
  private lazy val ivA = Seq(
    (1L, 0L, 35L),    // spans 4 width-10 buckets
    (2L, 50L, 55L),
    (3L, 90L, 90L))   // degenerate point-interval
    .toDF("lid", "s1", "e1")
  private lazy val ivB = Seq(
    (10L, 30L, 60L),  // overlaps 1 (at 30..35) and 2 (50..55)
    (11L, 36L, 49L),  // gap between 1 and 2 — overlaps neither
    (12L, 90L, 95L),  // closed-boundary touch with 3
    (13L, 200L, 300L))
    .toDF("rid", "s2", "e2")

  private def overlapped = RangeJoin.intervalOverlap(
    ivA, "s1", "e1", ivB, "s2", "e2", on = Nil, width = 10L)

  test("intervalOverlap: exact closed-interval overlap pairs, each " +
      "emitted once despite shared buckets") {
    val got = overlapped.select("lid", "rid").as[(Long, Long)].collect()
    assert(got.toSet == Set((1L, 10L), (2L, 10L), (3L, 12L)))
    assert(got.length == 3) // multi-bucket intersections emit once
  }

  test("intervalOverlap: property — equals the quadratic overlap " +
      "join on random intervals, each pair exactly once") {
    val rng = new scala.util.Random(42L)
    def mk(n: Int) = (1 to n).map { i =>
      val lo = rng.nextInt(1000).toLong
      (i.toLong, lo, lo + rng.nextInt(80).toLong)
    }
    val la = mk(120); val rb = mk(150)
    for (width <- Seq(7L, 64L, 1000L)) {
      val got = RangeJoin.intervalOverlap(
        la.toDF("lid", "s1", "e1"), "s1", "e1",
        rb.toDF("rid", "s2", "e2"), "s2", "e2", on = Nil, width = width)
        .select("lid", "rid").as[(Long, Long)].collect()
      val expected = for {
        (li, ls, le) <- la; (ri, rs, re) <- rb
        if ls <= re && rs <= le
      } yield (li, ri)
      assert(got.length == expected.length, s"width=$width: dup or missing")
      assert(got.toSet == expected.toSet, s"width=$width")
    }
  }

  test("intervalOverlap: on-keys scope the match; equi-join plan") {
    val l = Seq(("a", 1L, 0L, 100L), ("b", 2L, 0L, 100L))
      .toDF("k", "lid", "s1", "e1")
    val r = Seq(("a", 10L, 50L, 60L)).toDF("k", "rid", "s2", "e2")
    val out = RangeJoin.intervalOverlap(l, "s1", "e1", r, "s2", "e2",
      on = Seq("k"), width = 10L)
    assert(out.select("lid", "rid").as[(Long, Long)].collect().toSeq ==
      Seq((1L, 10L)))
    val plan = overlapped.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
