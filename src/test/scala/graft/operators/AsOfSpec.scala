package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  // left: (key, ts, lval)   right: (key, ts, rid, rval)
  private lazy val left = Seq(
    ("a", 10L, "l1"), ("a", 20L, "l2"), ("a", 30L, "l3"),
    ("b", 15L, "l4"), ("c", 5L, "l5"))
    .toDF("k", "ts", "lval")
  private lazy val right = Seq(
    ("a", 5L, 1L, 1.0), ("a", 20L, 2L, 2.0), ("a", 25L, 3L, 3.0),
    ("b", 99L, 4L, 4.0))
    .toDF("k", "ts", "rid", "rval")

  test("latest right row at-or-before each left ts, per key") {
    val out = AsOf.join(left, right, on = Seq("k"), rightOrd = "rid")
      .select("k", "ts", "lval", "asof_rid", "asof_rval")
      .as[(String, Long, String, Option[Long], Option[Double])]
      .collect().toSet
    assert(out == Set(
      ("a", 10L, "l1", Some(1L), Some(1.0)), // 5 <= 10 < 20
      ("a", 20L, "l2", Some(2L), Some(2.0)), // equal ts matches (ASOF <=)
      ("a", 30L, "l3", Some(3L), Some(3.0)),
      ("b", 15L, "l4", None, None),          // right row is in the future
      ("c", 5L, "l5", None, None)))          // no right rows for key at all
  }

  test("ties among right rows resolve to the greatest rightOrd") {
    val dup = Seq(("a", 10L, 7L, 7.0), ("a", 10L, 9L, 9.0), ("a", 10L, 8L, 8.0))
      .toDF("k", "ts", "rid", "rval")
    val out = AsOf.join(Seq(("a", 10L, "x")).toDF("k", "ts", "lval"), dup,
        on = Seq("k"), rightOrd = "rid")
      .select("asof_rid").as[Long].collect().toSeq
    assert(out == Seq(9L))
  }

  test("tolerance expires stale matches but keeps the left row") {
    val out = AsOf.join(left, right, on = Seq("k"), rightOrd = "rid",
        tolerance = Some(6L))
      .select("k", "ts", "asof_rid")
      .as[(String, Long, Option[Long])].collect().toSet
    assert(out == Set(
      ("a", 10L, Some(1L)),  // age 5 <= 6
      ("a", 20L, Some(2L)),  // age 0
      ("a", 30L, Some(3L)),  // age 5
      ("b", 15L, None), ("c", 5L, None)))
    // tighter tolerance expires the age-5 matches too
    val tight = AsOf.join(left, right, on = Seq("k"), rightOrd = "rid",
        tolerance = Some(3L))
      .select("k", "ts", "asof_rid")
      .as[(String, Long, Option[Long])].collect().toSet
    assert(tight == Set(
      ("a", 10L, None), ("a", 20L, Some(2L)), ("a", 30L, None),
      ("b", 15L, None), ("c", 5L, None)))
  }

  test("one shuffle: the plan exchanges once on the key, no join node") {
    val out = AsOf.join(left, right, on = Seq("k"), rightOrd = "rid")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin")
      && !plan.contains("CartesianProduct"),
      s"as-of must not plan a join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly one exchange:\n$plan")
  }
}
