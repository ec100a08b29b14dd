package graft

import graft.functions.GoFormat
import graft.operators.SeriesEngine
import graft.operators.SeriesEngine.SeriesQuery
import graft.timelib.TimeLib
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property tests for the invariants golden values can't pin down
 * (SURVEY.md §5): parse/format round-trips, bucketing arithmetic,
 * reducer consistency relations.
 */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop, min: Int = 100): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(min), p)
    assert(res.passed, res.status.toString)
  }

  // epoch ns range: 1970..~2200, away from Long overflow
  private val nsGen = Gen.chooseNum(0L, 7_258_118_400_000_000_000L)

  test("canonical format/parse round-trips at ns precision") {
    check(Prop.forAll(nsGen) { ns =>
      TimeLib.parseCanonical(TimeLib.formatCanonical(ns)).contains(ns)
    })
  }

  test("parseTime accepts canonical output and epoch integers consistently") {
    // bare-integer auto-ranging means epoch SECONDS only up to 2^31
    // (beyond 2038 the integer re-ranges as ms — reference behavior,
    // timelib/time.go:132-145), so constrain the seconds form
    val secGen = Gen.chooseNum(10001L, Int.MaxValue.toLong)
    check(Prop.forAll(nsGen, secGen) { (ns, sec) =>
      TimeLib.parseTime(TimeLib.formatCanonical(ns)).contains(ns) &&
        TimeLib.parseTime(sec.toString).contains(sec * 1000000000L) &&
        (sec * 1000L <= Int.MaxValue ||
          TimeLib.parseTime((sec * 1000L).toString).contains(sec * 1000000000L)) &&
        (ns <= Int.MaxValue.toLong * 1000L ||
          TimeLib.parseTime(ns.toString).contains(ns))
    })
  }

  test("goDouble/goParseFloat round-trips arbitrary finite doubles") {
    check(Prop.forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue)) { bits =>
      val d = java.lang.Double.longBitsToDouble(bits)
      d.isNaN || d.isInfinite || {
        val parsed = graft.functions.JsonPointersExpr.goParseFloat(GoFormat.goDouble(d))
        parsed != null && parsed.doubleValue() == d
      }
    })
  }

  test("bucket arithmetic: floor alignment, idempotence, membership") {
    val chunkGen = Gen.chooseNum(1L, 86400000L).map(_ * 1000000L)
    check(Prop.forAll(nsGen, chunkGen) { (ns, chunk) =>
      val bucket = ns - java.lang.Math.floorMod(ns, chunk)
      bucket % chunk == 0 && bucket <= ns && ns < bucket + chunk
    })
  }

  // Spark-backed consistency properties on one shared session
  private lazy val spark = SparkSpec.spark

  test("reducer consistency: sum/avg/count/min/max relations on random docs") {
    import spark.implicits._
    val valsGen = Gen.nonEmptyListOf(Gen.chooseNum(-1000000, 1000000))
    check(Prop.forAllNoShrink(valsGen) { xs =>
      val b = 1346189040L
      val docs = xs.zipWithIndex.map { case (v, i) =>
        ((b + i) * 1000000000L, s"""{"v": $v}""") }
      val df = docs.toDF("ts", "doc")
      val row = SeriesEngine.query(df, SeriesQuery(86400000L * 10,
        Seq("/v", "/v", "/v", "/v", "/v"),
        Seq("sum", "avg", "count", "min", "max"),
        names = Seq("s", "a", "n", "mn", "mx"))).head()
      val (s, a, n) = (row.getDouble(1), row.getDouble(2), row.getLong(3))
      val (mn, mx) = (row.getDouble(4), row.getDouble(5))
      n == xs.length &&
        math.abs(s - xs.map(_.toDouble).sum) < 1e-6 &&
        math.abs(a - s / n) < 1e-9 &&
        mn == xs.min.toDouble && mx == xs.max.toDouble &&
        mn <= a && a <= mx
    }, min = 20)
  }

  test("identity preserves count and order for random string values") {
    import spark.implicits._
    val strGen = Gen.nonEmptyListOf(Gen.alphaNumStr.map(_.take(8)))
    check(Prop.forAllNoShrink(strGen) { xs =>
      val b = 1346189040L
      val docs = xs.zipWithIndex.map { case (v, i) =>
        ((b + i) * 1000000000L, s"""{"v": "$v"}""") }
      val row = SeriesEngine.query(docs.toDF("ts", "doc"),
        SeriesQuery(86400000L * 10, Seq("/v"), Seq("identity"),
          names = Seq("vals"))).head()
      row.getSeq[String](1) == xs
    }, min = 20)
  }
}
