package graft.timelib

import org.scalatest.funsuite.AnyFunSuite

/** Ported parsing corpus (reference: timelib/time_test.go:27-125,
 * database_test.go:7-19). */
class TimeLibSpec extends AnyFunSuite {
  val example = "2012-08-28T21:24:35.37465188Z"
  val milli = "2012-08-28T21:24:35.374Z"
  val second = "2012-08-28T21:24:35Z"

  def canon(s: String): String =
    TimeLib.formatCanonical(TimeLib.parseTime(s).get)

  test("ParseTime corpus (timelib/time_test.go:27-60)") {
    val cases = Seq(
      "1346189075374651880" -> example,
      "1346189075374" -> milli,
      "1346189075" -> second,
      example -> example,
      second -> second,
      "Tue, 28 Aug 2012 21:24:35 +0000" -> second,
      "Tue, 28 Aug 2012 21:24:35 UTC" -> second,
      "Tue Aug 28 21:24:35 UTC 2012" -> second,
      "Tue Aug 28 21:24:35 2012" -> second,
      "Tue Aug 28 21:24:35 +0000 2012" -> second,
      "2012-08-28T21:24" -> "2012-08-28T21:24:00Z",
      "2012-08-28T21" -> "2012-08-28T21:00:00Z",
      "2012-08-28" -> "2012-08-28T00:00:00Z",
      "2012-08" -> "2012-08-01T00:00:00Z",
      "2012" -> "2012-01-01T00:00:00Z",
    )
    cases.foreach { case (in, exp) =>
      assert(canon(in) == exp, s"for input $in")
    }
  }

  test("canonical parser fraction widths (timelib/time_test.go:63-98)") {
    val cases = Seq(
      "2012-08-28T21:24:35.374651883Z" -> "",
      "2012-08-28T21:24:35.37465188Z" -> "",
      "2012-08-28T21:24:35.3746518Z" -> "",
      "2012-08-28T21:24:35.374651Z" -> "",
      "2012-08-28T21:24:35.37465Z" -> "",
      "2012-08-28T21:24:35.3746Z" -> "",
      "2012-08-28T21:24:35.374Z" -> "",
      "2012-08-28T21:24:35.37Z" -> "",
      "2012-08-28T21:24:35.3Z" -> "",
      "2012-08-28T21:24:35.0Z" -> "2012-08-28T21:24:35Z",
      "2012-08-28T21:24:35.Z" -> "2012-08-28T21:24:35Z",
      "2012-08-28T21:24:35Z" -> "",
    )
    cases.foreach { case (in, expRaw) =>
      val exp = if (expRaw.isEmpty) in else expRaw
      val ns = TimeLib.parseCanonical(in)
      assert(ns.isDefined, s"for input $in")
      assert(TimeLib.formatCanonical(ns.get) == exp, s"for input $in")
    }
  }

  test("canonical parser rejects garbage (timelib/time_test.go:100-125)") {
    val bad = Seq(
      "ZZZZZZZZZZZZZZZZZZZZ", "ZZZZ-ZZ-ZZTZZ:ZZ:ZZZ",
      "2014-ZZ-ZZTZZ:ZZ:ZZZ", "2014-03-ZZTZZ:ZZ:ZZZ",
      "2014-03-14TZZ:ZZ:ZZZ", "2014-03-14T15:ZZ:ZZZ",
      "2014-03-14T15:09:ZZZ", "2014-03-14T15:09:26.S35897Z",
    )
    bad.foreach(s => assert(TimeLib.parseCanonical(s).isEmpty, s"for $s"))
  }

  test("unparseable input") {
    assert(TimeLib.parseTime("an hour ago").isEmpty)
  }

  test("weekday value is ignored like Go time.Parse (28 Aug 2012 was a Tuesday)") {
    assert(canon("Mon, 28 Aug 2012 21:24:35 +0000") == second)
    assert(canon("Fri Aug 28 21:24:35 UTC 2012") == second)
  }

  test("zone abbreviations resolve to zero offset (Go on a UTC host)") {
    assert(canon("Tue, 28 Aug 2012 21:24:35 EST") == second)
    assert(canon("Tue, 28 Aug 2012 21:24:35 GMT") == second)
    assert(canon("Tue Aug 28 21:24:35 EST 2012") == second)
    // numeric offsets still apply
    assert(canon("Tue, 28 Aug 2012 21:24:35 -0500") == "2012-08-29T02:24:35Z")
  }

  test("parseKey (database_test.go:7-19)") {
    assert(TimeLib.parseKey(example) == 1346189075374651880L)
    assert(TimeLib.parseKey("garbage") == -1L)
  }

  test("format/parse round-trip at ns precision") {
    val ns = 1346189075374651883L
    assert(TimeLib.parseKey(TimeLib.formatCanonical(ns)) == ns)
    assert(TimeLib.formatCanonical(1346189040000000000L) == "2012-08-28T21:24:00Z")
  }
}
