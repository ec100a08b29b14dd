package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class GoFormatSpec extends AnyFunSuite {
  test("Go %v float64 surface forms") {
    val cases = Seq(
      0.0 -> "0",
      5.0 -> "5",
      -5.0 -> "-5",
      0.5 -> "0.5",
      83.0 -> "83",
      185.22 -> "185.22",
      111.0 -> "111",
      -23.0 -> "-23",
      10.5 -> "10.5",
      3.5 -> "3.5",
      100000.0 -> "100000",
      123456.7 -> "123456.7",
      999999.0 -> "999999",
      1000000.0 -> "1e+06",
      1234567.0 -> "1.234567e+06",
      1e20 -> "1e+20",
      1e21 -> "1e+21",
      0.0001 -> "0.0001",
      0.00001 -> "1e-05",
      1.5e-7 -> "1.5e-07",
      Double.NaN -> "NaN",
      Double.PositiveInfinity -> "+Inf",
      Double.NegativeInfinity -> "-Inf",
    )
    cases.foreach { case (in, exp) =>
      assert(GoFormat.goDouble(in) == exp, s"for $in")
    }
  }

  test("goDouble emits SHORTEST digits even where JDK 17 Double.toString does not") {
    // 5.722351919331477e17: JDK 17 renders an extra digit
    // (5.7223519193314771e17); Go's shortest form has 16
    assert(GoFormat.goDouble(5.722351919331477e17) == "5.722351919331477e+17")
    // minimality sweep: for epoch-ns-sized magnitudes, dropping the
    // last digit of our output must break the round-trip
    val rnd = new scala.util.Random(7)
    (1 to 20000).foreach { _ =>
      val d = (1e17 + rnd.nextDouble() * 9e17) * (if (rnd.nextBoolean()) 1 else -1)
      val s = GoFormat.goDouble(d)
      assert(s.toDouble == d, s"round-trip $d -> $s")
      val m = "^(-?\\d\\.?\\d*?)(\\d)e\\+17$".r.findFirstMatchIn(s)
      m.foreach { g =>
        val shorter = g.group(1)
        if (shorter.nonEmpty && shorter.last.isDigit && shorter.last != '9') {
          val truncated = (shorter + "e+17").toDouble
          val roundedUp = (shorter.dropRight(1) + (shorter.last + 1).toChar + "e+17").toDouble
          assert(truncated != d && roundedUp != d,
            s"$s not minimal for $d: a ${s.length - 1}-char form round-trips")
        }
      }
    }
  }

  test("goDouble round-trips through goParseFloat (10k random doubles)") {
    val rnd = new scala.util.Random(42)
    (1 to 10000).foreach { _ =>
      val d = java.lang.Double.longBitsToDouble(rnd.nextLong())
      if (!d.isNaN && !d.isInfinite) {
        val s = GoFormat.goDouble(d)
        val back = JsonPointersExpr.goParseFloat(s)
        assert(back != null && back.doubleValue() == d, s"for bits of $d -> $s")
      }
    }
    // and plain-magnitude doubles
    (1 to 10000).foreach { _ =>
      val d = (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(12) - 3)
      val s = GoFormat.goDouble(d)
      assert(JsonPointersExpr.goParseFloat(s).doubleValue() == d, s"for $d -> $s")
    }
  }

  test("goParseFloat accepts Go forms, rejects Java extensions") {
    assert(JsonPointersExpr.goParseFloat("17") == 17.0)
    assert(JsonPointersExpr.goParseFloat("1e5") == 100000.0)
    assert(JsonPointersExpr.goParseFloat("-2.5e-3") == -0.0025)
    assert(JsonPointersExpr.goParseFloat(".5") == 0.5)
    assert(JsonPointersExpr.goParseFloat("+Inf").isInfinite)
    assert(JsonPointersExpr.goParseFloat("nan").isNaN)
    assert(JsonPointersExpr.goParseFloat("foo") == null)
    assert(JsonPointersExpr.goParseFloat("1f") == null)   // Java-only suffix
    assert(JsonPointersExpr.goParseFloat("0x1p3") == null) // hex float
    assert(JsonPointersExpr.goParseFloat(" 1") == null)    // whitespace
    assert(JsonPointersExpr.goParseFloat("") == null)
  }
}
