package graft.functions

/**
 * Go-compatible `fmt.Sprintf("%v", x)` formatting for float64, i.e.
 * `strconv.FormatFloat(x, 'g', -1, 64)`: shortest round-trip digits,
 * scientific form when the decimal exponent is < −4 or ≥ 6
 * (reference: query.go:135-140 stringifies every extracted scalar this
 * way before filters/reducers see it).
 *
 * Built on JDK 17+ `Double.toString` (also shortest-round-trip) and
 * re-formatted to Go's surface syntax.
 */
object GoFormat {

  def goDouble(d: Double): String = {
    if (d.isNaN) return "NaN"
    if (d.isPosInfinity) return "+Inf"
    if (d.isNegInfinity) return "-Inf"
    if (d == 0.0) return if (1.0 / d < 0) "-0" else "0"
    val neg = d < 0
    val (digits, dp) = shortestDigits(math.abs(d))
    val exp = dp - 1 // value = d₁.d₂… × 10^exp
    val body =
      if (exp < -4 || exp >= 6) { // Go 'g' shortest: eprec = 6
        val mant =
          if (digits.length == 1) digits
          else digits.head.toString + "." + digits.tail
        val esign = if (exp < 0) "-" else "+"
        f"${mant}e$esign${math.abs(exp)}%02d"
      } else if (dp <= 0) {
        "0." + ("0" * -dp) + digits
      } else if (dp >= digits.length) {
        digits + ("0" * (dp - digits.length))
      } else {
        digits.substring(0, dp) + "." + digits.substring(dp)
      }
    if (neg) "-" + body else body
  }

  /** Shortest-round-trip decimal digits of a positive finite double:
   * returns (digit string without trailing zeros, decimal point
   * position) so that value = 0.digits × 10^dp.
   *
   * JDK 17's Double.toString is "unique" but not always SHORTEST
   * (Ryu landed in JDK 19) — ~0.3% of doubles carry one extra digit
   * vs Go's strconv. Starting from the JDK digits, keep shortening a
   * digit at a time: at each length the two bracketing decimals of
   * the exact binary value are tested, and the closer round-tripping
   * one adopted (what a shortest-correctly-rounded algorithm emits). */
  private def shortestDigits(d: Double): (String, Int) = {
    import java.math.{BigDecimal => JBD, MathContext, RoundingMode}
    var c = JBD.valueOf(d).stripTrailingZeros()
    val exact = new JBD(d)
    var done = false
    while (!done && c.precision() > 1) {
      val k = c.precision() - 1
      val down = exact.round(new MathContext(k, RoundingMode.DOWN))
      val up = exact.round(new MathContext(k, RoundingMode.UP))
      val cands = Seq(down, up).filter(_.doubleValue() == d)
      if (cands.isEmpty) done = true
      else c = cands.minBy(_.subtract(exact).abs()).stripTrailingZeros()
    }
    val digits = c.unscaledValue.abs.toString
    (digits, digits.length - c.scale)
  }

  /** Go `%v` of a JSON-decoded scalar: JSON numbers decode to float64
   * in the reference, bools to "true"/"false", strings pass through. */
  def goScalar(v: Any): String = v match {
    case d: Double => goDouble(d)
    case b: Boolean => if (b) "true" else "false"
    case s: String => s
    case null => null
    case other => other.toString
  }
}
