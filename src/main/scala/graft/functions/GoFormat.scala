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
   * position) so that value = 0.digits × 10^dp. */
  private def shortestDigits(d: Double): (String, Int) = {
    val s = java.lang.Double.toString(d) // e.g. "123.45", "1.2345E7", "4.9E-324"
    val (mant, e) = s.indexOf('E') match {
      case -1 => (s, 0)
      case i  => (s.substring(0, i), s.substring(i + 1).toInt)
    }
    val dot = mant.indexOf('.')
    val digitsRaw = mant.replace(".", "")
    val intLen = if (dot == -1) mant.length else dot
    var dp = intLen + e
    // strip leading zeros (adjusting dp), then trailing zeros
    var digits = digitsRaw
    while (digits.length > 1 && digits.head == '0') { digits = digits.tail; dp -= 1 }
    digits = digits.reverse.dropWhile(_ == '0').reverse
    if (digits.isEmpty) ("0", 1) else (digits, dp)
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
