package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.graftbridge.Bridge

package object functions {

  /** Integral division on longs (`a div b`). Plain `/` on Columns is
   * double division, which corrupts epoch-nanosecond arithmetic —
   * doubles carry 53 mantissa bits, epoch-ns values need 61. */
  def ldiv(a: Column, b: Column): Column =
    Bridge.column(IntegralDivide(Bridge.expression(a), Bridge.expression(b)))

  def ldiv(a: Column, b: Long): Column =
    ldiv(a, org.apache.spark.sql.functions.lit(b))

  /** Engine-portable DECIMAL→DOUBLE emit for exact decimal aggregates.
   * A wide-decimal→double cast is only correctly rounded on every
   * engine while the decimal's UNSCALED integer stays below 2⁶³
   * (DuckDB's hugeint→double is upper·2⁶⁴ + lower — TWO roundings,
   * one ulp off nearest past 2⁶⁴; SURVEY §7.5, the twap finding).
   * This emit picks the widest scale whose unscaled form still fits:
   * full input scale below 9·10⁶, 6 dp below 9·10¹², 0 dp beyond —
   * each branch is one exact in-decimal rounding plus one correctly-
   * rounded cast, and the branch predicate is an exact decimal-vs-
   * integer compare every engine reproduces. Bit-identical to the
   * plain cast below 9·10⁶ (the domain of every driver gate), defined
   * and portable to |value| < 9.2·10¹⁸; the decimals a coarser branch
   * drops sit below the double's own ulp at that magnitude, so no
   * branch is less precise than the double could hold anyway.
   * Accepts any input scale ≤ 12 (the widest used in this codebase). */
  def decToDouble(s: Column): Column = {
    import org.apache.spark.sql.functions.{abs, lit, when}
    val a = abs(s)
    when(a <= lit(9000000L), s.cast("double"))
      .when(a <= lit(9000000000000L), s.cast("decimal(38,6)").cast("double"))
      .otherwise(s.cast("decimal(38,0)").cast("double"))
  }

  /** Half-away-from-zero rounding of the INTEGER ratio `num/den` at
   * 6 dp, emitted as the single IEEE division micro/10⁶ — pure
   * integral arithmetic in DECIMAL(38,0), no `round(double)` anywhere.
   * Engines' double-rounding conventions diverge at 5·10⁻⁷ ties, and
   * integer ratios HIT those ties routinely (3/128 = 0.0234375
   * exactly) — the events_seasonal red-gate mechanism. `den` must be
   * positive (null num or den propagates to a null ratio); `num` may
   * be signed: the magnitude formula (2·|a|·10⁶ + c) div (2·c) is
   * half-up on non-negatives where floor and truncate agree on any
   * engine, and the sign re-attaches after. */
  def ratio6(num: Column, den: Column): Column = {
    import org.apache.spark.sql.functions.{abs, lit, when}
    val n0 = abs(num).cast("decimal(38,0)")
    val d0 = den.cast("decimal(38,0)")
    val mag = ldiv(n0 * lit(2000000L) + d0, d0 * lit(2L))
    when(num < 0, -mag).otherwise(mag).cast("double") / lit(1000000.0)
  }
}
