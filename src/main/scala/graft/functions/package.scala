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
