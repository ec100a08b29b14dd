package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, Decimal, LongType}

/**
 * `cov_ratio_micro(n, s, mi, mj)` — the exact mean-centered
 * covariance micro emit `⌈(n·s − mᵢ·mⱼ)·10⁶ / (n²·2^(2·sb))⌉_half`
 * computed in arbitrary-precision integers: the DECIMAL(38,0) form
 * of the same arithmetic overflows (NULLs silently under non-ANSI
 * mode) once `|n·s − mᵢmⱼ|·2·10⁶ + n²·2^(2sb)` passes 10³⁸ — a hard
 * ceiling at n ≈ 4.7e9 rows for scaleBits = 20, at odds with the
 * 100-TB framing. Here the four DECIMAL(38,0) sketch sums convert to
 * BigInteger once per d²-bounded cell and the half-away-from-zero
 * integer-ratio rounds exactly at ANY n — the remaining bound is the
 * sketch sums' own DECIMAL(38,0) capacity (n ≤ ~8.7e25 at sb = 20),
 * past any physical corpus. Per-cell cost is a handful of BigInteger
 * multiplies on a d² frame — nanoseconds against the corpus scan
 * that built the sketch.
 */
case class CovRatioMicroExpr(first: Expression, second: Expression,
    third: Expression, fourth: Expression, scaleBits: Int)
    extends QuaternaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "cov_ratio_micro"
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): CovRatioMicroExpr =
    copy(first = a, second = b, third = c, fourth = d)

  override def nullSafeEval(n: Any, s: Any, mi: Any, mj: Any): Any =
    CovRatioMicroExpr.covMicro(n.asInstanceOf[Decimal],
      s.asInstanceOf[Decimal], mi.asInstanceOf[Decimal],
      mj.asInstanceOf[Decimal], scaleBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (n, s, mi, mj) =>
      s"graft.functions.CovRatioMicroExpr.covMicro($n, $s, $mi, $mj, $scaleBits)")
}

object CovRatioMicroExpr {
  private val TwoMillion = java.math.BigInteger.valueOf(2000000L)
  private val Two = java.math.BigInteger.valueOf(2L)

  /** Generated-code entry point. n = 0 yields 0 (empty-input cell —
   * the pre-fix DECIMAL chain nulled on the division; a zero
   * covariance is the honest empty value and keeps the column
   * non-null). */
  def covMicro(n: Decimal, s: Decimal, mi: Decimal, mj: Decimal,
      scaleBits: Int): Long = {
    val bn = n.toJavaBigDecimal.toBigIntegerExact
    if (bn.signum == 0) return 0L
    val num = bn.multiply(s.toJavaBigDecimal.toBigIntegerExact)
      .subtract(mi.toJavaBigDecimal.toBigIntegerExact
        .multiply(mj.toJavaBigDecimal.toBigIntegerExact))
    val den = bn.multiply(bn).shiftLeft(2 * scaleBits)
    // half-away-from-zero integer ratio: sign · (2e6·|num| + den) / (2·den)
    val q = num.abs.multiply(TwoMillion).add(den)
      .divide(den.multiply(Two))
    (if (num.signum < 0) q.negate else q).longValueExact()
  }

  def covRatioMicro(n: Column, s: Column, mi: Column, mj: Column,
      scaleBits: Int): Column =
    Bridge.column(CovRatioMicroExpr(Bridge.expression(n),
      Bridge.expression(s), Bridge.expression(mi), Bridge.expression(mj),
      scaleBits))
}
