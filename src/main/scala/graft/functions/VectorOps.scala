package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Sequential-order dot product of two numeric arrays in double
 * precision: elements promote to double and accumulate left to right —
 * the deterministic order any sequential engine (and the DuckDB
 * oracle's `list_sum(list_transform(...))`) reproduces.
 *
 * Replaces the `aggregate(zip_with(...))` composition: higher-order
 * functions are CodegenFallback AND allocate an intermediate zipped
 * array plus per-element lambda frames; this is one primitive loop.
 * Iteration runs over the LEFT array's length, so a right-hand plane
 * literal may be longer than the vector (extra components ignored,
 * exactly like the oracle's `range(1, len(v)+1)` indexing).
 */
case class DotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotExpr =
    copy(left = l, right = r)

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"vec_dot needs array<float|double>, got $t")
  }
  private lazy val leftFloat = elemIsFloat(left)
  private lazy val rightFloat = elemIsFloat(right)

  override def nullSafeEval(l: Any, r: Any): Any =
    VectorOps.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      leftFloat, rightFloat)

  // stays inside whole-stage codegen (was CodegenFallback — the ANN
  // operators evaluate this once per corpus row × query, the hottest
  // loop in the similarity family): one static call, primitive result
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorOps.dot($a, $b, $leftFloat, $rightFloat)")
}

object VectorOps {
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotExpr(Bridge.expression(a), Bridge.expression(b)))

  /** Generated-code entry point: left-to-right double accumulation
   * over min(|a|, |b|) elements. */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      sum += x * y
      i += 1
    }
    sum
  }
}
