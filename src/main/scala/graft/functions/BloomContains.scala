package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/**
 * `bloom_contains(h)` — membership probe of a long against a
 * pre-built [[org.apache.spark.util.sketch.BloomFilter]] (Spark's
 * public sketch, the same structure the engine's runtime row-group
 * filters use). The filter rides into generated code via
 * `addReferenceObj`, so the probe is one virtual call inside
 * whole-stage codegen — no UDF boxing, no per-row deserialization.
 *
 * False positives only (rate set at build time); never false
 * negatives — callers layer an exact confirm join AFTER the probe, so
 * results stay exact while the probe discards the overwhelming
 * majority of rows before any shuffle.
 */
case class BloomContainsExpr(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"
  override protected def withNewChildInternal(c: Expression): BloomContainsExpr =
    copy(child = c)

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }
}

object BloomContainsExpr {
  def contains(bloom: BloomFilter, h: Column): Column =
    Bridge.column(BloomContainsExpr(Bridge.expression(h), bloom))
}
