package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import java.security.MessageDigest

/**
 * `hash60(s)` = first 15 hex chars of md5(s) as a long — semantically
 * identical to `conv(substring(md5(s), 1, 15), 16, 10)` (and to the
 * correctness oracle's `('0x' || substr(md5(s),1,15))::BIGINT`), but
 * ~100× cheaper per row: the built-in chain materializes the full hex
 * string and re-parses it through Conv's radix converter, while this
 * reads the digest bytes directly. The md5 basis keeps the hash
 * portable across engines.
 */
case class Hash60Expr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hash60"
  override protected def withNewChildInternal(c: Expression): Hash60Expr = copy(c)

  override def nullSafeEval(input: Any): Any =
    Hash60Expr.hash60(input.asInstanceOf[UTF8String])

  // stays inside whole-stage codegen: one static call, no boxing
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Hash60Expr.hash60($c)")
}

object Hash60Expr {
  // MessageDigest is stateful and not thread-safe; expression instances
  // can be shared across local-mode task threads
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Per-thread reusable MD5 for the other md5-based expressions. */
  private[functions] def threadDigest(): MessageDigest = digests.get()

  /** Generated-code entry point. */
  def hash60(s: UTF8String): Long =
    SimHash60.hash60(digests.get(), s.getBytes)

  def hash60(c: Column): Column = Bridge.column(Hash60Expr(Bridge.expression(c)))
}
