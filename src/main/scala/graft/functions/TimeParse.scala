package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `time_parse(s)` — the engine's lenient multi-format timestamp
 * parser ([[graft.timelib.TimeLib.parseTime]]: integer auto-ranging,
 * canonical RFC3339Nano, RFC1123(±Z), Unix/ANSI-C/Ruby dates, date
 * prefixes — reference semantics of timelib/time.go:110-157) as a
 * native Catalyst expression: epoch-ns LONG, null on garbage.
 *
 * A Scala UDF computes the identical value but breaks whole-stage
 * codegen at the call site (upstream columns materialize into an
 * InternalRow and the stage splits around the UDF boundary); this
 * expression stays inside the generated loop — one static call per
 * row, null via the primitive isNull slot, no row boxing. Measured
 * honestly (10M-row all-formats mix, local[32]): throughput matches
 * the UDF within noise — THIS parser's cost is the regex/java.time
 * work itself, not the row boundary — so what the expression buys is
 * plan structure: the projection fuses into the surrounding codegen
 * stage instead of fencing it, which matters when the parse sits
 * inside a larger fused pipeline. The parse is deliberately the SAME
 * hand-rolled TimeLib routine the store/HTTP surface uses — one
 * definition of the format table everywhere.
 */
case class TimeParseExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true // unparseable input → null
  override def prettyName: String = "time_parse"
  override protected def withNewChildInternal(c: Expression): TimeParseExpr =
    copy(child = c)

  override def nullSafeEval(input: Any): Any = {
    val v = TimeParseExpr.parseOrNull(input.asInstanceOf[UTF8String])
    if (v == null) null else v.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("parsedNs")
      s"""
        java.lang.Long $tmp = graft.functions.TimeParseExpr.parseOrNull($c);
        if ($tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $tmp.longValue(); }
      """
    })
}

object TimeParseExpr {

  /** Generated-code entry point: epoch ns, or null when no format
   * matches (the UDF's Option[Long] surface, unboxed). */
  def parseOrNull(s: UTF8String): java.lang.Long =
    graft.timelib.TimeLib.parseTime(s.toString) match {
      case Some(ns) => java.lang.Long.valueOf(ns)
      case None => null
    }

  def timeParse(str: Column): Column =
    Bridge.column(TimeParseExpr(Bridge.expression(str)))
}
