package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `unigram_nll_micro(text)` — total negative log-likelihood of a
 * document under a broadcast unigram language model, in integer
 * MICRO-nats: each token contributes `round(−ln(p(w)) · 1e6)` and the
 * per-token contributions sum as longs. The fixed-point quantization
 * is what makes the score portable: `ln()` may differ by an ulp
 * between libm implementations, but after rounding to 1e-6 every
 * engine produces the same integer per token, and LONG addition is
 * order-free — so scores are bit-reproducible across engines,
 * partitionings, and plans (the correctness oracle recomputes them in
 * SQL).
 *
 * The model ships as a `Broadcast` HANDLE: the expression (which
 * Spark serializes into every task binary) carries only the tiny
 * broadcast reference, and the table itself moves via TorrentBroadcast
 * ONCE PER EXECUTOR — not once per task, which is what a
 * closure-captured HashMap would cost on a 1000-executor cluster.
 * Generated code resolves `.value()` into a local at codegen-object
 * init, so scoring stays one hash probe per token inside whole-stage
 * codegen — the broadcast-LM scoring shape (KenLM-style) of real
 * corpus pipelines, with the probe table built by the engine itself
 * from corpus counts.
 */
case class UnigramNllExpr(child: Expression,
    micro: Broadcast[java.util.HashMap[String, java.lang.Long]], oovMicro: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "unigram_nll_micro"
  override protected def withNewChildInternal(c: Expression): UnigramNllExpr =
    copy(child = c)

  override def nullSafeEval(input: Any): Any =
    UnigramNllExpr.score(input.asInstanceOf[UTF8String], micro.value, oovMicro)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the BROADCAST (small), resolve .value() once into a
    // mutable-state local — not per row. Raw types: Janino, no generics.
    val ref = ctx.addReferenceObj("unigramMicroBc", micro,
      "org.apache.spark.broadcast.Broadcast")
    val tbl = ctx.addMutableState("java.util.HashMap", "unigramMicro",
      v => s"$v = (java.util.HashMap) $ref.value();")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnigramNllExpr.score($c, $tbl, ${oovMicro}L)")
  }
}

object UnigramNllExpr {

  /** Generated-code entry point: tokenize on single spaces (the same
   * split every other operator and the oracle's `string_split` use —
   * consecutive spaces yield empty tokens in all engines) and sum the
   * per-token micro-nll with one map probe each. */
  def score(s: UTF8String, m: java.util.HashMap[String, java.lang.Long],
      oov: Long): Long = {
    val str = s.toString
    val n = str.length
    var sum = 0L
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || str.charAt(i) == ' ') {
        val v = m.get(str.substring(start, i))
        sum += (if (v == null) oov else v.longValue())
        start = i + 1
      }
      i += 1
    }
    sum
  }

  def nllMicro(text: Column,
      micro: Broadcast[java.util.HashMap[String, java.lang.Long]],
      oovMicro: Long): Column =
    Bridge.column(UnigramNllExpr(Bridge.expression(text), micro, oovMicro))
}
