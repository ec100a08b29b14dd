package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `bigram_nll_micro(text)` — document NLL under a bigram language
 * model with "stupid backoff" (the web-scale backoff of Brants et al.,
 * EMNLP 2007: no discounting, a fixed backoff factor — the standard
 * choice when the model is estimated from counts at corpus scale), in
 * integer micro-nats:
 *
 *  - position 1 scores the unigram `−ln(c(w)/total)`;
 *  - positions i>1 score the bigram `−ln(c(w_{i−1} w_i)/c(w_{i−1}))`
 *    when the bigram is in the table, else back off to
 *    `−ln(α · c(w_i)/total)`;
 *  - out-of-vocabulary words take the floor count 1.
 *
 * All three per-token cases are PRE-ROUNDED to micro-nats at model
 * build ([[graft.operators.CorpusStats.bigramNll]]) and summed as
 * longs — the same portability construction as [[UnigramNllExpr]]
 * (order-free, libm-proof, oracle-reproducible in SQL). Scoring is
 * two hash probes per token inside whole-stage codegen.
 *
 * `uni` maps word → [microUnigram, microBackoff] (the backoff value
 * bakes α in, because `round(−ln(α·p))` is NOT `round(−ln α) +
 * round(−ln p)` once quantized); `bi` maps "w1 w2" → microBigram.
 * Both ship as `Broadcast` handles — the table moves once per
 * executor via TorrentBroadcast, not once per task in the expression
 * closure (see [[UnigramNllExpr]]).
 */
case class BigramNllExpr(child: Expression,
    uni: Broadcast[java.util.HashMap[String, Array[Long]]],
    bi: Broadcast[java.util.HashMap[String, java.lang.Long]],
    oovUni: Long, oovBack: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "bigram_nll_micro"
  override protected def withNewChildInternal(c: Expression): BigramNllExpr =
    copy(child = c)

  override def nullSafeEval(input: Any): Any =
    BigramNllExpr.score(input.asInstanceOf[UTF8String], uni.value, bi.value,
      oovUni, oovBack)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the BROADCASTs (small), resolve .value() once into
    // mutable-state locals. Raw types: Janino, no generics.
    val uniRef = ctx.addReferenceObj("bigramUniBc", uni,
      "org.apache.spark.broadcast.Broadcast")
    val biRef = ctx.addReferenceObj("bigramBiBc", bi,
      "org.apache.spark.broadcast.Broadcast")
    val uniTbl = ctx.addMutableState("java.util.HashMap", "bigramUni",
      v => s"$v = (java.util.HashMap) $uniRef.value();")
    val biTbl = ctx.addMutableState("java.util.HashMap", "bigramBi",
      v => s"$v = (java.util.HashMap) $biRef.value();")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BigramNllExpr.score($c, $uniTbl, $biTbl, ${oovUni}L, ${oovBack}L)")
  }
}

object BigramNllExpr {

  /** Generated-code entry point: single-space tokenization (empty
   * tokens kept, matching `string_split` everywhere else). */
  def score(s: UTF8String, uni: java.util.HashMap[String, Array[Long]],
      bi: java.util.HashMap[String, java.lang.Long],
      oovUni: Long, oovBack: Long): Long = {
    val str = s.toString
    val n = str.length
    var sum = 0L
    var prev: String = null
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || str.charAt(i) == ' ') {
        val w = str.substring(start, i)
        if (prev == null) {
          val u = uni.get(w)
          sum += (if (u == null) oovUni else u(0))
        } else {
          val b = bi.get(prev + " " + w)
          if (b != null) sum += b.longValue()
          else {
            val u = uni.get(w)
            sum += (if (u == null) oovBack else u(1))
          }
        }
        prev = w
        start = i + 1
      }
      i += 1
    }
    sum
  }

  def nllMicro(text: Column,
      uni: Broadcast[java.util.HashMap[String, Array[Long]]],
      bi: Broadcast[java.util.HashMap[String, java.lang.Long]],
      oovUni: Long, oovBack: Long): Column =
    Bridge.column(BigramNllExpr(Bridge.expression(text), uni, bi, oovUni, oovBack))
}
