package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `trigram_nll_micro(text)` — document NLL under a trigram language
 * model with two-level stupid backoff (Brants et al., EMNLP 2007),
 * in integer micro-nats: the in-engine tier of the KenLM-style
 * n-gram quality scorer curation pipelines run (CCNet's wikipedia-LM
 * perplexity filter is this construction at n=5):
 *
 *  - position 1 scores the unigram `−ln(c(w)/total)`;
 *  - position 2 scores the bigram `−ln(c(w₁w₂)/c(w₁))` when tabled,
 *    else `−ln(α · p(w₂))`;
 *  - positions i≥3 score the trigram
 *    `−ln(c(w_{i−2} w_{i−1} w_i)/c(w_{i−2} w_{i−1}))` when tabled,
 *    else back off to `−ln(α · c(w_{i−1} w_i)/c(w_{i−1}))`, else to
 *    `−ln(α² · p(w_i))` — the canonical S(w|context) chain;
 *  - out-of-vocabulary words take the floor count 1.
 *
 * Every per-token case is PRE-ROUNDED to micro-nats at model build
 * ([[graft.operators.CorpusStats.trigramNll]]) and summed as longs —
 * the [[BigramNllExpr]] portability construction (order-free,
 * libm-proof, oracle-reproducible): `round(−ln(α·p))` is NOT
 * `round(−ln α) + round(−ln p)` once quantized, so α and α² variants
 * are distinct table entries. Scoring is ≤ 3 hash probes per token
 * inside whole-stage codegen.
 *
 * `uni` maps word → [micro, microα, microα²]; `bi` maps "w1 w2" →
 * [micro, microα]; `tri` maps "w1 w2 w3" → micro.
 */
case class TrigramNllExpr(child: Expression,
    uni: Broadcast[java.util.HashMap[String, Array[Long]]],
    bi: Broadcast[java.util.HashMap[String, Array[Long]]],
    tri: Broadcast[java.util.HashMap[String, java.lang.Long]],
    oovUni: Long, oovBack1: Long, oovBack2: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "trigram_nll_micro"
  override protected def withNewChildInternal(c: Expression): TrigramNllExpr =
    copy(child = c)

  override def nullSafeEval(input: Any): Any =
    TrigramNllExpr.score(input.asInstanceOf[UTF8String], uni.value,
      bi.value, tri.value, oovUni, oovBack1, oovBack2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val uniRef = ctx.addReferenceObj("trigramUniBc", uni,
      "org.apache.spark.broadcast.Broadcast")
    val biRef = ctx.addReferenceObj("trigramBiBc", bi,
      "org.apache.spark.broadcast.Broadcast")
    val triRef = ctx.addReferenceObj("trigramTriBc", tri,
      "org.apache.spark.broadcast.Broadcast")
    val uniTbl = ctx.addMutableState("java.util.HashMap", "trigramUni",
      v => s"$v = (java.util.HashMap) $uniRef.value();")
    val biTbl = ctx.addMutableState("java.util.HashMap", "trigramBi",
      v => s"$v = (java.util.HashMap) $biRef.value();")
    val triTbl = ctx.addMutableState("java.util.HashMap", "trigramTri",
      v => s"$v = (java.util.HashMap) $triRef.value();")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TrigramNllExpr.score($c, $uniTbl, $biTbl, $triTbl, " +
        s"${oovUni}L, ${oovBack1}L, ${oovBack2}L)")
  }
}

object TrigramNllExpr {

  /** Generated-code entry point: single-space tokenization (empty
   * tokens kept, matching `string_split` everywhere else). */
  def score(s: UTF8String, uni: java.util.HashMap[String, Array[Long]],
      bi: java.util.HashMap[String, Array[Long]],
      tri: java.util.HashMap[String, java.lang.Long],
      oovUni: Long, oovBack1: Long, oovBack2: Long): Long = {
    val str = s.toString
    val n = str.length
    var sum = 0L
    var prev2: String = null
    var prev: String = null
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || str.charAt(i) == ' ') {
        val w = str.substring(start, i)
        if (prev == null) {
          val u = uni.get(w)
          sum += (if (u == null) oovUni else u(0))
        } else if (prev2 == null) {
          val b = bi.get(prev + " " + w)
          if (b != null) sum += b(0)
          else {
            val u = uni.get(w)
            sum += (if (u == null) oovBack1 else u(1))
          }
        } else {
          val t = tri.get(prev2 + " " + prev + " " + w)
          if (t != null) sum += t.longValue()
          else {
            val b = bi.get(prev + " " + w)
            if (b != null) sum += b(1)
            else {
              val u = uni.get(w)
              sum += (if (u == null) oovBack2 else u(2))
            }
          }
        }
        prev2 = prev
        prev = w
        start = i + 1
      }
      i += 1
    }
    sum
  }

  def nllMicro(text: Column,
      uni: Broadcast[java.util.HashMap[String, Array[Long]]],
      bi: Broadcast[java.util.HashMap[String, Array[Long]]],
      tri: Broadcast[java.util.HashMap[String, java.lang.Long]],
      oovUni: Long, oovBack1: Long, oovBack2: Long): Column =
    Bridge.column(TrigramNllExpr(Bridge.expression(text), uni, bi, tri,
      oovUni, oovBack1, oovBack2))
}
