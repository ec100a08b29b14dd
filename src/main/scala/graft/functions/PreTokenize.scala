package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `pretokenize(text)` — the GPT-2/Llama-style REGEX pre-tokenizer
 * (Radford et al. 2019's `gpt2.bpe` pattern family): text splits into
 * the segments production BPE/unigram trainers and encoders consume —
 * contractions (`'s 't 're 've 'm 'll 'd`), leading-space-attached
 * letter runs, leading-space-attached digit runs, leading-space-
 * attached punctuation runs, and whitespace runs — instead of the
 * engine's default whitespace split ([[graft.operators.TextOps]]
 * `tokens`, which remains the default everywhere; this is the opt-in
 * `pretok` mode of the tokenizer family).
 *
 * The pattern is deliberately LOOKAHEAD-FREE (GPT-2's original ends
 * with `\s+(?!\S)`, which RE2 cannot express) so the exact same
 * pattern string runs identically under java.util.regex (this
 * expression) and RE2 (the DuckDB oracle's `regexp_extract_all`):
 * both engines use leftmost-first alternation, both interpret
 * `\p{L}`/`\p{N}` as Unicode categories, and the whitespace class is
 * written out explicitly (`[ \t\n\r\f]`) because the engines' `\s`
 * differ on VT. Every non-whitespace character of the input lands in
 * exactly one segment; segments concatenate back to the input.
 *
 * KNOWN DIVERGENCE from GPT-2's exact segmentation, the price of
 * dropping the lookahead: GPT-2's `\s+(?!\S)` stops a whitespace run
 * one character short of a following non-space, so the word keeps
 * its leading-space attachment even after 2+ spaces or a newline
 * (`'a  b'` → `['a', ' ', ' b']`). The lookahead-free alternative
 * `[ \t\n\r\f]+` greedily consumes the whole run, detaching that
 * word (`['a', '  ', 'b']`). Single-space-separated text — the
 * overwhelming mass of prose — segments identically; but vocabularies
 * learned over multi-space/newline-heavy corpora (code, markup) are
 * NOT drop-in compatible with GPT-2's. Engine and oracle stay
 * mutually consistent either way (both run THIS pattern).
 *
 * Scale shape: a per-row codegen'd projection (no UDF, no shuffle)
 * with a thread-local compiled-pattern reuse — the corpus pays one
 * scan, identical to the `split(text, " ")` path it replaces in
 * pretok mode.
 */
case class PreTokenizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "pretokenize"
  override protected def withNewChildInternal(c: Expression): PreTokenizeExpr =
    copy(child = c)

  override def nullSafeEval(input: Any): Any =
    PreTokenizeExpr.segments(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PreTokenizeExpr.segments($c)")
}

object PreTokenizeExpr {

  /** The shared pattern SOURCE — one string, two engines. Alternation
   * order is load-bearing (leftmost-first): contractions before
   * letter runs, so `don't` → `don` + `'t`. */
  val PatternString: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^ \\t\\n\\r\\f\\p{L}\\p{N}]+|[ \\t\\n\\r\\f]+"

  /** The same pattern as a DuckDB SQL string literal (single quotes
   * doubled) — splice into `regexp_extract_all(text, '…')` so the
   * oracle pre-tokenizes with the IDENTICAL source. */
  def patternSqlLiteral: String = "'" + PatternString.replace("'", "''") + "'"

  private val compiled = java.util.regex.Pattern.compile(PatternString)

  // Matcher is stateful — one per thread, reset per call (allocation-
  // free on the hot path; Pattern itself is immutable and shared)
  private val matchers: ThreadLocal[java.util.regex.Matcher] =
    ThreadLocal.withInitial(() => compiled.matcher(""))

  /** Generated-code / eval entry point: all matches, in order. */
  def segments(t: UTF8String): ArrayData = {
    val s = t.toString
    val m = matchers.get().reset(s)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    while (m.find()) out += UTF8String.fromString(m.group())
    new GenericArrayData(out.toArray)
  }

  def pretokenize(text: Column): Column =
    Bridge.column(PreTokenizeExpr(Bridge.expression(text)))
}
