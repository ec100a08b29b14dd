package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * `gram_hashes(ws, L)` — the rolling hash of every L-token window of
 * a token array, in one O(n) pass: output[i] is a 61-bit polynomial
 * hash of tokens i..i+L-1 (empty when the doc has fewer than L
 * tokens). This is the position-indexed k-gram stream the
 * exact-substring dedup anchors on
 * ([[graft.operators.Dedup.exactSubstringDedup]]): equal windows
 * hash equal, and the rolling update touches each token once —
 * building the same stream by slicing/joining L tokens per position
 * (the [[graft.operators.Dedup.spanDedup]] shape, fine for its n/k
 * non-overlapping spans) would read every token L times, an L×
 * corpus-scan blowup at 100 TB.
 *
 * Hash design: each token md5-hashes to 60 bits ([[SimHash60]]),
 * then windows combine as Σ tᵢ₊ⱼ·B^(L-1-j) mod p with p = 2⁶¹−1
 * (Mersenne — the 128-bit product reduces with two shifts, no
 * division) and B an odd 40-bit constant. Hashes are engine-internal
 * (the correctness oracle compares gram STRINGS), so only the
 * equality classes matter: collision odds at 10⁹ distinct windows
 * are ~10⁻⁴ per corpus, and one collision merges one anchor pair.
 *
 * Null tokens hash as the SENTINEL 0L — every null token falls in
 * one equality class (and collides with a real token whose 60-bit
 * hash happens to be 0, odds 2⁻⁶⁰ per token). No current caller can
 * produce one (`split()` never yields null elements and every Dedup
 * site tokenizes with it), so the sentinel is a defensive contract
 * for future callers, pinned by GramHashSpec, not a live path.
 *
 * Accepts `array<string>` (words — md5 per token) AND `array<bigint>`
 * (true token IDS, the Lee et al. 2022 domain: BPE/unigram encode
 * output) — long tokens skip the md5 and mix through a splitmix64
 * finalizer to the same 60-bit space, so the rolling combine and all
 * downstream dedup plumbing are identical. The two element types hash
 * to unrelated equality classes by construction (different per-token
 * hash functions), which is correct: a word stream and an id stream
 * are different corpora.
 */
case class GramHashExpr(child: Expression, l: Int)
    extends UnaryExpression {

  private def isLongInput: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  // loud at ANALYSIS time on anything but the two supported element
  // types — an array<int> reaching the string path would CCE deep in
  // generated code with no hint of the cause
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) | ArrayType(org.apache.spark.sql.types
          .StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gram_hashes takes array<string> (words) or array<bigint> " +
            s"(token ids), got $other")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"
  override protected def withNewChildInternal(c: Expression): GramHashExpr =
    copy(child = c)

  override def nullSafeEval(input: Any): Any =
    if (isLongInput) GramHashExpr.gramsLong(input.asInstanceOf[ArrayData], l)
    else GramHashExpr.grams(input.asInstanceOf[ArrayData], l)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (isLongInput) "gramsLong" else "grams"
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GramHashExpr.$m($c, $l)")
  }
}

object GramHashExpr {
  private val P = (1L << 61) - 1
  private val B = 0x9E3779B97L % P // odd 40-bit (golden-ratio bits)

  /** (a·b) mod 2⁶¹−1 for a, b in [0, p): 2⁶⁴ ≡ 8 (mod p), so the
   * 128-bit product hi·2⁶⁴ + lo reduces to (hi<<3 | lo>>>61) +
   * (lo & p) with one conditional subtract. */
  private def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    val r = ((hi << 3) | (lo >>> 61)) + (lo & P)
    if (r >= P) r - P else r
  }

  /** Generated-code entry point: rolling window hashes, O(n). */
  def grams(ws: ArrayData, l: Int): ArrayData = {
    val n = ws.numElements()
    if (n < l) return new GenericArrayData(Array.empty[Long])
    val md = Hash60Expr.threadDigest()
    val t = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = ws.getUTF8String(i)
      t(i) = if (s == null) 0L else SimHash60.hash60(md, s.getBytes)
      i += 1
    }
    rollingCombine(t, l)
  }

  /** [[grams]] for `array<bigint>` token-id streams: per-token hash is
   * a splitmix64 finalizer masked to the same 60-bit space (no md5 —
   * ids are already uniform-ish, the finalizer just decorrelates
   * adjacent ids), then the identical rolling combine. Null ids take
   * the 0L sentinel like null words. */
  def gramsLong(ws: ArrayData, l: Int): ArrayData = {
    val n = ws.numElements()
    if (n < l) return new GenericArrayData(Array.empty[Long])
    val t = new Array[Long](n)
    var i = 0
    while (i < n) {
      t(i) = if (ws.isNullAt(i)) 0L else mix60(ws.getLong(i))
      i += 1
    }
    rollingCombine(t, l)
  }

  /** splitmix64's finalizer, masked to 60 bits — the long-token
   * analog of [[SimHash60.hash60]]'s md5 cut. */
  private def mix60(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    (x ^ (x >>> 31)) & ((1L << 60) - 1)
  }

  private def rollingCombine(t: Array[Long], l: Int): ArrayData = {
    val n = t.length
    var bl = 1L
    var i = 1
    while (i < l) { bl = mulmod(bl, B); i += 1 }
    val out = new Array[Long](n - l + 1)
    var h = 0L
    i = 0
    while (i < l) { h = (mulmod(h, B) + t(i)) % P; i += 1 }
    out(0) = h
    i = 1
    while (i <= n - l) {
      h = (mulmod(h + P - mulmod(t(i - 1), bl), B) + t(i + l - 1)) % P
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  def gramHashes(ws: Column, l: Int): Column = {
    require(l >= 1, "window length must be >= 1")
    Bridge.column(GramHashExpr(Bridge.expression(ws), l))
  }
}
