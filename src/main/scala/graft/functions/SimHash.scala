package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

import java.security.MessageDigest

/**
 * 60-bit SimHash over a token array, single pass, no explode: for each
 * token the 60-bit md5-derived hash votes ±1 per bit position; the
 * fingerprint sets bits with positive vote sums. Token multiplicity
 * acts as term weight.
 *
 * The per-token hash is the same `first-15-hex-chars-of-md5 → long`
 * the rest of the engine uses (TextOps.hash60), so an external SQL
 * engine can reproduce fingerprints bit-for-bit — that is what the
 * correctness oracle does via an unnest/group-by formulation. Near-dup
 * detection joins on 15-bit bands (pigeonhole: hamming ≤ 3 ⇒ ≥1 of 4
 * bands equal) and verifies with `bit_count(xor)`.
 */
case class SimHash60(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"
  override protected def withNewChildInternal(c: Expression): SimHash60 = copy(c)

  override def nullSafeEval(input: Any): Any =
    SimHash60.fingerprint(input.asInstanceOf[ArrayData])

  // stays inside whole-stage codegen (was CodegenFallback): one static
  // call per row, token array produced and consumed in the same stage
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHash60.fingerprint($c)")
}

object SimHash60 {
  /** Generated-code entry point: ±1 bit votes per token hash, then
   * majority per bit position. Token multiplicity acts as weight. */
  def fingerprint(arr: ArrayData): Long = {
    val votes = new Array[Int](60)
    val md = Hash60Expr.threadDigest()
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = hash60(md, arr.getUTF8String(i).getBytes)
        var j = 0
        while (j < 60) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** First 15 hex chars of md5 as a long — identical to
   * `conv(substring(md5(x),1,15),16,10)`. */
  private[graft] def hash60(md: MessageDigest, bytes: Array[Byte]): Long = {
    md.reset()
    val d = md.digest(bytes)
    // 15 hex chars = 7.5 bytes: bytes 0-6 fully + high nibble of byte 7
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  def simhash60(tokens: Column): Column =
    Bridge.column(SimHash60(Bridge.expression(tokens)))
}
