package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/**
 * `dhash60(bytes)` — a 60-bit difference-hash (dHash) style
 * PERCEPTUAL fingerprint of a binary payload: average-pool the byte
 * stream onto a fixed 6×11 grid (66 cells, exact integer floor
 * boundaries `⌊s·n/66⌋`), then one bit per horizontally adjacent
 * cell pair — `bit(r,c) = mean(cell(r,c)) > mean(cell(r,c+1))`,
 * 6 rows × 10 comparisons = 60 bits (the repo's 60-bit hash width,
 * so the SimHash 4×15-bit band blocking applies unchanged). Means
 * compare EXACTLY by cross-multiplication (`sum_a·cnt_b >
 * sum_b·cnt_a` — no division, no floats), so the SQL oracle
 * reproduces the hash bit-for-bit from the byte values.
 *
 * Robustness property the exact content hash lacks: a re-encode or
 * bit-jitter that changes ONE byte perturbs one cell's sum, which
 * can flip at most that cell's two comparison bits — hamming ≤ 2,
 * inside any ≤ 3 blocking threshold, while md5-style hashes scatter.
 * Empty payloads hash to null. Cells emptied by short payloads
 * (n < 66) carry (sum 0, cnt 0) and compare equal (bit 0) —
 * deterministic on both engines.
 */
case class DHash60Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dhash60"
  override protected def withNewChildInternal(c: Expression): DHash60Expr =
    copy(c)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.isEmpty) null else DHash60Expr.dhash60(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, c => s"""
      if ($c.length == 0) { ${ev.isNull} = true; }
      else { ${ev.value} = graft.functions.DHash60Expr.dhash60($c); }""")
  }
}

object DHash60Expr {

  val Rows = 6
  val Cols = 11
  private val Cells = Rows * Cols

  /** Generated-code entry point (n ≥ 1). */
  def dhash60(b: Array[Byte]): Long = {
    val n = b.length
    val sums = new Array[Long](Cells)
    val cnts = new Array[Long](Cells)
    var s = 0
    while (s < Cells) {
      val lo = (s.toLong * n / Cells).toInt
      val hi = ((s + 1).toLong * n / Cells).toInt
      var i = lo
      var acc = 0L
      while (i < hi) { acc += (b(i) & 0xff); i += 1 }
      sums(s) = acc
      cnts(s) = (hi - lo).toLong
      s += 1
    }
    var h = 0L
    var r = 0
    while (r < Rows) {
      var c = 0
      while (c < Cols - 1) {
        val a = r * Cols + c
        if (sums(a) * cnts(a + 1) > sums(a + 1) * cnts(a))
          h |= 1L << (r * (Cols - 1) + c)
        c += 1
      }
      r += 1
    }
    h
  }

  def dhash60(c: Column): Column =
    Bridge.column(DHash60Expr(Bridge.expression(c)))
}
