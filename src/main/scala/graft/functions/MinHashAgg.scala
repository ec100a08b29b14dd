package graft.functions

import graft.operators.Dedup
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/**
 * One-pass scalar MinHash signature: maps a document's shingle array
 * to the n-wide vector of minima of `(a_i·h + b_i) mod p` over the
 * shingles' 60-bit md5 hashes (p = 2³¹−1, parameters from
 * [[graft.operators.Dedup.minhashA]]/[[Dedup.minhashB]] — all
 * reproducible in plain SQL, which is how the correctness oracle
 * recomputes signatures).
 *
 * Being a scalar expression over the already-materialized shingle
 * array — not an aggregate over exploded shingle rows — the signature
 * stage needs NO explode and NO doc-keyed shuffle: it runs inside the
 * scan's whole-stage-codegen'd projection and scales linearly with
 * the scan. (A previous round used a single-buffer
 * TypedImperativeAggregate over exploded hashes; that still paid one
 * groupBy(doc_id) exchange of |doc|·|shingles| rows.)
 */
case class MinHashSigExpr(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"
  override protected def withNewChildInternal(c: Expression): MinHashSigExpr =
    copy(child = c)

  private val p = Dedup.MinhashP
  @transient private lazy val as: Array[Long] =
    (0 until n).map(Dedup.minhashA).toArray
  @transient private lazy val bs: Array[Long] =
    (0 until n).map(Dedup.minhashB).toArray

  /** Generated-code entry point: one tight loop over shingles × n. */
  def sig(arr: ArrayData): ArrayData = {
    val buf = Array.fill(n)(Long.MaxValue)
    val md = Hash60Expr.threadDigest()
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = SimHash60.hash60(md, arr.getUTF8String(i).getBytes) % p
        var j = 0
        while (j < n) {
          val g = (as(j) * h + bs(j)) % p
          if (g < buf(j)) buf(j) = g
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(buf)
  }

  override def nullSafeEval(input: Any): Any =
    sig(input.asInstanceOf[ArrayData])

  // stays inside whole-stage codegen: the shingle array is produced and
  // consumed in the same generated stage, no fallback interpretation
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minhashSig", this,
      classOf[MinHashSigExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.sig($c);")
  }
}

object MinHashSigExpr {
  /** `minhash_sig(ss)`: n-minima signature of a shingle string array. */
  def minhashSig(ss: Column, n: Int = 64): Column =
    Bridge.column(MinHashSigExpr(Bridge.expression(ss), n))
}
