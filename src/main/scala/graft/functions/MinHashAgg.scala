package graft.functions

import graft.operators.Dedup
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/**
 * One-pass MinHash signature aggregate: folds each shingle hash
 * `h ∈ [0, p)` into an n-wide vector of minima of
 * `(a_i·h + b_i) mod p`  (p = 2³¹−1, parameters from
 * [[graft.operators.Dedup.minhashA]]/[[Dedup.minhashB]]).
 *
 * Equivalent to n separate `min(pmod(...))` aggregate expressions but
 * with a single mutable buffer — the n-expression form generates n
 * copies of aggregate update code that costs seconds of janino
 * compilation at n = 64 and a 64-column-wide intermediate row; this
 * buffer form is one tight loop.
 */
case class MinHashSigAgg(
    child: Expression,
    n: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val p = Dedup.MinhashP
  @transient private lazy val as: Array[Long] =
    (0 until n).map(Dedup.minhashA).toArray
  @transient private lazy val bs: Array[Long] =
    (0 until n).map(Dedup.minhashB).toArray

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinHashSigAgg =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): MinHashSigAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashSigAgg =
    copy(inputAggBufferOffset = o)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_sig"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(n)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < n) {
        val g = (as(i) * h + bs(i)) % p
        if (g < buf(i)) buf(i) = g
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * n)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(n)(bb.getLong)
  }
}

object MinHashSigAgg {
  /** `minhash_sig(h)`: aggregate a column of shingle hashes (already
   * reduced mod p) into the n-minima signature array. */
  def minhashSig(h: Column, n: Int = 64): Column =
    Bridge.column(MinHashSigAgg(Bridge.expression(h), n)
      .toAggregateExpression())
}
