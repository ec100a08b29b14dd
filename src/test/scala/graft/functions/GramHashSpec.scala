package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins [[GramHashExpr]]'s contract directly (the Dedup gates only
 * exercise it through split()-produced arrays): rolling == direct
 * polynomial recompute, short docs → empty, and the defensive
 * null-token sentinel class documented on the expression. */
class GramHashSpec extends SparkSpec {

  private def hashes(tokens: Seq[Seq[String]], l: Int): Seq[Seq[Long]] = {
    val schema = StructType(Seq(StructField("ws",
      ArrayType(StringType, containsNull = true))))
    val rows = tokens.map(t => Row(if (t == null) null else t))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1), schema)
      .select(GramHashExpr.gramHashes(col("ws"), l).as("gh"))
      .collect().map(_.getSeq[Long](0).toVector).toVector
  }

  test("rolling hashes equal a per-window direct recompute") {
    val toks = Seq("alpha", "beta", "gamma", "delta", "beta", "alpha")
    val l = 3
    val rolled = hashes(Seq(toks), l).head
    // direct: each window hashed independently via a length-l array
    val direct = (0 to toks.length - l).map { i =>
      hashes(Seq(toks.slice(i, i + l)), l).head.head
    }
    assert(rolled == direct)
    assert(rolled.length == toks.length - l + 1)
    // equal windows hash equal; the two distinct windows differ
    assert(rolled.toSet.size == rolled.length) // all 4 windows distinct here
  }

  test("documents shorter than l produce an empty hash stream") {
    assert(hashes(Seq(Seq("a"), Seq.empty[String]), 3) ==
      Seq(Vector.empty[Long], Vector.empty[Long]))
  }

  test("null tokens fall in one sentinel equality class") {
    // two docs whose windows differ only in WHICH null token they
    // carry must produce equal gram classes (sentinel 0L), and a
    // null-bearing window must differ from the all-real one
    val a = Seq("x", null, "y")
    val b = Seq("x", null, "y")
    val real = Seq("x", "z", "y")
    val out = hashes(Seq(a, b, real), 3)
    assert(out(0) == out(1), "null tokens must hash as one class")
    assert(out(0) != out(2), "null class must not equal a real token")
  }
}
