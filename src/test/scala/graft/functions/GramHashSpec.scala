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

  // ---- the long-array (token-id) overload --------------------------

  private def hashesLong(tokens: Seq[Seq[java.lang.Long]], l: Int): Seq[Seq[Long]] = {
    val schema = StructType(Seq(StructField("ws",
      ArrayType(LongType, containsNull = true))))
    val rows = tokens.map(t => Row(t))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1), schema)
      .select(GramHashExpr.gramHashes(col("ws"), l).as("gh"))
      .collect().map(_.getSeq[Long](0).toVector).toVector
  }

  private def L(xs: Long*): Seq[java.lang.Long] = xs.map(java.lang.Long.valueOf)

  test("long-array rolling hashes equal a per-window direct recompute") {
    val toks = L(17L, 42L, 17L, 9000000000L, 42L, 17L)
    val l = 3
    val rolled = hashesLong(Seq(toks), l).head
    val direct = (0 to toks.length - l).map { i =>
      hashesLong(Seq(toks.slice(i, i + l)), l).head.head
    }
    assert(rolled == direct)
    assert(rolled.length == toks.length - l + 1)
    // equal id windows hash equal regardless of position
    val dup = hashesLong(Seq(L(1L, 2L, 3L, 1L, 2L, 3L)), 3).head
    assert(dup.head == dup(3))
  }

  test("long-array short docs and null ids follow the string contract") {
    assert(hashesLong(Seq(L(5L), Seq.empty[java.lang.Long]), 3) ==
      Seq(Vector.empty[Long], Vector.empty[Long]))
    val a = Seq[java.lang.Long](7L, null, 9L)
    val b = Seq[java.lang.Long](7L, null, 9L)
    val real = L(7L, 8L, 9L)
    val out = hashesLong(Seq(a, b, real), 3)
    assert(out(0) == out(1), "null ids must hash as one class")
    assert(out(0) != out(2), "null class must not equal a real id")
  }

  test("string and long streams hash to unrelated classes") {
    // '42' the word and 42L the id must not collide by construction
    val s = hashes(Seq(Seq("1", "2", "3")), 3).head
    val n = hashesLong(Seq(L(1L, 2L, 3L)), 3).head
    assert(s != n)
  }

  test("unsupported element types fail at analysis, not in codegen") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq(1, 2, 3))).toDF("ws") // array<int>
    val e = intercept[Exception] {
      df.select(GramHashExpr.gramHashes(col("ws"), 2)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("gram_hashes") ||
      m.contains("DATATYPE_MISMATCH")), e.toString)
  }
}
