package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: sliding word trigrams, deduplicated") {
    val r = Seq("a b c d a b c d").toDF("t")
      .select(TextOps.shingles($"t", 3)).as[Seq[String]].head()
    assert(r.toSet == Set("a b c", "b c d", "c d a", "d a b"))
    // shorter than k → empty
    assert(Seq("a b").toDF("t").select(TextOps.shingles($"t", 3))
      .as[Seq[String]].head().isEmpty)
  }

  test("hash60 matches the md5-hex-prefix definition") {
    val got = Seq("abc").toDF("t").select(TextOps.hash60($"t")).as[Long].head()
    // first 15 hex chars of md5("abc") = 900150983cd24fb (0x900150983cd24fb)
    assert(got == java.lang.Long.parseLong("900150983cd24fb", 16))
  }

  test("langId picks the stopword-richest language") {
    val df = Seq(
      "the cat is on the mat and it is happy",
      "el gato de la casa y un perro en el patio",
      "nothing matching here xyz qqq").toDF("t")
    val r = df.select(TextOps.langId($"t")).as[String].collect()
    assert(r.toSeq == Seq("en", "es", "und"))
  }

  test("quality columns compute exact ratios") {
    val r = Seq("the quick fox!").toDF("t")
      .select(TextOps.qualityColumns($"t").map { case (n, c) => c.as(n) }: _*)
      .head()
    assert(r.getAs[Long]("n_words") == 3)
    assert(r.getAs[Double]("mean_word_len") == 12.0 / 3) // 14 chars - 3 + 1
    assert(r.getAs[Double]("punct_ratio") == 1.0 / 14)
    assert(r.getAs[Double]("stopword_ratio") == 1.0 / 3)
  }

  test("token counts: whitespace vs BPE-ish") {
    val r = Seq("hello world42 x!y").toDF("t")
      .select(TextOps.tokenCounts($"t").map { case (n, c) => c.as(n) }: _*)
      .head()
    assert(r.getAs[Long]("ws_tokens") == 3)
    // hello | world | 42 | x | ! | y
    assert(r.getAs[Long]("bpe_tokens") == 6L)
  }

  test("fingerprint normalizes whitespace and case") {
    val df = Seq("The  Quick\tFox", "the quick fox").toDF("t")
      .select(TextOps.fingerprint($"t")).as[String].collect()
    assert(df(0) == df(1))
  }
}
