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

  test("winnowing fingerprints: sorted, distinct, window minima of gram hashes") {
    val text = "the quick brown fox jumps over the lazy dog"
    val Seq(fps) = Seq(text).toDF("t")
      .select(TextOps.winnowFingerprints($"t", k = 8, w = 4)).as[Seq[Long]].collect().toSeq
    assert(fps.nonEmpty && fps == fps.sorted && fps.distinct == fps)
    // reference recomputation: minima of each 4-window over 8-gram hashes
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val grams = text.sliding(8).map(h60).toVector
    val expect = grams.sliding(4).map(_.min).toVector.distinct.sorted
    assert(fps == expect)
  }

  test("winnowing fingerprints: shared passages overlap, short docs empty") {
    val a = "the quick brown fox jumps over the lazy dog in the park"
    val b = "a quick brown fox jumps over the lazy dog near me"
    val r = Seq(a, b).toDF("t")
      .select(TextOps.winnowFingerprints($"t")).as[Seq[Long]].collect()
    assert(r(0).toSet.intersect(r(1).toSet).nonEmpty) // shared passage survives edits
    assert(Seq("tiny").toDF("t")
      .select(TextOps.winnowFingerprints($"t")).as[Seq[Long]].head().isEmpty)
  }
}
