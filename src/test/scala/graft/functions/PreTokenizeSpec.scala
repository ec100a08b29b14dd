package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[PreTokenizeExpr]]'s GPT-2-style segmentation contract and
 * the pretok mode it switches on across the tokenizer family. */
class PreTokenizeSpec extends SparkSpec {

  private def segs(texts: String*): Seq[Seq[String]] = {
    import spark.implicits._
    texts.toDF("t")
      .select(PreTokenizeExpr.pretokenize(col("t")).as("s"))
      .collect().map(_.getSeq[String](0).toVector).toVector
  }

  test("segments partition the input: concatenation restores the text") {
    val texts = Seq(
      "the quick brown fox", "don't stop, won't stop!",
      "abc123 42 x-9", "  leading  and   runs ", "", "émojis 😀 work",
      "semi;colon's edge-case... 'quoted'")
    val out = segs(texts: _*)
    texts.zip(out).foreach { case (t, s) =>
      assert(s.mkString("") == t, s"segments must tile '$t', got $s")
    }
  }

  test("contractions split; space attaches left; runs split by class") {
    assert(segs("don't stop")(0) == Seq("don", "'t", " stop"))
    assert(segs("it's a 42x test!")(0) ==
      Seq("it", "'s", " a", " 42", "x", " test", "!"))
    // punctuation run with leading space; digits separate from letters
    assert(segs("a ...b9")(0) == Seq("a", " ...", "b", "9"))
  }

  test("the SQL literal escapes the pattern verbatim") {
    // one level of quote-doubling, nothing else: splicing it into SQL
    // must reproduce PatternString exactly
    val lit = PreTokenizeExpr.patternSqlLiteral
    assert(lit.head == '\'' && lit.last == '\'')
    assert(lit.drop(1).dropRight(1).replace("''", "'") ==
      PreTokenizeExpr.PatternString)
  }

  test("encodeTextPretok == per-segment BpeEncode concatenation") {
    import spark.implicits._
    val merges: Array[Array[String]] = Array(
      Array(" ", "t"), Array(" t", "h"), Array(" th", "e"),
      Array("a", "n"))
    val bc = spark.sparkContext.broadcast(merges)
    val texts = Seq("an ant sang the anthem", "don't think twice",
      "the theme then")
    val whole = texts.toDF("t")
      .select(BpeEncodeExpr.bpeText(col("t"), bc, pretok = true).as("e"))
      .collect().map(_.getSeq[String](0).toVector).toVector
    val perSeg = texts.toDF("t")
      .select(PreTokenizeExpr.pretokenize(col("t")).as("s"))
      .select(flatten(transform(col("s"),
        w => BpeEncodeExpr.bpe(w, bc))).as("e"))
      .collect().map(_.getSeq[String](0).toVector).toVector
    assert(whole == perSeg)
    // the space-led merges actually fired: " the" assembled from
    // " "+"t" → " t"+"h" → " th"+"e"
    assert(whole(0).contains(" the"), whole(0).toString)
  }

  test("bpeTrain(pretok) learns space-led merges ws mode cannot") {
    import spark.implicits._
    val docs = Seq.fill(8)("the thin thing").toDF("text")
    val m = graft.operators.CorpusStats
      .bpeTrain(docs, col("text"), merges = 4, pretok = true)
      .select("left", "right").collect()
      .map(r => (r.getString(0), r.getString(1))).toVector
    // pretok word types: "the", " thin", " thing" — the most frequent
    // pair streams run through 't'+'h' and space-led symbols
    assert(m.exists { case (l, r) => l.startsWith(" ") || l == " " },
      s"expected a space-led merge, got $m")
    // ws mode on the same corpus must not produce any space symbol
    val ws = graft.operators.CorpusStats
      .bpeTrain(docs, col("text"), merges = 4)
      .select("left", "right").collect()
      .map(r => (r.getString(0), r.getString(1))).toVector
    assert(ws.forall { case (l, r) => !l.contains(" ") && !r.contains(" ") })
  }

  test("wordTypeHistogram pretok counts regex segments") {
    import spark.implicits._
    val docs = Seq("don't stop", "don't go").toDF("text")
    val h = graft.operators.CorpusStats
      .wordTypeHistogram(docs, col("text"), pretok = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(h == Map("don" -> 2L, "'t" -> 2L, " stop" -> 1L, " go" -> 1L))
  }
}
