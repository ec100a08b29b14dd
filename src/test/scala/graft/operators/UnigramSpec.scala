package graft.operators

import graft.SparkSpec
import graft.functions.UnigramEncodeExpr
import org.apache.spark.sql.functions._

/**
 * Unigram-LM tokenizer (Kudo 2018): the Viterbi segmentation kernel's
 * exact triple order (nll, piece count, longest-piece tie-break), OOV
 * coverage, the EM trainer's convergence on an obvious corpus, and
 * the distributed expression's identity with the driver kernel.
 */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def memo(vocab: (String, Long)*) =
    new UnigramEncodeExpr.Memo(vocab.toArray, 6, 20000000L)

  test("Viterbi picks the minimum-NLL segmentation") {
    val m = memo("abc" -> 2500000L, "ab" -> 1000000L, "c" -> 1200000L,
      "a" -> 3000000L, "b" -> 3000000L)
    // [ab, c] = 2.2e6 beats [abc] = 2.5e6 and [a, b, c] = 7.2e6
    assert(m.segment("abc").toSeq == Seq("ab", "c"))
    assert(m.segmentNll("abc") == 2200000L)
  }

  test("ties break on fewer pieces, then the longest final piece") {
    // [abc] and [ab, c] both cost 2.0e6: fewer pieces wins
    val m1 = memo("abc" -> 2000000L, "ab" -> 1000000L, "c" -> 1000000L)
    assert(m1.segment("abc").toSeq == Seq("abc"))
    // [a, bc] and [ab, c] cost the same with equal counts: the
    // smaller split point (longer FINAL piece) wins -> [a, bc]
    val m2 = memo("a" -> 1000000L, "bc" -> 1000000L,
      "ab" -> 1000000L, "c" -> 1000000L)
    assert(m2.segment("abc").toSeq == Seq("a", "bc"))
  }

  test("OOV single code points segment at the unk penalty; astral safe") {
    val m = memo("he" -> 1000000L)
    assert(m.segment("hex").toSeq == Seq("he", "x"))
    assert(m.segmentNll("hex") == 1000000L + 20000000L)
    // astral-plane code point (surrogate pair) stays one unit
    val emoji = new String(Character.toChars(0x1F600))
    assert(m.segment("he" + emoji).toSeq == Seq("he", emoji))
  }

  test("byte fallback: zero unknown-piece loss on mixed-script + astral input") {
    import org.apache.spark.unsafe.types.UTF8String
    val m = memo("he" -> 1000000L)
    def bytesOf(w: String, greedy: Boolean) = {
      val a = if (greedy) m.encodeGreedyBytesU(UTF8String.fromString(w))
        else m.encodeBytesU(UTF8String.fromString(w))
      (0 until a.numElements()).map(a.getUTF8String(_).toString)
    }
    val emoji = new String(Character.toChars(0x1F600)) // U+1F600, 4 bytes
    // "heé😀" → [he] + é (C3 A9) + 😀 (F0 9F 98 80) for BOTH encoders
    val want = Seq("he", "<0xC3>", "<0xA9>",
      "<0xF0>", "<0x9F>", "<0x98>", "<0x80>")
    assert(bytesOf("heé" + emoji, greedy = false) == want)
    assert(bytesOf("heé" + emoji, greedy = true) == want)
    // every emitted piece is a vocab piece or a byte piece — no raw
    // unknowns survive (the zero-loss contract)
    val mixed = "heВαé" + emoji // Cyrillic + Greek + Latin-1 + astral
    Seq(true, false).foreach { g =>
      bytesOf(mixed, g).foreach(p =>
        assert(p == "he" || p.matches("<0x[0-9A-F]{2}>"), s"raw unknown: $p"))
    }
    // known pieces never expand
    assert(bytesOf("hehe", greedy = false) == Seq("he", "he"))
  }

  test("whole-text encode splits on single spaces, skips empties") {
    val m = memo("ab" -> 1000000L, "c" -> 1000000L)
    val out = m.encodeText("abc  ab")
    val got = (0 until out.numElements()).map(out.getUTF8String(_).toString)
    assert(got == Seq("ab", "c", "ab"))
  }

  test("greedy longest-match takes the longest piece, not the best score") {
    val m = memo("abc" -> 9000000L, "ab" -> 1000000L, "c" -> 1000000L)
    // Viterbi prefers the cheap [ab, c]; greedy takes the LONGEST [abc]
    assert(m.segment("abc").toSeq == Seq("ab", "c"))
    assert(m.segmentGreedy("abc").toSeq == Seq("abc"))
    // unknown single code points pass through; astral safe
    val emoji = new String(Character.toChars(0x1F600))
    assert(m.segmentGreedy("abx" + emoji).toSeq == Seq("ab", "x", emoji))
    // greedy can be suboptimal: with only [aa, aab absent] shapes the
    // classic trap still terminates and covers every code point
    val t = memo("aa" -> 1000000L, "ab" -> 1000000L)
    assert(t.segmentGreedy("aab").toSeq == Seq("aa", "b"))
  }

  test("EM trainer finds the obvious pieces and keeps coverage") {
    val docs = (Seq.fill(30)("hello hello world") ++
      Seq.fill(10)("hell low")).toDF("text")
    val vocab = CorpusStats.unigramTrain(docs, col("text"),
      vocabSize = 12, iters = 3, maxPieceLen = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val pieces = vocab.map(_._1).toSet
    assert(pieces.contains("hello"), s"missing 'hello' in $pieces")
    assert(pieces.contains("world") || pieces.contains("worl"),
      s"no world-ish piece in $pieces")
    // coverage: every distinct character survives pruning
    "helowrd".foreach(ch =>
      assert(pieces.contains(ch.toString), s"missing single '$ch'"))
    // scores are valid micro nats: positive, monotone in count
    val byCount = vocab.sortBy(-_._2)
    assert(vocab.forall(_._3 >= 0L))
    assert(byCount.head._3 <= byCount.last._3)
  }

  test("trainer is deterministic and encode matches the driver kernel") {
    val docs = Seq.fill(20)("the cat sat on the mat").toDF("text")
    def train() = CorpusStats.unigramTrain(docs, col("text"),
      vocabSize = 10, iters = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val v = train()
    assert(v == train())
    val vocabDf = v.toDF("piece", "n", "nll_micro")
    val enc = CorpusStats.unigramEncode(
      Seq((1L, "the cat grinned")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), vocabDf)
      .collect()(0)
    val m = new UnigramEncodeExpr.Memo(
      v.map(t => (t._1, t._3)).toArray, 6, 20000000L)
    val expect = Seq("the", "cat", "grinned").flatMap(w => m.segment(w))
    assert(enc.getSeq[String](1) == expect)
    assert(enc.getLong(2) == expect.length.toLong)
  }
}
