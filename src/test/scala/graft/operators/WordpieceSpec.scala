package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * CorpusStats.wordpieceTrain / wordpieceVocab — the likelihood-gain
 * merge trainer (Schuster & Nakajima 2012), pinned on the classic
 * worked example (hug×10 pug×5 pun×12 bun×4 hugs×5): WordPiece's
 * score c(lr)/(c(l)·c(r)) must pick the rare-but-always-together
 * pair (g,s) first, where BPE's raw count would pick (u,g) — the
 * textbook contrast between the two trainers.
 */
class WordpieceSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (
    Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++ Seq.fill(12)("pun") ++
      Seq.fill(4)("bun") ++ Seq.fill(5)("hugs")
  ).zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")

  test("likelihood gain picks (g,s) first where BPE count picks (u,g)") {
    val wp = CorpusStats.wordpieceTrain(corpus, $"text", merges = 2)
      .orderBy("merge_rank")
      .select("merge_rank", "left", "right", "pair_count")
      .as[(Int, String, String, Long)].collect().toSeq
    // merge 0: score(g,s) = 5/(20·5) = 0.05 beats every 1/36 pair
    assert(wp.head == ((0, "g", "s", 5L)))
    // merge 1: every remaining pair scores EXACTLY 1/36 — the
    // deterministic tie-break is (left, right) ascending → (b,u)
    assert(wp(1) == ((1, "b", "u", 4L)))
    // the contrast: BPE's count argmax starts (u,g) on the same data
    val bpe = CorpusStats.bpeTrain(corpus, $"text", merges = 1)
      .select("left", "right").as[(String, String)].collect().head
    assert(bpe == (("u", "g")))
  }

  test("exact-score ties break on UTF-8 bytes, not UTF-16 code units") {
    // U+E000 (UTF-8 EE 80 80) vs U+10000 (UTF-8 F0 90 80 80): UTF-16
    // ranks the surrogate pair (D800 DC00) BELOW E000; UTF-8 ranks it
    // ABOVE. Equal counts make both pair scores tie exactly, so the
    // ascending (left, right) tie-break decides — and must match the
    // oracle's byte collation: U+E000 first.
    val pua = ""           // U+E000
    val astral = new String(Character.toChars(0x10000))
    val docs = Seq((1L, pua + "a"), (2L, astral + "a"))
      .toDF("doc_id", "text")
    val wp = CorpusStats.wordpieceTrain(docs, $"text", merges = 1)
      .head()
    assert(wp.getString(1) == pua && wp.getString(2) == "a")
    val bpe = CorpusStats.bpeTrain(docs, $"text", merges = 1).head()
    assert(bpe.getString(1) == pua && bpe.getString(2) == "a")
  }

  test("exhaustion: no pairs left ends training early") {
    val tiny = Seq((1L, "ab")).toDF("doc_id", "text")
    val wp = CorpusStats.wordpieceTrain(tiny, $"text", merges = 5)
      .collect()
    assert(wp.length == 1) // (a,b) merges once, then no pairs remain
  }

  test("wordpieceVocab feeds greedy inference directly") {
    val merges = CorpusStats.wordpieceTrain(corpus, $"text", merges = 4)
    val vocab = CorpusStats.wordpieceVocab(merges)
    // vocab = the merge outputs, rank-stable
    assert(vocab.map(_._1).toSeq ==
      merges.orderBy("merge_rank")
        .select(concat($"left", $"right")).as[String].collect().toSeq)
    val bc = spark.sparkContext.broadcast(vocab)
    val words = Seq("bun", "hugs", "zzz").toDF("w")
    val seg = words.select($"w",
        graft.functions.UnigramEncodeExpr.greedy($"w", bc, 8).as("p"))
      .as[(String, Seq[String])].collect().toMap
    // the 4 merges are (g,s),(b,u),(bu,n),(h,u) — hand-derivable:
    // (bu,n) scores 4/(4·16) = 1/16 at round 3, and round 4 is an
    // all-1/32 tie broken to (h,u)
    assert(vocab.map(_._1).toSeq == Seq("gs", "bu", "bun", "hu"))
    // greedy longest-match under the trained vocab; unknown singles
    // pass through (so "zzz" needs no vocab entries)
    assert(seg("bun") == Seq("bun"))
    assert(seg("hugs") == Seq("hu", "gs"))
    assert(seg("zzz") == Seq("z", "z", "z"))
  }

  test("marked trainer + matcher: the BERT ## namespace") {
    import org.apache.spark.unsafe.types.UTF8String
    // matcher: word-initial and word-internal pieces are separate
    // namespaces — the canonical BERT example segments with markers,
    // and plain "aff" only matches at a word START
    val m = new graft.functions.UnigramEncodeExpr.Memo(
      Array("un" -> 1L, "##aff" -> 1L, "##able" -> 1L, "aff" -> 1L), 6, 0L)
    def seg(w: String) = {
      val a = m.encodeGreedyMarkedU(UTF8String.fromString(w))
      (0 until a.numElements()).map(a.getUTF8String(_).toString)
    }
    assert(seg("unaffable") == Seq("un", "##aff", "##able"))
    assert(seg("affable") == Seq("aff", "##able"))
    // unknown singles pass through in positional form
    assert(seg("unzip") == Seq("un", "##z", "##i", "##p"))

    // trainer: "tt"x16 "at"x6 — word-initial t (c=16) and internal
    // ##t (c=22) count separately: both pairs score exactly 1/22
    // (every left is always followed by ##t), the UTF-8 ascending
    // tie-break picks (a,##t), and the merged symbol strips the
    // right's marker ("at"). Merge 2 is then (t,##t) -> "tt" — the
    // marked vocab carries both positional outputs
    val docs = (Seq.fill(16)("tt") ++ Seq.fill(6)("at")).zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges2 = CorpusStats.wordpieceTrainMarked(docs, $"text",
      merges = 2).orderBy("merge_rank").collect()
    assert(merges2(0).getString(1) == "a" &&
      merges2(0).getString(2) == "##t" && merges2(0).getLong(3) == 6L)
    assert(merges2(1).getString(1) == "t" &&
      merges2(1).getString(2) == "##t" && merges2(1).getLong(3) == 16L)
    val vocab = CorpusStats.wordpieceVocabMarked(
      CorpusStats.wordpieceTrainMarked(docs, $"text", merges = 2))
    assert(vocab.toSeq.sorted == Seq("at" -> 6L, "tt" -> 16L))
  }

  test("all three trainers off the histogram artifact equal corpus training") {
    // per-split histograms merged (the standing artifact's shape)
    val parts = (0 until 3).map(p => CorpusStats.wordTypeHistogram(
      corpus.filter(col("doc_id") % 3 === p), $"text"))
    val hist = CorpusStats.wordHistMerge(parts.reduce(_ unionByName _))
      .localCheckpoint()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(df.columns.map(col): _*).collect().map(_.toSeq).toSeq
    assert(rows(CorpusStats.wordpieceTrainFromHist(hist, merges = 4)) ==
      rows(CorpusStats.wordpieceTrain(corpus, $"text", merges = 4)))
    assert(rows(CorpusStats.bpeTrainFromHist(hist, merges = 4)) ==
      rows(CorpusStats.bpeTrain(corpus, $"text", merges = 4)))
    assert(rows(CorpusStats.unigramTrainFromHist(hist, vocabSize = 12)) ==
      rows(CorpusStats.unigramTrain(corpus, $"text", vocabSize = 12)))
  }

  test("training is deterministic across partitionings") {
    val a = CorpusStats.wordpieceTrain(corpus, $"text", merges = 4)
      .orderBy("merge_rank").collect().map(_.toSeq).toSeq
    val b = CorpusStats.wordpieceTrain(corpus.repartition(7), $"text",
        merges = 4)
      .orderBy("merge_rank").collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
